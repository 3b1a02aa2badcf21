"""ocr_spark — PySpark-native structured-extraction engine.

A from-scratch, Spark-first re-expression of the extraction semantics of the
reference repo (``arthurfUnicorn/ocr``, a single-threaded PHP invoice-OCR
pipeline): per-turn structured-record extraction over a table of multi-turn
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``, with all per-row
logic running in vectorized Arrow/pandas UDF stages, explicit skew salting,
stable turn ordering, and per-partition checkpoint lineage.

Layout:
  kernels/   pure-Python extraction kernels (no Spark import) — unit-testable
  pipeline/  the Spark extraction job (mapInPandas stages, salting, checkpoints)
  sources/   deterministic transcripts synthesis + readers
  operators/ Spark DataFrame operator layer (driver queries()/oracle_sql() contract)
  streaming/ Structured Streaming variant of the extraction job
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = __version__
