"""File / ZIP ingest at the table edge (S3/S4 Spark-side).

The reference accepts folder or ZIP uploads over HTTP, extracts the
archive, scans it (FileScanner.php:45-94: ignore patterns, extension
whitelist, byte-wise name sort), then parses every file
(public/index.php:170-232 upload_zip route). Our engine's canonical
input is a TABLE, so this module is the edge that turns those raw
artifacts INTO the table, Spark-first:

- ``ingest_files``: ``spark.read.format("binaryFile")`` recursive scan —
  one row per file, distributed decode, the same ignore/extension
  filters as FileScanner.
- ``ingest_zip``: each ``.zip`` is ONE binaryFile row; members explode
  in an Arrow stage (a zip's central directory is per-archive, so the
  archive is the unit of parallelism — many archives fan out across
  tasks, the common shape of bulk uploads). Member safety beyond the
  reference's bare ``extractTo``: directory entries skipped,
  path-traversal names rejected, per-member size cap so one huge member
  cannot OOM its task.
- ``files_to_transcripts``: the scanned file set as a transcripts-shaped
  DataFrame (conv_id = upload/run id, turn_idx = name-sorted rank like
  FileScanner's usort(strcmp), tool routed by extension) so the
  extraction pipeline runs on uploads unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# FileScanner.php:12-19, applied to the file NAME — the canonical junk
# rules for every ingest edge (readers.py derives its path-level variant
# from here; keep them in one module)
_IGNORE_CS = r"^\.|^__|\.pyc$"                       # case-sensitive
_IGNORE_CI = r"^thumbs\.db$|^desktop\.ini$|^\.ds_store$"
_IGNORE_RE_CS = re.compile(_IGNORE_CS)
_IGNORE_RE_CI = re.compile(_IGNORE_CI, re.IGNORECASE)

# path-level, case-blind variant for input_file_name() filters
JUNK_PATH = r"(^|/)(\.|__|thumbs\.db$|desktop\.ini$|\.ds_store$)"

DEFAULT_EXTENSIONS = ("json", "md")                  # FileScanner.php:20
MAX_MEMBER_BYTES = 64 * 1024 * 1024                  # zip-member cap

INGESTED_SCHEMA = ("source string, member_path string, name string, "
                   "ext string, size long, content string, ts timestamp")


def _name_is_junk(name: str) -> bool:
    return bool(_IGNORE_RE_CS.search(name) or _IGNORE_RE_CI.search(name))


def ingest_files(spark: SparkSession, path: str,
                 extensions: tuple[str, ...] = DEFAULT_EXTENSIONS
                 ) -> DataFrame:
    """Recursive directory ingest: one row per accepted file, decoded
    UTF-8 (invalid bytes replaced, like treating file_get_contents
    output as text). Filters and name/ext derivation match FileScanner;
    `source` is the file's full parent-directory path (unique per
    upload dir — using only the last segment would merge same-named
    dirs from different uploads into one conversation).

    Known divergence from FileScanner: Spark's file index hides files
    whose name starts with '_' or '.' at LISTING time (it treats them
    as metadata files), so a single-underscore file like _summary.json
    never reaches the filters here even though the reference only
    ignores the '__' prefix. The ZIP path lists every member itself and
    keeps such names."""
    exts = tuple(e.lower() for e in extensions)
    raw = (spark.read.format("binaryFile")
           .option("recursiveFileLookup", "true")
           .load(path))
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.regexp_extract(name, r"\.([^.]+)$", 1))
    junk = (name.rlike(_IGNORE_CS)
            | F.lower(name).rlike(_IGNORE_CI))
    return (raw
            .withColumn("name", name)
            .withColumn("ext", ext)
            .where(~junk & ext.isin(*exts))
            .select(F.regexp_replace(F.col("path"), r"/[^/]+$", "")
                    .alias("source"),
                    F.col("path").alias("member_path"),
                    "name", "ext",
                    F.col("length").alias("size"),
                    F.col("content").cast("string").alias("content"),
                    F.col("modificationTime").alias("ts")))


def _zip_explode_stage(extensions: tuple[str, ...], max_member_bytes: int):
    def _explode(batches):
        import datetime
        import io
        import posixpath
        import zipfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for zpath, blob in zip(pdf["path"], pdf["content"]):
                # full path sans extension: unique per archive (the stem
                # alone would merge same-named zips from different dirs)
                source = (zpath[:-4] if zpath.lower().endswith(".zip")
                          else zpath)
                try:
                    zf = zipfile.ZipFile(io.BytesIO(blob))
                except Exception:
                    continue  # unreadable archive: skipped, never fatal
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    mp = info.filename
                    # traversal guard: also catch backslash separators
                    # and drive-letter prefixes zipfile passes through
                    norm = posixpath.normpath(mp.replace("\\", "/"))
                    if (norm == ".." or norm.startswith("../")
                            or norm.startswith("/")
                            or re.match(r"^[A-Za-z]:", norm)):
                        continue  # path traversal — reject the member
                    mname = norm.rsplit("/", 1)[-1]
                    if _name_is_junk(mname):
                        continue
                    mext = (mname.rsplit(".", 1)[-1].lower()
                            if "." in mname else "")
                    if mext not in extensions:
                        continue
                    if info.file_size > max_member_bytes:
                        continue  # bound per-task memory
                    try:
                        data = zf.read(info)
                    except Exception:
                        continue  # one corrupt member must not kill
                    try:
                        ts = datetime.datetime(*info.date_time)
                    except ValueError:
                        # zeroed DOS date fields ((1980,0,0,...)) are
                        # common in tool-generated zips — never fatal
                        ts = datetime.datetime(1980, 1, 1)
                    rows.append((source, mp, mname, mext, info.file_size,
                                 data.decode("utf-8", "replace"), ts))
            yield pd.DataFrame(rows, columns=[
                "source", "member_path", "name", "ext", "size",
                "content", "ts"])

    return _explode


def ingest_zip(spark: SparkSession, path: str,
               extensions: tuple[str, ...] = DEFAULT_EXTENSIONS,
               max_member_bytes: int = MAX_MEMBER_BYTES) -> DataFrame:
    """ZIP ingest: `path` may hold many archives; each is one binaryFile
    row whose members explode in an Arrow stage. `source` is the archive
    stem (the reference's run-id dir analog)."""
    exts = tuple(e.lower() for e in extensions)
    zips = (spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            # char-class glob: pathGlobFilter is case-sensitive and
            # Windows tooling commonly produces .ZIP
            .option("pathGlobFilter", "*.[zZ][iI][pP]")
            .load(path))
    return zips.mapInPandas(_zip_explode_stage(exts, max_member_bytes),
                            schema=INGESTED_SCHEMA)


def files_to_transcripts(files: DataFrame) -> DataFrame:
    """Ingested files as the transcripts table shape, ready for
    extract_turns: conv_id = source (upload run), turn_idx = rank in the
    byte-wise name sort (FileScanner.php:91 usort strcmp; member_path
    breaks duplicate-name ties deterministically), tool routed by
    extension exactly like the parser registry expects."""
    w = Window.partitionBy("source").orderBy("name", "member_path")
    return (files
            .withColumn("turn_idx",
                        (F.row_number().over(w) - 1).cast("int"))
            .select(F.col("source").alias("conv_id"),
                    "turn_idx",
                    F.lit("tool").alias("role"),
                    F.col("content").alias("text"),
                    F.when(F.col("ext") == "json", "doc_parser")
                    .when(F.col("ext") == "md", "markdown")
                    .otherwise(F.col("ext")).alias("tool"),
                    F.col("ts").cast("timestamp").alias("ts")))
