"""Multimodal column operators (image / audio / video plumbing).

Design (task brief): media are opaque `binary` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas stages over mapInPandas. The image/audio codec
libraries are not in this container, so the DECODE step is a
deterministic fake (byte-level stats / hash-derived "pixels") behind
`_decode_image` / `_decode_audio` — clearly marked, one function each to
swap for PIL/soundfile — while everything Spark-side is real and tested:
the asset table schema, the binary column handling through Arrow, the
UDF signatures and batch shapes, the metadata-driven frame-sampling plan
(pure column arithmetic, oracle-checked), and the partitioning.

Scale notes: assets are processed map-only (no shuffle); frame-sample
explodes metadata BEFORE touching bytes, so the plan prunes to sampled
frames and a 100 TB video corpus never materializes unsampled frames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

FPS = 24
SAMPLE_EVERY = 48  # one frame every 2 seconds


def _assets(spark, sf_dir):
    """Typed asset table synthesized deterministically from documents:
    blob = utf-8 bytes of text (stand-in for media bytes), mime cycles
    image/audio/video, metadata carries the typed fields a real ingest
    would (width/height or sample_rate or duration_ms/fps)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mime = (F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4"))
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("blob"),
        mime.alias("mime"),
        F.create_map(
            F.lit("width"), ((F.col("doc_id") % 8 + 1) * 160).cast("string"),
            F.lit("height"), ((F.col("doc_id") % 8 + 1) * 90).cast("string"),
            F.lit("sample_rate"), F.lit("16000"),
            F.lit("duration_ms"),
            ((F.col("doc_id") % 30 + 1) * 1000).cast("string"),
            F.lit("fps"), F.lit(str(FPS)),
        ).alias("meta"),
    )


def _decode_image(blob: bytes, width: int, height: int):
    """STUB DECODE (no PIL in this container): deterministic fake pixel
    stats from the bytes. Swap body for `PIL.Image.open(BytesIO(blob))`
    to make it real — the signature and batch shape stay identical."""
    b = bytes(blob or b"")
    n = max(1, len(b))
    return (sum(b) / n, min(b, default=0), max(b, default=0))


def _decode_audio(blob: bytes, sample_rate: int):
    """STUB DECODE (no soundfile): fake per-window energy over bytes."""
    b = bytes(blob or b"")
    win = max(1, sample_rate // 100)
    return [sum(b[i:i + win]) % 997 for i in range(0, min(len(b), 10 * win), win)]


def mm_image_resize(spark, sf_dir):
    """Image path: decode (stubbed) → 'resize' to a 64x36 thumbnail plan —
    emits per-image stats + target dims + a deterministic content
    checksum. Map-only pandas stage. Oracle-checked: the fake decode is
    byte statistics (replayed in DuckDB by exploding the blob's hex
    pairs), the checksum is md5-first-8-bytes, and the mean rounds
    half-up to match SQL ROUND."""
    import math

    import pandas as pd
    assets = _assets(spark, sf_dir).where(F.col("mime") == "image/png")

    def _resize(batches):
        import hashlib
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"],
                                          pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                mean, lo, hi = _decode_image(blob, w, h)
                checksum = int.from_bytes(
                    hashlib.md5(bytes(blob or b"")).digest()[:8],
                    "big") - (1 << 63)
                rows.append((int(doc_id), w, h, 64, 36,
                             math.floor(float(mean) * 1000 + 0.5) / 1000,
                             checksum))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "src_w", "src_h", "dst_w", "dst_h",
                "mean_byte", "checksum"])

    return (assets.mapInPandas(
        _resize, "doc_id long, src_w int, src_h int, dst_w int, dst_h int,"
        " mean_byte double, checksum long").orderBy("doc_id"))


# the blob is the utf-8 encoding of `text`, so hex(encode(text)) exposes
# its bytes to SQL: two hex chars per byte, exploded over a range
_MM_BYTES_CTE = """
bytes AS (
  SELECT doc_id, p, ('0x' || substr(hx, CAST(2 * p + 1 AS INT), 2))::INT AS byte
  FROM (SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx
        FROM documents WHERE doc_id % 3 = {residue}),
       UNNEST(range(0, length(hx) // 2)) AS t(p)
)"""

MM_IMAGE_SQL = f"""
WITH {_MM_BYTES_CTE.format(residue=0)},
stats AS (
  SELECT doc_id, COUNT(*) AS n_bytes, SUM(byte) AS sum_bytes
  FROM bytes GROUP BY doc_id
)
SELECT d.doc_id,
       CAST((d.doc_id % 8 + 1) * 160 AS INT) AS src_w,
       CAST((d.doc_id % 8 + 1) * 90 AS INT) AS src_h,
       64 AS dst_w, 36 AS dst_h,
       ROUND(CAST(COALESCE(s.sum_bytes, 0) AS DOUBLE)
             / GREATEST(COALESCE(s.n_bytes, 0), 1), 3) AS mean_byte,
       CAST(('0x' || substr(md5(coalesce(d.text, '')), 1, 16))::UBIGINT::HUGEINT
            - 9223372036854775808 AS BIGINT) AS checksum
FROM documents d LEFT JOIN stats s USING (doc_id)
WHERE d.doc_id % 3 = 0
ORDER BY d.doc_id
"""


def mm_audio_features(spark, sf_dir):
    """Audio path: decode (stubbed) → windowed energy features; emits
    n_windows + first energies. Map-only pandas stage. Oracle-checked:
    the fake per-window byte-energy is replayed in DuckDB by grouping
    the blob's exploded hex pairs into sample_rate/100-byte windows."""
    import pandas as pd
    assets = _assets(spark, sf_dir).where(F.col("mime") == "audio/wav")

    def _feat(batches):
        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["blob"],
                                          pdf["meta"]):
                e = _decode_audio(blob, int(meta["sample_rate"]))
                rows.append((int(doc_id), len(e), e[:4]))
            yield pd.DataFrame(rows, columns=["doc_id", "n_windows",
                                              "head_energy"])

    return (assets.mapInPandas(
        _feat, "doc_id long, n_windows int, head_energy array<int>")
        .orderBy("doc_id"))


# sample_rate is fixed at 16000 → window = 160 bytes, capped at 10 windows
_AUDIO_WIN = 16000 // 100

MM_AUDIO_SQL = f"""
WITH {_MM_BYTES_CTE.format(residue=1)},
wins AS (
  SELECT doc_id, p // {_AUDIO_WIN} AS win,
         CAST(SUM(byte) % 997 AS INT) AS energy
  FROM bytes WHERE p < {10 * _AUDIO_WIN}
  GROUP BY doc_id, p // {_AUDIO_WIN}
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_windows,
         list_slice(list(energy ORDER BY win), 1, 4) AS head_energy
  FROM wins GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.n_windows, 0) AS n_windows,
       COALESCE(a.head_energy, []) AS head_energy
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id % 3 = 1
ORDER BY d.doc_id
"""


def mm_frame_plan(spark, sf_dir):
    """Video frame-sampling PLAN: pure metadata arithmetic — every
    SAMPLE_EVERY-th frame of duration_ms×fps — exploded to one row per
    sampled frame BEFORE any byte is touched (the pruning that makes
    100 TB video viable). Fully SQL-expressible → DuckDB oracle."""
    assets = _assets(spark, sf_dir).where(F.col("mime") == "video/mp4")
    n_frames = (F.col("meta")["duration_ms"].cast("long") * FPS / 1000) \
        .cast("long")
    return (
        assets.withColumn("n_frames", n_frames)
        .select("doc_id", "n_frames",
                F.explode(F.sequence(
                    F.lit(0), F.col("n_frames") - 1,
                    F.lit(SAMPLE_EVERY))).alias("frame_idx"))
        .withColumn("ts_ms", (F.col("frame_idx") * 1000 / FPS).cast("long"))
        .orderBy("doc_id", "frame_idx")
    )


MM_FRAME_SQL = f"""
WITH v AS (
  SELECT doc_id, (doc_id % 30 + 1) * 1000 AS duration_ms
  FROM documents WHERE doc_id % 3 = 2
), f AS (
  SELECT doc_id, CAST(duration_ms * {FPS} / 1000 AS BIGINT) AS n_frames
  FROM v
)
SELECT doc_id, n_frames,
       unnest(range(0, n_frames, {SAMPLE_EVERY})) AS frame_idx,
       CAST(unnest(range(0, n_frames, {SAMPLE_EVERY})) * 1000 / {FPS} AS BIGINT) AS ts_ms
FROM f
ORDER BY doc_id, frame_idx
"""


PHASH_BANDS = 4         # 16 bits per band: hamming<=3 pairs always collide
PHASH_MAX_HAMMING = 6   # verification threshold (perceptual tolerance)


def _phash_stage(batches):
    """Arrow stage: (doc_id, blob) → (doc_id, phash). A perceptual-hash
    ANALOG over the stubbed decode: 64 byte blocks (block of byte p is
    p*64 DIV n — assignment-defined, no boundary formula to mirror),
    bit b set iff the block's mean beats the global mean, compared as
    the integer cross-multiply block_sum*n > total*block_len (no
    floats anywhere, so DuckDB replays it exactly from hex pairs).
    Swapping _decode_image for PIL turns the byte stream into real
    grayscale pixels and this becomes a standard blockwise aHash; the
    banding/verify machinery downstream is decode-agnostic."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        ids, phs = [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            b = np.frombuffer(bytes(blob or b""), dtype=np.uint8)
            n = len(b)
            if n == 0:
                ph = 0
            else:
                blk = (np.arange(n, dtype=np.int64) * 64) // n
                bsum = np.bincount(blk, weights=b, minlength=64) \
                    .astype(np.int64)
                blen = np.bincount(blk, minlength=64).astype(np.int64)
                total = int(bsum.sum())
                bits = bsum * n > total * blen
                ph = 0
                for k in np.nonzero(bits)[0]:
                    ph |= 1 << int(k)
                if ph >= 1 << 63:
                    ph -= 1 << 64
            ids.append(int(doc_id))
            phs.append(ph)
        yield pd.DataFrame({"doc_id": ids, "phash": phs})


def mm_phash_neardup(spark, sf_dir):
    """Image near-dup at the signature grain: per-image 64-bit
    perceptual hash (map-only Arrow stage over the binary column) →
    dedup to DISTINCT signatures (pairing cost scales with distinct
    hashes, not images — a re-crawled identical image never re-pairs)
    → 4×16-bit banded self-join (any pair within hamming 3 shares a
    band by pigeonhole; up to {PHASH_MAX_HAMMING} caught with the usual
    banding recall) → exact bit_count(xor) verify, once per signature
    pair. Output: representative image ids + member counts per side —
    the edges a dup-cluster pass consumes (exact duplicates collapse
    into one signature and are dd_exact_dup's job)."""
    assets = (_assets(spark, sf_dir)
              .where(F.col("mime") == "image/png")
              .select("doc_id", "blob"))
    sigs = (assets.mapInPandas(_phash_stage, "doc_id long, phash long")
            .groupBy("phash")
            .agg(F.min("doc_id").alias("rep"),
                 F.count("*").cast("long").alias("n_docs")))
    bits = 64 // PHASH_BANDS
    mask = (1 << bits) - 1
    bands = sigs.select(
        "phash", "rep", "n_docs",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("phash", b * bits)
                     .bitwiseAND(F.lit(mask)).alias("band_bits"))
            for b in range(PHASH_BANDS)])).alias("bh")
    ).select("phash", "rep", "n_docs", "bh.band", "bh.band_bits")
    a = bands.select(F.col("phash").alias("pa"), F.col("rep").alias("rep_a"),
                     F.col("n_docs").alias("n_docs_a"), "band", "band_bits")
    b = bands.select(F.col("phash").alias("pb"), F.col("rep").alias("rep_b"),
                     F.col("n_docs").alias("n_docs_b"), "band", "band_bits")
    # orient pairs by representative id (one rep per distinct signature,
    # so rep order is a total order on signatures) — readable output,
    # same dedup
    pairs = (a.join(b, ["band", "band_bits"])
             .where(F.col("rep_a") < F.col("rep_b"))
             .groupBy("pa", "pb", "rep_a", "rep_b", "n_docs_a", "n_docs_b")
             .agg(F.count("*").cast("long").alias("n_band_hits"))
             .withColumn("hamming",
                         F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
                         .cast("long"))
             .where(F.col("hamming") <= PHASH_MAX_HAMMING))
    return (pairs.select("rep_a", "rep_b", "hamming", "n_band_hits",
                         "n_docs_a", "n_docs_b")
            .orderBy("rep_a", "rep_b"))


MM_PHASH_SQL = f"""
WITH {_MM_BYTES_CTE.format(residue=0)},
tot AS (
  SELECT doc_id, COUNT(*) AS n, SUM(byte) AS total FROM bytes GROUP BY 1
),
blocks AS (
  SELECT b.doc_id, (b.p * 64) // t.n AS blk,
         SUM(b.byte) AS bsum, COUNT(*) AS blen
  FROM bytes b JOIN tot t USING (doc_id) GROUP BY 1, 2
),
phbits AS (
  SELECT bl.doc_id,
         SUM(CASE WHEN bl.bsum * t.n > t.total * bl.blen
                  THEN CAST(1 AS HUGEINT) << CAST(bl.blk AS INT)
                  ELSE CAST(0 AS HUGEINT) END) AS uval
  FROM blocks bl JOIN tot t USING (doc_id)
  GROUP BY 1
),
ph AS (
  -- u64 -> signed i64 (the HUGEINT mod-2^64 mirror); LEFT JOIN keeps
  -- empty-blob docs at phash 0, matching the Arrow stage's n=0 branch
  SELECT d.doc_id,
         CAST(COALESCE(p.uval, 0)
              - CASE WHEN COALESCE(p.uval, 0)
                          >= CAST(9223372036854775808 AS HUGEINT)
                     THEN CAST(18446744073709551616 AS HUGEINT)
                     ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS phash
  FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
  LEFT JOIN phbits p USING (doc_id)
),
sigs AS (
  SELECT phash, MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM ph GROUP BY 1
),
bands AS (
  SELECT phash, rep, n_docs, band,
         (phash >> CAST(band * 16 AS INT)) & 65535 AS band_bits
  FROM sigs, UNNEST(range(0, {PHASH_BANDS})) AS t(band)
)
SELECT a.rep AS rep_a, b.rep AS rep_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
       CAST(COUNT(*) AS BIGINT) AS n_band_hits,
       a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_bits = b.band_bits AND a.rep < b.rep
WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}
GROUP BY 1, 2, 3, 5, 6
ORDER BY rep_a, rep_b
"""


QUERIES = {
    "mm_image_resize": (mm_image_resize, MM_IMAGE_SQL),
    "mm_audio_features": (mm_audio_features, MM_AUDIO_SQL),
    "mm_frame_plan": (mm_frame_plan, MM_FRAME_SQL),
    "mm_phash_neardup": (mm_phash_neardup, MM_PHASH_SQL),
}
