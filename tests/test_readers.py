"""Multi-format transcript readers: schema-fixed round-trips, corrupt-row
accounting, junk-path filtering, and extraction-equivalence across
formats."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.readers import read_transcripts, write_transcripts
from ocr_spark.sources.synthetic import synthesize_transcripts


@pytest.fixture(scope="module")
def sample(spark):
    return synthesize_transcripts(spark, n_convs=20).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts").cache()


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_round_trip_preserves_turns(spark, tmp_path, sample, fmt):
    path = str(tmp_path / fmt)
    write_transcripts(sample, path, fmt)
    got = read_transcripts(spark, path, fmt)
    assert got.count() == sample.count()
    key = lambda df: {(r.conv_id, r.turn_idx) for r in
                      df.select("conv_id", "turn_idx").collect()}
    assert key(got) == key(sample)


def test_extraction_identical_across_formats(spark, tmp_path, sample):
    """The engine's output must not depend on the wire format the
    transcripts arrived in (text payloads survive CSV escaping etc.)."""
    from ocr_spark.pipeline.extract import extract_turns

    def summarize(df):
        e = extract_turns(df, salt_partitions=0)
        return {(r.conv_id, r.turn_idx, r.source_kind, r.n_items,
                 None if r.calc_total is None else round(r.calc_total, 2))
                for r in e.select("conv_id", "turn_idx", "source_kind",
                                  "n_items", "calc_total").collect()}

    base = None
    for fmt in ("parquet", "json", "csv"):
        path = str(tmp_path / fmt)
        write_transcripts(sample, path, fmt)
        s = summarize(read_transcripts(spark, path, fmt))
        if base is None:
            base = s
        else:
            assert s == base, f"{fmt} round-trip changed extraction output"


def test_corrupt_rows_counted_not_thrown(spark, tmp_path):
    path = str(tmp_path / "j")
    os.makedirs(path)
    with open(os.path.join(path, "a.jsonl"), "w") as f:
        f.write('{"conv_id": "c1", "turn_idx": 1, "role": "user", '
                '"text": "hi", "tool": "", "ts": "2025-01-01T00:00:00"}\n')
        f.write("{this is not json}\n")
        f.write('{"conv_id": "c2", "turn_idx": 1, "role": "user", '
                '"text": "yo", "tool": "", "ts": "2025-01-01T00:00:01"}\n')
    all_rows = read_transcripts(spark, path, "json", drop_corrupt=False)
    good = read_transcripts(spark, path, "json", drop_corrupt=True)
    assert all_rows.count() == 3
    assert good.count() == 2  # the corrupt row is COUNTED out, not thrown


# ---------------------------------------------------------------------------
# S3/S4 — file / ZIP ingest at the table edge (sources/ingest.py)
# ---------------------------------------------------------------------------

_MD_INVOICE = (
    "## Supplier ACME Ltd\ninvoice no: INV-1001\ndate: 2025-02-03\n\n"
    "| code | name | qty | unit price | total |\n"
    "|---|---|---|---|---|\n"
    "| A-1 | Widget | 2 | 5.00 | 10.00 |\n\n合计：10.00\n")


def _make_upload_dir(root):
    import os
    d = os.path.join(root, "run_a", "sub")
    os.makedirs(d)
    with open(os.path.join(d, "b_doc.md"), "w") as f:
        f.write(_MD_INVOICE)
    with open(os.path.join(d, "a_doc.md"), "w") as f:
        f.write(_MD_INVOICE.replace("INV-1001", "INV-1000"))
    with open(os.path.join(d, ".hidden.md"), "w") as f:
        f.write("junk")
    with open(os.path.join(d, "Thumbs.db"), "w") as f:
        f.write("junk")
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("wrong extension")
    return d


def test_ingest_files_filters_and_decodes(spark, tmp_path):
    """Directory ingest (S3 analog): FileScanner's ignore patterns +
    extension whitelist, distributed binaryFile decode."""
    from ocr_spark.sources.ingest import ingest_files
    _make_upload_dir(str(tmp_path))
    rows = ingest_files(spark, str(tmp_path)).orderBy("name").collect()
    assert [r.name for r in rows] == ["a_doc.md", "b_doc.md"]
    assert rows[0].ext == "md" and rows[0].source.endswith("/run_a/sub")
    assert "合计：10.00" in rows[0].content  # UTF-8 decode survives
    assert rows[1].size == len(_MD_INVOICE.encode())


def test_ingest_zip_members_safety_and_e2e(spark, tmp_path):
    """ZIP ingest (S4 analog): member explode with directory-entry skip,
    path-traversal rejection, junk/extension filters, and a size cap —
    then the ingested transcripts run the normal extraction pipeline."""
    import os
    import zipfile

    from ocr_spark.pipeline.extract import extract_turns
    from ocr_spark.sources.ingest import files_to_transcripts, ingest_zip

    zdir = str(tmp_path / "zips")
    os.makedirs(zdir)
    with zipfile.ZipFile(os.path.join(zdir, "upload_1.zip"), "w") as z:
        z.writestr("docs/", "")                       # directory entry
        z.writestr("docs/inv2.md", _MD_INVOICE)
        z.writestr("docs/inv1.md",
                   _MD_INVOICE.replace("INV-1001", "INV-0999"))
        z.writestr("../evil.md", _MD_INVOICE)         # traversal
        z.writestr("docs/.DS_Store", "junk")
        z.writestr("docs/readme.txt", "wrong ext")
        z.writestr("docs/huge.md", "x" * 2048)        # over the test cap

    files = ingest_zip(spark, zdir, max_member_bytes=1024)
    rows = files.orderBy("name").collect()
    assert [r.name for r in rows] == ["inv1.md", "inv2.md"]
    assert all(r.source.endswith("/zips/upload_1") for r in rows)

    t = files_to_transcripts(files)
    trows = {r.turn_idx: r for r in t.collect()}
    assert sorted(trows) == [0, 1]                    # name-sorted rank
    assert trows[0].conv_id.endswith("/zips/upload_1")
    assert trows[0].tool == "markdown"

    ex = extract_turns(t, salt_partitions=0).collect()
    assert len(ex) == 2
    by_turn = {r.turn_idx: r for r in ex}
    assert by_turn[0].records[0].invoice_number == "INV-0999"
    assert by_turn[1].records[0].invoice_number == "INV-1001"
    assert by_turn[0].records[0].calc_total == 10.0


def test_ingest_zip_corrupt_archive_skipped(spark, tmp_path):
    """Garbage bytes with a .zip name must yield zero rows, not a crash
    (one bad archive in a bulk upload cannot kill the batch); a good
    archive beside it still ingests."""
    import os
    import zipfile

    from ocr_spark.sources.ingest import ingest_zip

    zdir = str(tmp_path / "zips")
    os.makedirs(zdir)
    with open(os.path.join(zdir, "broken.zip"), "wb") as f:
        f.write(b"\x00\x01not a zip at all\xff" * 100)
    with zipfile.ZipFile(os.path.join(zdir, "ok.zip"), "w") as z:
        z.writestr("a.md", _MD_INVOICE)

    rows = ingest_zip(spark, zdir).collect()
    assert [(r.source.rsplit("/", 1)[-1], r.name) for r in rows] == [("ok", "a.md")]


def test_synthetic_sizing_matches_n_turns_for(spark):
    """The skeleton's hot-conv F.when expression and the Python
    n_turns_for helper implement one sizing rule — pin them together so
    a change to either shape cannot silently desynchronize tests that
    size expectations via n_turns_for."""
    from ocr_spark.sources.synthetic import (n_turns_for,
                                             synthesize_transcripts)
    df = synthesize_transcripts(spark, n_convs=205)
    counts = {r.conv_id: r.n for r in
              df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 205
    for i in (0, 1, 99, 100, 101, 200, 204):
        assert counts[f"conv-{i:06d}"] == n_turns_for(i), i


def test_ingest_zip_hostile_members(spark, tmp_path):
    """Zeroed DOS dates must not crash the task; backslash traversal and
    uppercase .ZIP archives are handled."""
    import os
    import zipfile

    from ocr_spark.sources.ingest import ingest_zip

    zdir = str(tmp_path / "zips")
    os.makedirs(zdir)
    with zipfile.ZipFile(os.path.join(zdir, "UP.ZIP"), "w") as z:
        zi = zipfile.ZipInfo("ok.md")          # date_time defaults to
        zi.date_time = (1980, 0, 0, 0, 0, 0)   # a zeroed DOS date
        z.writestr(zi, _MD_INVOICE)
        z.writestr("..\\..\\evil.md", _MD_INVOICE)
        z.writestr("C:\\win\\abs.md", _MD_INVOICE)

    rows = ingest_zip(spark, zdir).collect()
    assert [r.name for r in rows] == ["ok.md"]
    assert rows[0].ts.year == 1980  # fallback epoch, not a crash
