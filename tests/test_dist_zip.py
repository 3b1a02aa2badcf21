"""dist/ocr_spark.zip freshness pin.

The spark-submit job CLIs ship the package via --py-files
dist/ocr_spark.zip; a zip that lags the source tree silently runs OLD
code (a class of bug fixed once in round 5 and reintroduced once since —
hence this pin). Every .py member must be byte-identical to the tree and
every tree module must be present."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(ROOT, "dist", "ocr_spark.zip")
REBUILD = ("stale dist/ocr_spark.zip — rebuild with: "
           "python -c 'import bench; bench._build_pyfiles_zip()'")


def test_zip_matches_source_tree():
    assert os.path.exists(ZIP), REBUILD
    with zipfile.ZipFile(ZIP) as z:
        members = {n for n in z.namelist() if n.endswith(".py")}
        tree = set()
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, "ocr_spark")):
            for fn in files:
                if fn.endswith(".py"):
                    tree.add(os.path.relpath(os.path.join(dirpath, fn), ROOT))
        assert members == tree, REBUILD
        for name in sorted(members):
            with open(os.path.join(ROOT, name), "rb") as f:
                assert z.read(name) == f.read(), f"{name}: {REBUILD}"
