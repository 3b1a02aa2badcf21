import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.pipeline.session import build_session
    s = build_session(app_name="ocr-spark-tests", cores=8,
                      shuffle_partitions=8)
    yield s
    s.stop()
