import os
import shutil
import tempfile

import pytest

from record_deduplication_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_MASTER", "local[8]")
    s = build_session(app="tests", shuffle_partitions=8,
                      extra={"spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmpdir_session():
    d = tempfile.mkdtemp(prefix="rdsp_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
