import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from inxs_spark.sources.session import get_spark

    session = get_spark(master="local[2]", app_name="inxs_spark-tests")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    """Materialized tiny transcript tier (cached under .data)."""
    from inxs_spark.sources.transcripts import ensure_transcripts

    return ensure_transcripts(spark, "tiny")


@pytest.fixture()
def tmp_out():
    path = tempfile.mkdtemp(prefix="inxs_spark_test_")
    yield path
    shutil.rmtree(path, ignore_errors=True)
