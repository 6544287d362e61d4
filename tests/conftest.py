import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from bioio_spark.session import get_session

    s = get_session("bioio_spark_tests", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        "spark.default.parallelism": "4",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
