import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

# -- default fast tier (round 14) -------------------------------------------
# The driver's verify window cannot fit the full suite (~58 min of
# single-process Spark work at round 13); tests listed in slow_tests.txt
# are marked `slow` and deselected by the `-m "not slow"` addopts in
# pyproject.toml. SPARK_GRAFT_FULL_TESTS=1 disables the marking so the
# same command runs everything (the pre-commit bar — see slow_tests.txt).

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _slow_ids():
    try:
        with open(_SLOW_LIST) as f:
            return {ln.strip() for ln in f
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return set()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test excluded from the default (driver) tier; "
        "run with SPARK_GRAFT_FULL_TESTS=1 to include")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    # explicit node ids (pytest file.py::test_name) mean the developer
    # wants exactly those tests — don't let the default -m filter
    # silently deselect a named slow test into a green-looking no-op
    if any("::" in str(a) for a in config.invocation_params.args):
        return
    slow = _slow_ids()
    if not slow:
        return
    for item in items:
        key = f"{os.path.basename(str(item.fspath))}::{item.name}"
        if key in slow:
            item.add_marker(pytest.mark.slow)


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
