"""Registry-wide oracle dtype lint (driver-hash stability gate).

The driver stringifies values before hashing, so a DuckDB oracle column
whose inferred type is HUGEINT (DuckDB's promotion for an uncast integer
``sum()``) renders ``1085.0`` against Spark's ``1085`` and fails the
hash even when the values are equal — the round-4 red class (a34/l4g/
l4h). ``lint_oracle_output_types`` DESCRIBEs every registered oracle in
DuckDB (type inference only, no data scan) and flags such columns; this
suite pins the whole registry at zero violations and proves the lint
actually catches a deliberately broken query.
"""

import os

import pytest

import bioio_spark.queries  # noqa: F401  (populates REGISTRY)
from bioio_spark.queries.base import (REGISTRY, QuerySpec,
                                      lint_oracle_output_types)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST",
                        "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="fixture tables not present")
def test_registry_has_zero_dtype_violations():
    bad = lint_oracle_output_types(SF_DIR)
    assert bad == {}, (
        f"oracle columns with driver-hash-unstable DuckDB types "
        f"(add CAST(... AS BIGINT)): {bad}")


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="fixture tables not present")
def test_lint_catches_uncast_integer_sum():
    broken = {
        "zz_broken": QuerySpec(
            name="zz_broken", fn=lambda spark, sf_dir: None,
            oracle="SELECT l_returnflag, sum(l_linenumber) AS n "
                   "FROM lineitem GROUP BY l_returnflag"),
        "zz_fine": QuerySpec(
            name="zz_fine", fn=lambda spark, sf_dir: None,
            oracle="SELECT l_returnflag, CAST(sum(l_linenumber) AS "
                   "BIGINT) AS n FROM lineitem GROUP BY l_returnflag"),
        "zz_rows_only": QuerySpec(
            name="zz_rows_only", fn=lambda spark, sf_dir: None,
            oracle=None),
    }
    bad = lint_oracle_output_types(SF_DIR, registry=broken)
    assert set(bad) == {"zz_broken"}
    assert bad["zz_broken"] == [("n", "HUGEINT")]


def test_real_registry_is_nonempty():
    assert sum(1 for s in REGISTRY.values() if s.oracle) > 100
