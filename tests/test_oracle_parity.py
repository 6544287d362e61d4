"""Local mirror of the driver's t2 correctness gate: every registered query
runs on Spark AND DuckDB over the same parquet fixtures; results must match
on row count, column names, and values (canonically sorted, doubles rounded
to 9 significant digits)."""

from __future__ import annotations

import math

import duckdb
import pytest

from bioio_spark.queries import REGISTRY

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ALL_QUERIES = sorted(REGISTRY)


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        if val == 0:
            return 0.0
        return float(f"{val:.9g}")
    if isinstance(val, (list, tuple)):
        return tuple(_canon(v) for v in val)
    return val


def _num_kind(val):
    """'int' / 'float' bucket for the driver's stringify-then-hash gate:
    Spark bigint 1085 vs DuckDB HUGEINT-promoted 1085.0 hash differently
    even though == compares equal.  Decimal counts as float (same string
    form after rounding)."""
    import decimal

    if isinstance(val, bool) or val is None:
        return None
    if isinstance(val, int):
        return "int"
    if isinstance(val, (float, decimal.Decimal)):
        return "float"
    if isinstance(val, (list, tuple)):
        kinds = {_num_kind(v) for v in val} - {None}
        return tuple(sorted(kinds)) or None
    return None


def _col_kinds(rows, columns):
    out = {}
    for i, c in enumerate(columns):
        kinds = {_num_kind(r[i]) for r in rows} - {None}
        out[c] = kinds
    return out


def _canon_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    ddf = duck.execute(spec.oracle).fetchall()
    dcols = [d[0].lower() for d in duck.description]

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch {scols} vs {dcols}")
    assert len(srows) == len(ddf), (
        f"{name}: row count {len(srows)} vs {len(ddf)}")
    skinds = _col_kinds(srows, scols)
    dkinds = _col_kinds(ddf, dcols)
    kind_diff = {c: (skinds[c], dkinds[c]) for c in skinds
                 if skinds[c] != dkinds[c]}
    assert not kind_diff, (
        f"{name}: numeric-kind mismatch (driver hash would fail): "
        f"{kind_diff} — cast the oracle column (e.g. CAST(sum(x) AS "
        f"BIGINT)) to match Spark's type")
    left = _canon_rows(srows, scols)
    right = _canon_rows(ddf, dcols)
    mismatches = [(l, r) for l, r in zip(left, right) if l != r]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: "
        f"{mismatches[:3]}")


@pytest.mark.parametrize("name", [n for n in ALL_QUERIES
                                  if n not in ORACLE_QUERIES])
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())
