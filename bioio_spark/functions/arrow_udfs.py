"""Arrow-vectorized pandas_udf surface (SURVEY §2.9).

This module deliberately does NOT use `from __future__ import
annotations`: pyspark infers the pandas-UDF eval type (scalar vs
grouped-agg) from REAL type hints, and stringified hints defeat the
inference (UNSUPPORTED_SIGNATURE). Queries import these rather than
defining UDFs inline in annotation-stringified modules.

Scale: scalar pandas_udfs process whole Arrow batches (never rows);
grouped-agg pandas_udfs ship one partial buffer per group per
partition — the same shuffle discipline as a JVM aggregate, with the
Python worker cost paid once per batch.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def nonlinear_ramp(v: pd.Series) -> pd.Series:
    """SCALAR flavor: the stencil fixtures' nonlinear v^2 % 251 ramp,
    computed in numpy on whole Arrow batches."""
    x = v.astype("int64")
    return (x * x) % 251


@pandas_udf("long")
def int_sum(v: pd.Series) -> int:
    """GROUPED_AGG flavor: exact integer sum."""
    return int(v.sum())


@pandas_udf("long")
def int_max(v: pd.Series) -> int:
    """GROUPED_AGG flavor: exact integer max."""
    return int(v.max())


@pandas_udf("long")
def int_count(v: pd.Series) -> int:
    """GROUPED_AGG flavor: group size. JVM aggregates cannot mix with
    grouped-agg pandas UDFs in one agg (INVALID_PANDAS_UDF_PLACEMENT),
    so counting is its own pandas aggregate."""
    return int(len(v))
