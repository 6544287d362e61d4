"""Query registry: every SURVEY §2 operator exposed as a named
(spark_fn, oracle_sql) pair consumed by __spark_entry__.py and bench.py."""

from bioio_spark.queries.base import REGISTRY, QuerySpec, register, load

# importing the modules populates REGISTRY
from bioio_spark.queries import relational  # noqa: F401
from bioio_spark.queries import tpch  # noqa: F401
from bioio_spark.queries import llm  # noqa: F401
from bioio_spark.queries import image  # noqa: F401
from bioio_spark.queries import streaming_batch  # noqa: F401
from bioio_spark.queries import meta  # noqa: F401
from bioio_spark.queries import multimodal  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "register", "load"]
