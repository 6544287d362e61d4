"""L3 similarity search over the embeddings table (SURVEY §2.8).

- cosine_topk: brute-force cosine against one query vector. Scale: a single
  narrow scan + broadcast of the (1-row) query, per-partition top-k heaps via
  TakeOrderedAndProject — the baseline every ANN variant is checked against.
- lsh_near_duplicates: random-hyperplane (here: coordinate-plane sign bits)
  bucketing, pairs generated only within buckets — the scale path: the
  self-join shuffles on the bucket key instead of exploding n^2 pairs.

Dot products use higher-order functions (zip_with + aggregate) on
double-cast elements — JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SIGN_BITS = 8


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0,
                k: int = 10) -> DataFrame:
    emb = embeddings.select(
        "vec_id", "label", _to_double(F.col("embedding")).alias("e"))
    q = (emb.filter(F.col("vec_id") == query_vec_id)
         .select(F.col("e").alias("q")))
    sim = _dot(F.col("e"), F.col("q")) / (_norm(F.col("e"))
                                          * _norm(F.col("q")))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


COSINE_TOPK_ORACLE = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
q AS (SELECT e AS q FROM e WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       list_dot_product(e.e, q.q)
         / (sqrt(list_dot_product(e.e, e.e))
            * sqrt(list_dot_product(q.q, q.q))) AS cosine_sim
FROM e, q
WHERE e.vec_id != 0
ORDER BY cosine_sim DESC, e.vec_id LIMIT 10
"""


def lsh_near_duplicates(embeddings: DataFrame,
                        threshold: float = 0.3) -> DataFrame:
    """Sign-bucket LSH: pairs within a bucket with cosine >= threshold."""
    emb = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e"))
    bucket = None
    for b in range(N_SIGN_BITS):
        bit = F.when(F.element_at(F.col("e"), b + 1) >= 0,
                     F.lit(2 ** b)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    emb = emb.withColumn("bucket", bucket.cast("int"))
    a, b_ = emb.alias("a"), emb.alias("b")
    sim = _dot(F.col("a.e"), F.col("b.e")) / (
        _norm(F.col("a.e")) * _norm(F.col("b.e")))
    return (
        a.join(b_, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def _lsh_oracle(threshold: float = 0.3) -> str:
    bits = " + ".join(
        f"CASE WHEN e[{b + 1}] >= 0 THEN {2 ** b} ELSE 0 END"
        for b in range(N_SIGN_BITS))
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    bucketed AS (SELECT vec_id, e, CAST({bits} AS INTEGER) AS bucket FROM e)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e))) AS cosine_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))) >= {threshold}
    ORDER BY vec_a, vec_b
    """


LSH_NEAR_DUP_ORACLE = _lsh_oracle()
