"""L14 SSL-prototypes pruning (Sorscher et al. 2022) invariants.

Oracle parity at sf0.001 is covered by test_oracle_parity; these pin
the pruning arithmetic and the plan shape.
"""
import re

import pyspark.sql.functions as F


def _load_emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_drop_count_is_exact_quarter_per_cluster(spark, sf_dir):
    from bioio_spark.functions.similarity import (
        PROTO_PRUNE_MILLI, proto_prune)

    emb = _load_emb(spark, sf_dir)
    total = emb.count()
    kept = proto_prune(emb, cache_key=sf_dir)
    per = {r["cid"]: r["n"] for r in
           kept.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    # reconstruct cluster sizes: kept n = cn - cn*250//1000
    # => every cluster's kept count must be consistent with SOME cn,
    # and the cn's must sum to the corpus size
    cn_sum = 0
    for cid, n_kept in per.items():
        # invert: cn - cn*milli//1000 == n_kept has a contiguous
        # solution range; check the canonical cn = smallest solution
        cn = n_kept
        while cn - cn * PROTO_PRUNE_MILLI // 1000 < n_kept:
            cn += 1
        assert cn - cn * PROTO_PRUNE_MILLI // 1000 == n_kept
        cn_sum += cn
    # the smallest-solution inversion can undershoot the true cn by
    # at most the quantization plateau width; the corpus-total check
    # is therefore >= with a small slack upper-bounded by #clusters*3
    assert cn_sum <= total <= cn_sum + 3 * len(per)


def test_ranks_are_contiguous_suffix(spark, sf_dir):
    """Kept proto_ranks in each cluster are exactly
    drop_n+1 .. cn — a contiguous suffix (the hardest examples)."""
    from bioio_spark.functions.similarity import proto_prune

    kept = proto_prune(_load_emb(spark, sf_dir), cache_key=sf_dir)
    rows = kept.collect()
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["cid"], []).append(r["proto_rank"])
    for cid, ranks in by_cid.items():
        ranks = sorted(ranks)
        assert ranks == list(range(ranks[0], ranks[0] + len(ranks))), cid
        # the dropped prefix is exactly cn*250//1000 where cn = max rank
        cn = ranks[-1]
        assert ranks[0] == cn * 250 // 1000 + 1, cid


def test_plan_single_cluster_shuffle_no_python(spark, sf_dir):
    from bioio_spark.functions.similarity import proto_prune

    df = proto_prune(_load_emb(spark, sf_dir), cache_key=sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Python" not in plan        # centroid argmax is pure codegen
    # one hash exchange on cid for the windows + the output range sort
    hash_ex = re.findall(r"Exchange hashpartitioning\(cid", plan)
    assert len(hash_ex) == 1, plan
