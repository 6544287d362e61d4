"""L31 blocked fuzzy join — designed-corpus semantics.

Pins the four behaviors the operator contract promises: one-edit
twins inside a block are caught with the exact distance, same-block
strings past the threshold are rejected, twins whose first blk chars
differ are MISSED by design (the blocking recall trade-off — the
documented lever is more prefix chars, not a wider cap), and a
degenerate block stays bounded by the keep-lowest-id cap.
"""
from pyspark.sql import functions as F  # noqa: F401

from bioio_spark.queries.llm import fuzzy_blocked_join


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_one_edit_twin_caught_exact_distance(spark):
    out = fuzzy_blocked_join(_docs(spark, [
        (1, "alpha beta gamma delta x"),
        (2, "alpha beta gamma delta y"),   # 1 substitution at the end
        (3, "alpha beta gamma deltas"),    # 1 deletion vs doc 1? no:
                                           # different length band
    ])).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["dist"] for r in out}
    assert pairs[(1, 2)] == 1
    # doc 3's key is 23 chars -> different length band, not compared
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_past_threshold_rejected(spark):
    out = fuzzy_blocked_join(_docs(spark, [
        (1, "alpha beta gamma delta aa"),
        (2, "alpha zzzzz wwwww vvvvv b"),  # same 4-char block, far
    ])).collect()
    assert out == []


def test_cross_block_twin_missed_by_design(spark):
    out = fuzzy_blocked_join(_docs(spark, [
        (1, "alpha beta gamma delta xx"),
        (2, "Xlpha beta gamma delta xx"),  # 1 edit INSIDE the prefix
    ])).collect()
    assert out == []   # blocking recall trade-off, documented


def test_degenerate_block_bounded_by_cap(spark):
    n = 200
    rows = [(i, "same same same same same!") for i in range(n)]
    out = fuzzy_blocked_join(_docs(spark, rows), cap=16).collect()
    # 16 survivors (lowest ids) -> at most C(16,2) pairs, all dist 0
    assert len(out) == 16 * 15 // 2
    assert max(max(r["doc_a"], r["doc_b"]) for r in out) == 15
