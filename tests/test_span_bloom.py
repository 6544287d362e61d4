"""L2f span-coverage sweep and L9b Bloom decontamination cross-checked
against brute-force Python references (the operator's interval-union
and sketch arithmetic must match a naive recomputation exactly)."""

import hashlib

import numpy as np
import pytest

from bioio_spark.functions.dedup import (BLOOM_BITS, BLOOM_J, BLOOM_M,
                                         SPAN_K, bloom_decontamination,
                                         ngram_span_coverage)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _brute_coverage(texts, k=SPAN_K):
    split = [t.split() for t in texts]
    from collections import defaultdict
    owners = defaultdict(set)
    for d, ws in enumerate(split):
        for i in range(len(ws) - k + 1):
            owners[" ".join(ws[i:i + k])].add(d)
    out = {}
    for d, ws in enumerate(split):
        covered = set()
        for i in range(len(ws) - k + 1):
            if len(owners[" ".join(ws[i:i + k])]) >= 2:
                covered.update(range(i, i + k))
        out[d] = (len(ws), len(covered))
    return out


def test_span_coverage_matches_bruteforce(spark):
    rng = np.random.default_rng(31)
    vocab = ["a", "b", "c", "d"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 14)))
             for _ in range(30)]
    # force heavy overlap and repeats ("a a a" self-overlap shapes)
    texts += ["a a a a a", "a a a", "b c d b c d b c d", "a"]
    got = {r["doc_id"]: (r["n_tokens"], r["n_covered"])
           for r in ngram_span_coverage(_docs(spark, texts)).collect()}
    assert got == _brute_coverage(texts)


def _brute_bloom(texts, eval_mod=10, j=BLOOM_J):
    split = [t.split() for t in texts]
    shingles = [
        {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        for ws in split]
    is_eval = [_h32(f"split:{d}") % eval_mod == 0
               for d in range(len(texts))]
    bits = set()
    for d, shs in enumerate(shingles):
        if is_eval[d]:
            for g in shs:
                for i in range(j):
                    bits.add(_h32(f"b{i}:{g}") % BLOOM_M)
    out = {}
    for d, shs in enumerate(shingles):
        if is_eval[d] or not shs:
            continue
        flagged = sum(
            1 for g in shs
            if all(_h32(f"b{i}:{g}") % BLOOM_M in bits
                   for i in range(j)))
        out[d] = (len(shs), flagged, 1 if flagged == 0 else 0)
    return out


def test_bloom_decontam_matches_bruteforce(spark):
    rng = np.random.default_rng(37)
    vocab = ["x", "y", "z", "w", "v"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(40)]
    got = {r["doc_id"]: (r["n_grams"], r["n_flagged"], r["keep"])
           for r in bloom_decontamination(_docs(spark, texts)).collect()}
    assert got == _brute_bloom(texts)


def test_bloom_filter_is_bounded(spark):
    """The filter aggregate can never exceed BLOOM_WORDS rows and the
    probe join is an explicit broadcast."""
    texts = ["p q r s t u v w"] * 25 + ["zz yy xx ww"] * 5
    df = bloom_decontamination(_docs(spark, texts))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert BLOOM_M == 64 * BLOOM_BITS
