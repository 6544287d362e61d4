"""L4m bigram conditional surprisal invariants (parity is in
test_oracle_parity)."""
import pyspark.sql.functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bits_bounds_and_gate(spark, sf_dir):
    """bits(w|prev) in [0, bitlen(c_prev)); a doc made entirely of one
    repeated bigram transition scores 0 conditional bits for it when
    that transition is deterministic for its prev."""
    from bioio_spark.functions.text import (
        BIGRAM_KEEP_MILLI, bigram_surprisal)

    out = bigram_surprisal(_docs(spark, sf_dir)).collect()
    assert out, "fixture docs must produce bigrams"
    for r in out:
        assert r["n_bigrams"] >= 1
        assert r["bits_sum"] >= 0
        expect = int(r["bits_sum"] * 1000
                     <= BIGRAM_KEEP_MILLI * r["n_bigrams"])
        assert r["keep"] == expect
    kept = sum(r["keep"] for r in out)
    assert 0 < kept < len(out), "gate must split the fixture corpus"


def test_plan_in_row_bigrams_no_window(spark, sf_dir):
    """Bigrams come from arrays_zip inside the row: the plan has no
    Window, no cartesian, no Python — only hash aggs and the model
    join."""
    from bioio_spark.functions.text import bigram_surprisal

    df = bigram_surprisal(_docs(spark, sf_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_short_docs_excluded(spark):
    """Docs with <2 tokens have no bigram and are absent from the
    output rather than surfacing a NULL/zero-division row."""
    from bioio_spark.functions.text import bigram_surprisal
    from bioio_spark.session import get_session

    spark = get_session("bioio_spark_tests")
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens here"), (3, "   ")],
        "doc_id long, text string")
    rows = bigram_surprisal(docs).collect()
    assert [r["doc_id"] for r in rows] == [2]
    assert rows[0]["n_bigrams"] == 2
