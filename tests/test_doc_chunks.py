"""L17 chunker invariants (oracle parity in test_oracle_parity)."""


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_geometry(spark):
    """Long docs: every chunk is exactly window tokens, consecutive
    chunks overlap by window-stride, and the last chunk ends exactly at
    the document tail (clamped). Short docs: one whole-doc chunk."""
    from bioio_spark.functions.text import (CHUNK_STRIDE, CHUNK_WINDOW,
                                            doc_chunks)

    long_n, short_n = 100, 10
    rows = [(1, " ".join(f"w{i}" for i in range(long_n))),
            (2, " ".join(f"w{i}" for i in range(short_n)))]
    out = doc_chunks(_docs(spark, rows)).collect()
    long_chunks = [r for r in out if r["doc_id"] == 1]
    short_chunks = [r for r in out if r["doc_id"] == 2]

    assert all(r["chunk_len"] == CHUNK_WINDOW for r in long_chunks)
    starts = [r["start_tok"] for r in long_chunks]
    assert starts[0] == 0
    assert starts[-1] == long_n - CHUNK_WINDOW          # clamped tail
    assert all(b - a <= CHUNK_STRIDE for a, b in zip(starts, starts[1:]))
    # full coverage: windows tile the doc with positive overlap
    assert all(b < a + CHUNK_WINDOW for a, b in zip(starts, starts[1:]))

    assert len(short_chunks) == 1
    assert short_chunks[0]["start_tok"] == 0
    assert short_chunks[0]["chunk_len"] == short_n


def test_exact_stride_boundary_no_duplicate_chunk(spark):
    """n - window divisible by stride: the clamped tail coincides with
    the natural last start — exactly one chunk there, not two."""
    from bioio_spark.functions.text import (CHUNK_STRIDE, CHUNK_WINDOW,
                                            doc_chunks)

    n = CHUNK_WINDOW + 2 * CHUNK_STRIDE    # 32 + 48 = 80
    rows = [(1, " ".join(f"w{i}" for i in range(n)))]
    out = doc_chunks(_docs(spark, rows)).collect()
    starts = [r["start_tok"] for r in out]
    assert starts == [0, CHUNK_STRIDE, 2 * CHUNK_STRIDE]
    assert len(set(starts)) == len(starts)


def test_plan_in_row_no_shuffle_before_sort(spark, sf_dir):
    from bioio_spark.functions.text import doc_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (doc_chunks(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "Python" not in plan
    # only the presentation orderBy exchanges
    import re
    assert len(re.findall(r"Exchange (?!rangepartitioning)", plan)) == 0


def test_l29_rag_retrieval_surfaces_shared_vocabulary(spark, tmp_path):
    """Designed corpus: query doc 3 shares its vocabulary with doc 100
    (near-paraphrase) and shares nothing with doc 200 — the top-ranked
    chunk must come from doc 100 with a strictly higher integer score
    than any doc-200 chunk, and the query's own chunks are excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bioio_spark.queries import REGISTRY
    from bioio_spark.queries.llm import _L29_QUERY_DOCS

    assert 3 in _L29_QUERY_DOCS
    rows = [
        (3, "alpha beta gamma delta alpha beta"),
        (7, "epsilon zeta"),                      # other query docs
        (11, "eta theta"),
        (100, "alpha beta gamma alpha beta gamma"),   # paraphrase of 3
        (200, "iota kappa lambda mu nu xi"),          # unrelated
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int32()),
    }), str(tmp_path / "documents.parquet"))
    got = [r for r in REGISTRY["l29_rag_retrieval"].fn(
        spark, str(tmp_path)).collect() if r["query_doc_id"] == 3]
    assert got, "query 3 returned no rows"
    assert all(r["doc_id"] != 3 for r in got)     # self excluded
    assert got[0]["doc_id"] == 100                # paraphrase on top
    s100 = max(r["score"] for r in got if r["doc_id"] == 100)
    s200 = [r["score"] for r in got if r["doc_id"] == 200]
    assert all(s100 > s for s in s200)
