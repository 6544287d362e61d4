"""S10 streaming incremental dedup: exactly-once store semantics and
streaming == batch equivalence (oracle parity covers the hash gate)."""
import os
import shutil

import pyspark.sql.functions as F


def _flags(spark, sf_dir):
    from bioio_spark.queries.base import REGISTRY

    return [tuple(r) for r in
            REGISTRY["s10_stream_incremental_dedup"]
            .fn(spark, sf_dir).collect()]


def test_streaming_equals_batch(spark, sf_dir):
    """The stream-built band store must reproduce l2g's batch flags
    exactly — the gate semantics are order-independent by design."""
    from bioio_spark.functions.dedup import incremental_dedup

    batch = [tuple(r) for r in incremental_dedup(
        spark.read.parquet(f"{sf_dir}/documents.parquet")).collect()]
    assert _flags(spark, sf_dir) == batch


def test_replay_is_idempotent(spark, sf_dir):
    """A full replay (fresh checkpoint over the same files — the
    restart-after-lost-checkpoint case) rewrites every g-partition via
    dynamic partition overwrite and converges to the same store, byte
    content and flags alike."""
    from bioio_spark.queries.streaming_batch import (_s10_fixture_dir,
                                                     stream_band_index)

    delta_dir = _s10_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(delta_dir), "s10_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_band_index(spark, delta_dir, store)
    first = sorted(
        tuple(r) for r in
        spark.read.parquet(os.path.join(store, "bands")).collect())
    # lose the checkpoint, replay everything
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_band_index(spark, delta_dir, store)
    second = sorted(
        tuple(r) for r in
        spark.read.parquet(os.path.join(store, "bands")).collect())
    assert first == second
    shutil.rmtree(store, ignore_errors=True)


def test_fixture_covers_delta_exactly_once(spark, sf_dir):
    from bioio_spark.queries.streaming_batch import _s10_fixture_dir

    delta_dir = _s10_fixture_dir(spark, sf_dir)
    streamed = spark.read.parquet(delta_dir).select("doc_id")
    expected = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter(F.col("doc_id") % 10 == 0).select("doc_id"))
    assert (sorted(r["doc_id"] for r in streamed.collect())
            == sorted(r["doc_id"] for r in expected.collect()))


def test_s11_fingerprint_store_replay_idempotent(spark):
    """s11: losing the checkpoint and replaying every file converges to
    the same fingerprint store (per-file partitions, dynamic
    overwrite)."""
    from bioio_spark.queries.multimodal import (_s11_fixture_dir,
                                                stream_fingerprint_store)

    media_dir = _s11_fixture_dir()
    store = os.path.join(os.path.dirname(media_dir), "s11_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_fingerprint_store(spark, media_dir, store)
    first = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert len(first) == 22          # every image fingerprinted once
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_fingerprint_store(spark, media_dir, store)
    second = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert first == second
    shutil.rmtree(store, ignore_errors=True)


def test_s12_model_store_replay_idempotent_and_additive(spark, sf_dir):
    """s12: losing the checkpoint and replaying converges to the same
    tf store, and the SUM of the per-batch partials equals the one-pass
    corpus term frequencies exactly (the additivity that makes the
    incrementally-built global model == the batch model)."""
    from bioio_spark.functions.text import _words
    from bioio_spark.queries.streaming_batch import (_s12_fixture_dir,
                                                     stream_lm_model_store)

    docs_dir = _s12_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(docs_dir), "s12_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_lm_model_store(spark, docs_dir, store)
    tf_path = os.path.join(store, "tf")
    first = sorted(tuple(r) for r in
                   spark.read.parquet(tf_path).collect())
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_lm_model_store(spark, docs_dir, store)
    second = sorted(tuple(r) for r in
                    spark.read.parquet(tf_path).collect())
    assert first == second
    summed = sorted(
        tuple(r) for r in
        spark.read.parquet(tf_path).groupBy("word")
        .agg(F.sum("tf_part").alias("tf")).collect())
    batch = sorted(
        tuple(r) for r in
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("tf")).collect())
    assert summed == batch
    shutil.rmtree(store, ignore_errors=True)


def test_s13_cms_store_replay_idempotent_and_additive(spark, sf_dir):
    """s13: replay converges to the same CMS store, and the SUM of the
    per-batch cell partials equals the one-pass corpus sketch exactly
    (cell-wise additivity — sketch merging, the 100 TB frequency-summary
    maintenance path)."""
    from bioio_spark.functions.hashing import h32_col
    from bioio_spark.functions.text import _words
    from bioio_spark.queries.llm import _CMS_D, _CMS_W
    from bioio_spark.queries.streaming_batch import (_s12_fixture_dir,
                                                     stream_cms_store)

    docs_dir = _s12_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(docs_dir), "s13_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_cms_store(spark, docs_dir, store)
    cms_path = os.path.join(store, "cms")
    first = sorted(tuple(r) for r in
                   spark.read.parquet(cms_path).collect())
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_cms_store(spark, docs_dir, store)
    second = sorted(tuple(r) for r in
                    spark.read.parquet(cms_path).collect())
    assert first == second
    summed = sorted(
        tuple(r) for r in
        spark.read.parquet(cms_path).groupBy("d", "b")
        .agg(F.sum("cnt_part").alias("cnt")).collect())
    rows = F.explode(F.array(*[F.lit(d) for d in range(_CMS_D)]))
    batch = sorted(
        tuple(r) for r in
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(_words(F.col("text"))).alias("word"))
        .select("word", rows.alias("d"))
        .select("d", (h32_col(F.concat(F.lit("cms"),
                                       F.col("d").cast("string"),
                                       F.lit(":"), F.col("word")))
                      % _CMS_W).alias("b"))
        .groupBy("d", "b").agg(F.count(F.lit(1)).alias("cnt"))
        .collect())
    assert summed == batch
    shutil.rmtree(store, ignore_errors=True)


def test_s14_watermark_store_replay_idempotent(spark, sf_dir):
    """s14: losing the checkpoint and replaying the same arrival files
    converges to the same per-window accepted counts (update-mode
    emissions overwrite their own day-partitions; the drop set depends
    only on the batch sequence, which the fixture fixes)."""
    from bioio_spark.queries.streaming_batch import (_s14_fixture_dir,
                                                     stream_watermark_store)

    ev_dir = _s14_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(ev_dir), "s14_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_watermark_store(spark, ev_dir, store)
    first = sorted(
        tuple(r) for r in
        spark.read.parquet(os.path.join(store, "wins")).collect())
    assert first, "stream produced no windows"
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_watermark_store(spark, ev_dir, store)
    second = sorted(
        tuple(r) for r in
        spark.read.parquet(os.path.join(store, "wins")).collect())
    assert first == second
    shutil.rmtree(store, ignore_errors=True)


def test_s14_engine_drops_match_model(spark, sf_dir):
    """The gauge's core claim: the engine accepted exactly
    n_ontime + n_late_accepted per window, and the fixture actually
    exercises all three buckets."""
    from bioio_spark.queries import REGISTRY

    rows = (REGISTRY["s14_stream_watermark_gauge"]
            .fn(spark, sf_dir).collect())
    assert sum(r["n_dropped"] for r in rows) > 0
    assert sum(r["n_late_accepted"] for r in rows) > 0
    for r in rows:
        assert (r["n_accepted_engine"]
                == r["n_ontime"] + r["n_late_accepted"]), r


def test_s15_codes_store_replay_idempotent(spark, sf_dir):
    """s15: losing the checkpoint and replaying every embedding file
    converges to the same codes store (frozen index, per-group dynamic
    overwrite) — the compressed ANN index is rebuild-safe."""
    from bioio_spark.functions.similarity import (_to_double,
                                                  _train_ivf,
                                                  _train_rpq)
    from bioio_spark.queries.streaming_batch import (
        _s15_fixture_dir, stream_ann_codes_store)
    import pyspark.sql.functions as F

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "label",
                   _to_double(F.col("embedding")).alias("e")))
    cents = _train_ivf(emb, 8, 4, cache_key=None)
    books = _train_rpq(emb, cents, cache_key=None)
    emb_dir = _s15_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(emb_dir), "s15_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_ann_codes_store(spark, emb_dir, store, cents, books)
    first = sorted(tuple(r) for r in
                   spark.read.parquet(os.path.join(store, "codes"))
                   .collect())
    assert len(first) == emb.count()     # every vector encoded once
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_ann_codes_store(spark, emb_dir, store, cents, books)
    second = sorted(tuple(r) for r in
                    spark.read.parquet(os.path.join(store, "codes"))
                    .collect())
    assert first == second
    shutil.rmtree(store, ignore_errors=True)


def test_s14_two_watermark_semantics_pin(spark, sf_dir):
    """THE engine-behavior find the gauge rests on (SPARK-24634 line):
    the late-event FILTER uses the PREVIOUS batch's watermark (lag-2
    prefix max over arrival batches), not the current one (lag-1).
    Pin that the distinction is OBSERVABLE on the fixture: the lag-1
    model predicts strictly more drops than the lag-2 model that
    hash-matches the engine — if the two ever coincide here, the gauge
    stops gauging anything and the fixture must be re-shaped."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bioio_spark.queries.streaming_batch import (
        _S14_DELAY_MS, _S14_WIN_US, _s14_arrival_batch_col,
        _s14_fixture_dir)

    ev_dir = _s14_fixture_dir(spark, sf_dir)
    rows = (spark.read.parquet(ev_dir)
            .select(_s14_arrival_batch_col().alias("g"),
                    F.unix_micros("ts").alias("tus")))
    bmax = rows.groupBy("g").agg(F.max("tus").alias("bmax"))
    pm = (bmax
          .withColumn("pmax", F.max("bmax").over(
              W.orderBy("g").rowsBetween(W.unboundedPreceding, -1)))
          .withColumn("lmax", F.max("bmax").over(
              W.orderBy("g").rowsBetween(W.unboundedPreceding, -2))))

    def n_drops(src_col):
        wm = (F.floor(F.col(src_col) / 1000) - _S14_DELAY_MS) * 1000
        ws = F.floor(F.col("tus") / _S14_WIN_US) * _S14_WIN_US
        return (rows.join(F.broadcast(pm.select("g", "pmax", "lmax")),
                          "g")
                .filter(F.col(src_col).isNotNull()
                        & (ws + _S14_WIN_US <= wm))
                .count())

    lag1, lag2 = n_drops("pmax"), n_drops("lmax")
    assert lag2 > 0, "fixture produces no drops at all"
    assert lag1 > lag2, (
        f"lag-1 ({lag1}) vs lag-2 ({lag2}) indistinguishable — the "
        f"two-watermark pin is dead on this fixture")


def test_s16_pairs_store_replay_idempotent(spark, sf_dir):
    """s16: losing the checkpoint and replaying the same arrival files
    converges to the same pair store (per-batch dynamic partition
    overwrite; batch ids are deterministic under availableNow replay
    from scratch, so every partition rewrites to identical content)."""
    import os
    import shutil

    from bioio_spark.queries.streaming_batch import (
        _s16_fixture_dir, stream_join_pairs_store)

    ev_dir = _s16_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(ev_dir), "s16_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_join_pairs_store(spark, ev_dir, store)
    first = sorted(
        (r["purchase_id"], r["click_id"], r["g"]) for r in
        spark.read.parquet(os.path.join(store, "pairs")).collect())
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_join_pairs_store(spark, ev_dir, store)
    second = sorted(
        (r["purchase_id"], r["click_id"], r["g"]) for r in
        spark.read.parquet(os.path.join(store, "pairs")).collect())
    assert first == second and len(first) > 0
    shutil.rmtree(store, ignore_errors=True)


def test_s16_engine_state_and_pairs_match_model(spark, sf_dir):
    """The gauge's core claims, as assertions: engine pair counts and
    per-batch state metrics equal the closed-form model on every row,
    and the fixture actually loses pairs (the watermark does real
    work) while keeping final state bounded far below the input."""
    from bioio_spark.queries import REGISTRY

    rows = (REGISTRY["s16_stream_join_state_gauge"]
            .fn(spark, sf_dir).collect())
    assert len(rows) >= 4
    for r in rows:
        assert r["n_pairs_engine"] == r["n_pairs_model"], r
        assert r["state_rows_engine"] == r["state_rows_model"], r
        assert r["state_removed_engine"] == r["state_removed_model"], r
    assert sum(r["n_lost_model"] for r in rows) > 0
    assert sum(r["n_pairs_model"] for r in rows) > 0
    # state is EVICTED, not accumulated: the final batch holds less
    # than half of what passed through
    assert rows[-1]["state_rows_model"] < max(
        r["state_rows_model"] for r in rows) / 2


def test_s17_session_store_replay_idempotent(spark, sf_dir):
    """s17: checkpoint loss + full replay converges to the same
    finalized-session store (append emissions are immutable and batch
    ids deterministic, so per-batch overwrite rewrites identical
    content)."""
    import os
    import shutil

    from bioio_spark.queries.streaming_batch import (
        _s17_fixture_dir, stream_session_store)

    ev_dir = _s17_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(ev_dir), "s17_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_session_store(spark, ev_dir, store)
    first = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["g"])
        for r in spark.read.parquet(
            os.path.join(store, "sessions")).collect())
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_session_store(spark, ev_dir, store)
    second = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["g"])
        for r in spark.read.parquet(
            os.path.join(store, "sessions")).collect())
    assert first == second and len(first) > 0
    shutil.rmtree(store, ignore_errors=True)


def test_s17_pending_sessions_are_the_append_mode_cost(spark, sf_dir):
    """Append mode never emits a session the watermark hasn't sealed:
    the fixture must leave a nonzero pending tail (sessions within
    watermark-delay of the stream end), and every EMITTED session's
    end must be at or below the final watermark — the budget line a
    production append-mode sessionizer plans around."""
    from pyspark.sql import functions as F

    from bioio_spark.queries import REGISTRY
    from bioio_spark.queries.base import load
    from bioio_spark.queries.streaming_batch import _S14_DELAY_MS

    emitted = (REGISTRY["s17_stream_session_emit"]
               .fn(spark, sf_dir).collect())
    assert len(emitted) > 0
    ev = load(spark, sf_dir, "events")
    max_ms = (ev.agg(F.max(F.unix_micros("ts")).alias("m"))
              .collect()[0]["m"])
    final_wm = (max_ms // 1000) * 1000 - _S14_DELAY_MS * 1000
    for r in emitted:
        import calendar
        se = int(r["session_end"].timestamp() * 1e6)
        assert se <= final_wm, r
    # total sessions over ALL events (no drops) exceeds the emitted
    # count: the pending tail is real
    from bioio_spark.queries.streaming_batch import _E3_GAP_MIN
    n_total = (REGISTRY["e3_sessionization"].fn(spark, sf_dir).count())
    assert n_total > len(emitted)


def test_s18_hll_store_replay_idempotent(spark, sf_dir):
    """s18: register-max merging is idempotent, so replaying every
    file after checkpoint loss converges to the identical sketch —
    and so does the estimate."""
    import os
    import shutil

    from bioio_spark.queries.streaming_batch import (_s12_fixture_dir,
                                                     stream_hll_store)
    from pyspark.sql import functions as F

    docs_dir = _s12_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(docs_dir), "s18_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_hll_store(spark, docs_dir, store)
    first = sorted(
        (r["bucket"], r["mj"]) for r in
        spark.read.parquet(os.path.join(store, "regs"))
        .groupBy("bucket").agg(F.max("mj_part").alias("mj")).collect())
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_hll_store(spark, docs_dir, store)
    second = sorted(
        (r["bucket"], r["mj"]) for r in
        spark.read.parquet(os.path.join(store, "regs"))
        .groupBy("bucket").agg(F.max("mj_part").alias("mj")).collect())
    assert first == second and len(first) > 0
    shutil.rmtree(store, ignore_errors=True)


def test_s19_id_only_dedup_state_never_evicts(spark, sf_dir):
    """THE production hazard s19 exists to expose: dropDuplicates on
    the id ALONE — watermark upstream or not — never evicts a key
    (Spark only bounds dedup state when the event-time column is part
    of the dedup key). State must grow monotonically to the full
    corpus and numRowsRemoved stay 0 in every batch."""
    import os
    import shutil

    from bioio_spark.queries.base import load
    from bioio_spark.queries.streaming_batch import (_s19_fixture_dir,
                                                     stream_dedup_store)

    ev_dir = _s19_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(ev_dir), "s19_idonly_test")
    shutil.rmtree(store, ignore_errors=True)
    metrics = stream_dedup_store(spark, ev_dir, store,
                                 keys=("event_id",))
    n_events = load(spark, sf_dir, "events").count()
    totals = [t for _g, t, _r in metrics]
    removed = [r for _g, _t, r in metrics]
    assert removed == [0] * len(removed), metrics
    assert totals == sorted(totals), metrics        # monotone growth
    assert totals[-1] == n_events, metrics          # full corpus held
    shutil.rmtree(store, ignore_errors=True)


def test_s19_dedup_store_replay_idempotent(spark, sf_dir):
    """s19: checkpoint loss + replay converges to the same emitted
    store (first-seen emissions are deterministic given the arrival
    order the fixture fixes)."""
    import os
    import shutil

    from bioio_spark.queries.streaming_batch import (_s19_fixture_dir,
                                                     stream_dedup_store)

    ev_dir = _s19_fixture_dir(spark, sf_dir)
    store = os.path.join(os.path.dirname(ev_dir), "s19_replay_test")
    shutil.rmtree(store, ignore_errors=True)
    stream_dedup_store(spark, ev_dir, store)
    first = sorted(
        (r["event_id"], r["g"]) for r in
        spark.read.parquet(os.path.join(store, "emitted")).collect())
    shutil.rmtree(os.path.join(store, "_ckpt"))
    stream_dedup_store(spark, ev_dir, store)
    second = sorted(
        (r["event_id"], r["g"]) for r in
        spark.read.parquet(os.path.join(store, "emitted")).collect())
    assert first == second and len(first) > 0
    shutil.rmtree(store, ignore_errors=True)
