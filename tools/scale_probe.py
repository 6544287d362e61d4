"""10x scale probe for the dedup family (SCALING.md evidence).

Builds a one-off sf1-equivalent fixture (10x the sf0.1 documents and
embeddings) under .scratch/sf1 and times the headline dedup operators at
sf0.1 vs sf1, printing the wall-clock ratios the SCALING.md table
records. The replicas are made STATISTICALLY INDEPENDENT of each other
(every word suffixed with the replica id -> zero shared shingles across
replicas; embeddings coordinate-rolled per replica), so the theoretical
scaling is the operator's own complexity in corpus size, not an
artifact of 10 literal copies flooding the same buckets.

Usage:  python tools/scale_probe.py [--runs 2]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch")
DST = os.path.join(_SCRATCH, "sf1")      # 10x sf0.1
DST100 = os.path.join(_SCRATCH, "sf10")  # 100x sf0.1
DSTS10 = os.path.join(_SCRATCH, "sfs10")  # 10x events (stream gauges)


def build_fixture(replicas: int = 10, dst: str = DST) -> str:
    done = os.path.join(dst, "_FIXTURE_DONE")
    if os.path.isfile(done):
        return dst
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    d = docs.to_pydict()
    out = {k: [] for k in d}
    for k in range(replicas):
        for i in range(len(d["doc_id"])):
            if k == 0:
                text = d["text"][i]
            else:
                text = re.sub(r"(\S+)", rf"\g<1>_{k}", d["text"][i])
            out["doc_id"].append(d["doc_id"][i] + k * 10_000_000)
            out["text"].append(text)
            out["lang"].append(d["lang"][i])
            out["source"].append(d["source"][i])
            out["n_chars"].append(len(text))
    pq.write_table(pa.table(out, schema=docs.schema),
                   os.path.join(dst, "documents.parquet"))

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    e = emb.to_pydict()
    vecs = np.asarray([list(v) for v in e["embedding"]], dtype=np.float32)
    ids, arrs, labels = [], [], []
    for k in range(replicas):
        ids.extend(i + k * 1_000_000 for i in e["vec_id"])
        # roll has period dim/gcd(7,dim)=64: negate past one full cycle
        # so replicas 64..99 are NOT byte-copies of replicas 0..35
        sign = 1.0 if k < 64 else -1.0
        arrs.append(np.roll(vecs * sign, (k * 7) % 64, axis=1))
        labels.extend(e["label"])
    allv = np.concatenate(arrs, axis=0)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([row for row in allv.tolist()],
                                        pa.list_(pa.float32())),
                  "label": pa.array(labels, emb.schema.field("label").type)}),
        os.path.join(dst, "embeddings.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return dst


def build_graph_fixture(replicas: int, dst: str) -> str:
    """Add lineitem (l_orderkey, l_partkey, l_suppkey + the l30 value
    columns l_linenumber, l_extendedprice) and orders (o_orderkey,
    o_custkey) replicas to a scale dir. Every key is offset by
    replica * 10^7, so replicas are DISJOINT subgraphs — total graph
    work should scale linearly in corpus size (same density, x10 more
    data), which is exactly the claim the graph probes measure. 10^7
    stride keeps 100 replicas of customer ids below g2's +10^9
    supplier-node offset (no src/dst collision). Prices get a
    +replica-cent shift so replica value sets are not byte-copies
    (the sketch probe's independence discipline)."""
    done = os.path.join(dst, "_FIXTURE_G2_DONE")
    if os.path.isfile(done):
        return dst
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    off = 10_000_000

    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"),
                       columns=["l_orderkey", "l_partkey", "l_suppkey",
                                "l_linenumber", "l_extendedprice"])
    cols = {c: li.column(c).to_numpy().astype(np.int64) for c in
            ("l_orderkey", "l_partkey", "l_suppkey")}
    shifts = np.repeat(np.arange(replicas, dtype=np.int64) * off,
                       len(li))
    cent_shifts = np.repeat(
        np.arange(replicas, dtype=np.float64) * 0.01, len(li))
    out = {c: pa.array(np.tile(v, replicas) + shifts, pa.int64())
           for c, v in cols.items()}
    out["l_linenumber"] = pa.array(
        np.tile(li.column("l_linenumber").to_numpy(), replicas),
        li.schema.field("l_linenumber").type)
    out["l_extendedprice"] = pa.array(
        np.tile(li.column("l_extendedprice").to_numpy(), replicas)
        + cent_shifts, pa.float64())
    pq.write_table(pa.table(out), os.path.join(dst, "lineitem.parquet"))

    od = pq.read_table(os.path.join(SRC, "orders.parquet"),
                       columns=["o_orderkey", "o_custkey"])
    ocols = {c: od.column(c).to_numpy().astype(np.int64) for c in
             ("o_orderkey", "o_custkey")}
    oshifts = np.repeat(np.arange(replicas, dtype=np.int64) * off,
                        len(od))
    pq.write_table(pa.table({
        c: pa.array(np.tile(v, replicas) + oshifts, pa.int64())
        for c, v in ocols.items()}),
        os.path.join(dst, "orders.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return dst


def build_stream_fixture(replicas: int, dst: str) -> str:
    """10x-arrival events fixture for the streaming state gauges:
    replicas offset event_id AND user_id by k * 10^9 but keep the TIME
    AXIS unchanged, so the same watermark trajectory carries 10x the
    per-batch arrival density — exactly the axis the state-capacity
    formula rows/s x (delay + band) predicts along. Replicas share no
    user (no cross-replica join pairs) and no event_id (independent
    late/dup hashes)."""
    done = os.path.join(dst, "_FIXTURE_S_DONE")
    if os.path.isfile(done):
        return dst
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    off = 1_000_000_000
    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = ev.num_rows
    shifts = np.repeat(np.arange(replicas, dtype=np.int64) * off, n)
    cols = {}
    for name in ev.schema.names:
        col = ev.column(name)
        if name in ("event_id", "user_id"):
            cols[name] = pa.array(
                np.tile(col.to_numpy().astype(np.int64), replicas)
                + shifts, pa.int64())
        else:
            cols[name] = pa.chunked_array(
                [c for _ in range(replicas) for c in col.chunks])
    pq.write_table(pa.table(cols, schema=ev.schema),
                   os.path.join(dst, "events.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return dst


def build_clustered_fixture(n_vectors: int, dst: str,
                            n_clusters: int = 256,
                            dim: int = 64) -> str:
    """Cluster-STRUCTURED embeddings (deterministic): center_c drawn
    from a per-cluster seeded normal, members = center + 0.25-sigma
    jitter. The testdata embeddings are near-isotropic (the l26
    finding), which bounds any IVF's recall by probe geometry; this
    fixture measures what the index delivers when the data has the
    structure production embeddings actually have (points concentrate
    near cluster centers). vec_ids are assigned round-robin across
    clusters so the seed rows 0..nlist-1 span distinct clusters."""
    done = os.path.join(dst, "_FIXTURE_DONE")
    if os.path.isfile(done):
        return dst
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(1234)
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    cid = np.arange(n_vectors, dtype=np.int64) % n_clusters
    jit = np.random.default_rng(5678).normal(
        scale=0.25, size=(n_vectors, dim)).astype(np.float32)
    vecs = centers[cid] + jit
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_vectors, dtype=np.int64)),
        "embedding": pa.array([row for row in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(cid, pa.int64()),
    }), os.path.join(dst, "embeddings.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--family",
                    choices=("all", "dedup", "ann", "ann-scaled",
                             "ann-clustered", "graph", "stream",
                             "sketch", "late"),
                    default="all",
                    help="which probe family to run (ann added r12; "
                         "ann-scaled + ann-clustered + graph + stream "
                         "+ sketch + late added r13)")
    args = ap.parse_args()

    build_fixture(10, DST)
    build_fixture(100, DST100)
    if args.family in ("all", "graph", "sketch", "late"):
        build_graph_fixture(10, DST)
        build_graph_fixture(100, DST100)
    if args.family in ("all", "stream"):
        build_stream_fixture(10, DSTS10)
    if args.family in ("all", "late"):
        # events replicas into the scale dirs themselves so reg()
        # probes can load(sf_dir, "events") at 10x/100x
        build_stream_fixture(10, DST)
        build_stream_fixture(100, DST100)

    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from bioio_spark.functions.clusters import dedup_clusters
    from bioio_spark.functions.multimodal import (_MAGIC, MEDIA_SCHEMA,
                                                  image_near_dups)
    from bioio_spark.functions.similarity import semantic_dedup
    from bioio_spark.queries import REGISTRY
    from bioio_spark.queries.base import load
    from bioio_spark.session import get_session

    spark = get_session()

    def sink(df):
        # bench.py's noop sink: forces FULL materialization of every
        # column (count() lets Catalyst prune left-join flag columns —
        # observed: l2g flat-lined at 100x data under count())
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        best = None
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    def reg(name, sf_dir):
        return lambda: sink(REGISTRY[name].fn(spark, sf_dir))

    def l12_cold(sf_dir):
        # cache_key=None: retrain per run, so BOTH scales pay their own
        # training (the registry's session cache would otherwise make the
        # second timed run measure only the persisted assignment readback)
        return lambda: sink(semantic_dedup(
            load(spark, sf_dir, "embeddings"), cache_key=None))

    def _media(n):
        """n INDEPENDENT random images (rng seeded per id) with a 10%
        exact-dup rate (id % 10 == 0 copies id+1) — linear dup structure,
        so the theoretical scaling is the fingerprint+banding cost, not
        the degenerate self-similar tail of the closed-form synth_media
        content (which at thousands of ids chains into deep clusters —
        the capped-bucket case the unit tests pin separately)."""
        header = struct.pack("<iii", 16, 12, 1)
        rows = []
        for i in range(n):
            seed = i + 1 if (i % 10 == 0 and i + 1 < n) else i
            img = np.random.default_rng(seed).integers(
                0, 251, size=(12, 16)).astype(np.uint8)
            rows.append((i, "image", _MAGIC + header + img.tobytes(),
                         (16, 12, 1, 0, "fkc1")))
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def media_neardup(n):
        def run():
            sink(image_near_dups(_media(n)))
        return run

    def media_pipeline(n):
        def run():
            pairs = image_near_dups(_media(n))
            sink(dedup_clusters(pairs.select(
                F.col("media_id_a").alias("doc_a"),
                F.col("media_id_b").alias("doc_b"))))
        return run

    # ---- ANN family (round 12): the l3i/l3k tier was the only major
    # 100 TB claim still argument-only. Three measurements per scale:
    # cold index BUILD (train coarse + residual codebooks, then encode
    # the full corpus — the ingest pipeline, cache_key=None so every
    # scale pays its own training), WARM SEARCH over a persisted codes
    # table (the steady-state query path — setup untimed), and recall
    # drift (reported separately; recall is a count, not a wall time).
    from bioio_spark.functions.similarity import (IVF_SAMPLE_MOD,
                                                  N_CENTROIDS,
                                                  _rpq_codes_frame,
                                                  _to_double,
                                                  _train_ivf,
                                                  _train_rpq,
                                                  rpq_encode,
                                                  rpq_query_luts,
                                                  rpq_search)

    def _emb(sf_dir):
        return (load(spark, sf_dir, "embeddings")
                .select("vec_id", "label",
                        _to_double(F.col("embedding")).alias("e")))

    def ann_build_cold(sf_dir):
        def run():
            emb = _emb(sf_dir)
            cents = _train_ivf(emb, N_CENTROIDS, IVF_SAMPLE_MOD,
                               cache_key=None)
            books = _train_rpq(emb, cents, cache_key=None)
            sink(rpq_encode(emb, cents, books))
        return run

    def ann_search_warm(sf_dir):
        # untimed setup: session-cached training + persisted codes
        emb = _emb(sf_dir)
        cents = _train_ivf(emb, N_CENTROIDS, IVF_SAMPLE_MOD,
                           cache_key=sf_dir)
        books = _train_rpq(emb, cents, cache_key=sf_dir)
        coded = _rpq_codes_frame(emb, cents, books, cache_key=sf_dir)
        coded.count()        # materialize the persist before timing
        q = [float(v) for v in emb.filter(F.col("vec_id") == 2)
             .select("e").collect()[0]["e"]]
        probe_ids, luts = rpq_query_luts(q, cents, books)

        def run():
            sink(rpq_search(coded, luts, probe_ids, 2, 10))
        return run

    dedup_probes = [
        ("l2_minhash_lsh", reg("l2_minhash_lsh", SRC),
         reg("l2_minhash_lsh", DST), reg("l2_minhash_lsh", DST100)),
        ("l2g_incremental_dedup", reg("l2g_incremental_dedup", SRC),
         reg("l2g_incremental_dedup", DST),
         reg("l2g_incremental_dedup", DST100)),
        ("l12_semantic_dedup(cold)", l12_cold(SRC), l12_cold(DST),
         l12_cold(DST100)),
        ("mm_ahash_neardup(n=2k/20k/200k)", media_neardup(2000),
         media_neardup(20000), media_neardup(200000)),
        ("mm_dedup_pipeline(n=2k/20k/200k)", media_pipeline(2000),
         media_pipeline(20000), media_pipeline(200000)),
    ]
    ann_probes = [
        ("l3k_codes_build(cold)", ann_build_cold(SRC),
         ann_build_cold(DST), ann_build_cold(DST100)),
        ("l3k_warm_search", ann_search_warm(SRC),
         ann_search_warm(DST), ann_search_warm(DST100)),
    ]
    # ---- graph family (round 13): g2/g3/g4 were the last major
    # family argument-only at 10x/100x. Replicas are DISJOINT
    # subgraphs (offset keys), so the theoretical scaling is linear;
    # anything superlinear would expose a wedge/shuffle blowup.
    graph_probes = [
        (name, reg(name, SRC), reg(name, DST), reg(name, DST100))
        for name in ("g2_pagerank", "g3_triangle_count",
                     "g4_label_propagation", "g4b_lpa_convergence")
    ]
    # ---- sketch family (round 13): the mergeable-summary tier. All
    # three are bounded-output partial aggregates (CMS cells, HLL
    # registers, bottom-k rows), so wall should track the scan and
    # nothing should go superlinear; l30's ACCURACY claim (error is
    # sample-size-bound, corpus-size-free) is reported separately.
    def l30_sample_arm(sf_dir):
        # the SHIPPABLE path alone: bottom-k sample of the corpus (one
        # TakeOrderedAndProject). The full l30 gauge also carries its
        # exact-rank ground-truth bracket, whose distinct-value
        # cumulative window grows with the value domain — charge the
        # two separately so the sketch's own scaling is visible.
        from bioio_spark.queries.llm import _BK_K, _bk_sample, _bk_vals

        def run():
            sink(_bk_sample(_bk_vals(load(spark, sf_dir, "lineitem")),
                            _BK_K))
        return run

    sketch_probes = [
        (name, reg(name, SRC), reg(name, DST), reg(name, DST100))
        for name in ("l21_cms_heavy_hitters", "l24_hll_distinct",
                     "l30_bottomk_quantiles")
    ] + [
        ("l30_sample_arm_only", l30_sample_arm(SRC),
         l30_sample_arm(DST), l30_sample_arm(DST100)),
    ]
    # ---- late round-13 ops (l31/e5/e6/g6/a38): documents replicas
    # serve l31, lineitem replicas serve g6, events replicas (time
    # axis unchanged, 10x/100x density) serve e5/e6/a38 — for e5/e6
    # the grid is |types| x |hours| = CONSTANT across scales, so wall
    # should track the scan while output stays fixed (the
    # dimension-bounded-output claim, measured).
    late_probes = [
        (name, reg(name, SRC), reg(name, DST), reg(name, DST100))
        for name in ("l31_fuzzy_blocked_join", "e5_dense_resample",
                     "e6_grid_anomalies", "g6_link_prediction",
                     "a38_scd2_intervals")
    ]
    probes = {"all": (dedup_probes + ann_probes + graph_probes
                      + sketch_probes + late_probes),
              "dedup": dedup_probes,
              "ann": ann_probes,
              "ann-scaled": [],
              "ann-clustered": [],
              "stream": [],
              "sketch": sketch_probes,
              "late": late_probes,
              "graph": graph_probes}[args.family]
    print(f"{'probe':34s} {'sf0.1':>8s} {'10x':>8s} {'100x':>8s}"
          f" {'r10':>6s} {'r100':>7s}")
    for name, small, big, huge in probes:
        ts = timed(small)
        tb = timed(big)
        th = timed(huge)
        print(f"{name:34s} {ts:8.2f} {tb:8.2f} {th:8.2f}"
              f" {tb / ts:6.2f} {th / ts:7.2f}", flush=True)

    if args.family in ("all", "ann"):
        # recall drift across corpus scale: a count, not a wall time —
        # reported alongside so SCALING.md can record whether the
        # banded/probed index LOSES neighbors as the corpus grows
        from bioio_spark.functions.similarity import rpq_vs_raw_recall
        for tag, d in (("sf0.1", SRC), ("10x", DST), ("100x", DST100)):
            [row] = rpq_vs_raw_recall(
                load(spark, d, "embeddings"), query_vec_id=2,
                cache_key=d).collect()
            print(f"recall@{row['k']} {tag:6s} raw={row['n_common_raw']}"
                  f" res={row['n_common_res']}", flush=True)

    if args.family in ("all", "ann-scaled"):
        # ---- CORPUS-SCALED index parameters (round 13): the r12 probe
        # honestly recorded that recall at FIXED nlist=8 / 3-bit codes
        # collapses at 100x — the expected behavior of fixed params,
        # not of the architecture (Jegou et al. 2011 §V scale their
        # index with the corpus). The scaled arm grows nlist ~ 8*sqrt(
        # scale), keeps the probe FRACTION constant (probe/nlist ~
        # 1/4), grows code bits 3 -> 6 (the r13 sweep found codebook
        # RESOLUTION, not subspace count, is the binding constraint:
        # m=8/ks=64 beats m=16/ks=16 at equal 10x corpus), and bounds
        # the training sample (sample_mod grows with corpus — the
        # production "train on a fixed-size sample" policy).
        #
        # Methodology fix over r12: recall is averaged over EIGHT
        # queries (80 neighbor trials), not one (10 trials) — the r12
        # single-query figures move by +-2 hits on reruns, which is
        # binomial noise, not signal. Training/codes are session-cached
        # per (scale, params), so extra queries cost only their own
        # LUT rankings + one brute-force truth pass each.
        from bioio_spark.functions.similarity import rpq_vs_raw_recall
        qids = (2, 5, 9, 13, 21, 34, 55, 89)
        arms = (
            ("fixed", (("sf0.1", SRC, 8, 2, 8, 4),
                       ("10x", DST, 8, 2, 8, 4),
                       ("100x", DST100, 8, 2, 8, 4))),
            ("scaled", (("sf0.1", SRC, 8, 2, 8, 4),
                        ("10x", DST, 25, 6, 64, 16),
                        ("100x", DST100, 80, 20, 64, 64))),
        )
        for arm, rows_cfg in arms:
            for tag, d, nc, npb, ks, mod in rows_cfg:
                t0 = time.monotonic()
                raw = res = 0
                for qid in qids:
                    [row] = rpq_vs_raw_recall(
                        load(spark, d, "embeddings"), query_vec_id=qid,
                        n_centroids=nc, n_probe=npb, ks=ks,
                        sample_mod=mod,
                        cache_key=f"{d}:{arm}").collect()
                    raw += int(row["n_common_raw"])
                    res += int(row["n_common_res"])
                dt = time.monotonic() - t0
                n = len(qids) * 10
                print(f"{arm:6s} recall@10 {tag:6s} nlist={nc:<3d}"
                      f" probe={npb:<3d} ks={ks:<3d}"
                      f" raw={raw}/{n} res={res}/{n}"
                      f" ({dt:.1f}s)", flush=True)

    if args.family in ("all", "ann-clustered"):
        # ---- structured-data recall (round 13): same protocol as
        # ann-scaled (8 queries, fixed vs scaled arms) over the
        # clustered fixture — the absolute recall level the index
        # delivers when the corpus has cluster structure, vs the
        # isotropic testdata where recall is probe-geometry-bounded.
        from bioio_spark.functions.similarity import rpq_vs_raw_recall
        c1 = build_clustered_fixture(60_000, os.path.join(
            _SCRATCH, "sfc1"))
        c10 = build_clustered_fixture(600_000, os.path.join(
            _SCRATCH, "sfc10"))
        qids = (2, 5, 9, 13, 21, 34, 55, 89)
        rows_cfg = (
            ("fixed", "60k", c1, 8, 2, 8, 4),
            ("fixed", "600k", c10, 8, 2, 8, 4),
            ("scaled", "600k", c10, 25, 6, 64, 16),
        )
        for arm, tag, d, nc, npb, ks, mod in rows_cfg:
            t0 = time.monotonic()
            raw = res = 0
            for qid in qids:
                [row] = rpq_vs_raw_recall(
                    load(spark, d, "embeddings"), query_vec_id=qid,
                    n_centroids=nc, n_probe=npb, ks=ks,
                    sample_mod=mod,
                    cache_key=f"{d}:{arm}").collect()
                raw += int(row["n_common_raw"])
                res += int(row["n_common_res"])
            dt = time.monotonic() - t0
            n = len(qids) * 10
            print(f"clustered {arm:6s} recall@10 {tag:5s}"
                  f" nlist={nc:<3d} probe={npb:<3d} ks={ks:<3d}"
                  f" raw={raw}/{n} res={res}/{n} ({dt:.1f}s)",
                  flush=True)

        # the refine stage over the same fixtures (SCALING.md's
        # second clustered table): ivf_adc_recall's shortlist=50
        # exact-rerank arm at defaults — rerank recall is
        # shortlist-fraction-bounded (~ k*shortlist/cell_width)
        from bioio_spark.functions.similarity import ivf_adc_recall
        for tag, d in (("60k", c1), ("600k", c10)):
            t0 = time.monotonic()
            adc = rr = 0
            for qid in qids:
                [row] = ivf_adc_recall(
                    load(spark, d, "embeddings"), query_vec_id=qid,
                    cache_key=f"rerank:{d}").collect()
                adc += int(row["n_common_adc"])
                rr += int(row["n_common_rerank"])
            dt = time.monotonic() - t0
            n = len(qids) * 10
            print(f"clustered rerank   recall@10 {tag:5s}"
                  f" defaults(shortlist=50)"
                  f" adc={adc}/{n} rerank={rr}/{n} ({dt:.1f}s)",
                  flush=True)

    if args.family in ("all", "sketch"):
        # ---- l30 accuracy flatness: bottom-k quantile error is a
        # property of k (binomial envelope ~ sqrt(q(1-q)/k) mapped
        # through the local density), NOT of corpus size — the reason
        # the sketch is shippable at 100 TB. Report err_permille per
        # quantile at each scale; expect same-order values, no growth
        # trend with n.
        for tag, d in (("sf0.1", SRC), ("10x", DST), ("100x", DST100)):
            t0 = time.monotonic()
            rows = REGISTRY["l30_bottomk_quantiles"].fn(
                spark, d).collect()
            errs = {int(r["q_permille"]): int(r["err_permille"])
                    for r in rows}
            print(f"l30 err_permille {tag:6s} {errs}"
                  f" ({time.monotonic() - t0:.1f}s)", flush=True)
        # ---- s21 state bound at 10x arrivals: per-batch partials are
        # k rows regardless of volume — the store must hold at most
        # n_batches * k rows however large the corpus grows.
        import glob as _glob

        from bioio_spark.queries.streaming_batch import (
            _S21_GROUPS, _s21_fixture_dir, stream_bottomk_store)
        rows_dir = _s21_fixture_dir(spark, DST)
        store = os.path.join(os.path.dirname(rows_dir),
                             "s21_probe_store")
        import shutil

        from bioio_spark.queries.llm import _BK_K
        shutil.rmtree(store, ignore_errors=True)
        t0 = time.monotonic()
        stream_bottomk_store(spark, rows_dir, store)
        dt = time.monotonic() - t0
        n_part = spark.read.parquet(
            os.path.join(store, "partials")).count()
        n_corpus = spark.read.parquet(rows_dir).count()
        print(f"s21 partial-state rows @10x: {n_part}"
              f" (bound {_S21_GROUPS * _BK_K}; corpus {n_corpus};"
              f" stream wall {dt:.1f}s)", flush=True)
        shutil.rmtree(store, ignore_errors=True)

    if args.family in ("all", "stream"):
        # ---- streaming state capacity at 10x arrivals (round 13):
        # s16/s19 reconcile engine state rows with closed-form models
        # at fixture scale; here the SAME gauges run over a fixture
        # with 10x the per-batch arrival density on an unchanged time
        # axis. Expect: model == engine still (zero mismatches), peak
        # state rows ~10x (the rows/s term of rows/s x (delay + band)),
        # wall growing ~linearly.
        gauges = (
            ("s16_stream_join_state_gauge",
             (("n_pairs_model", "n_pairs_engine"),
              ("state_rows_model", "state_rows_engine"),
              ("state_removed_model", "state_removed_engine"))),
            ("s19_stream_dedup_state_gauge",
             (("n_emitted_model", "n_emitted_engine"),
              ("state_rows_model", "state_rows_engine"),
              ("state_removed_model", "state_removed_engine"))),
        )
        for name, pairs_cols in gauges:
            res = {}
            for tag, d in (("sf0.1", SRC), ("10x", DSTS10)):
                t0 = time.monotonic()
                rows = REGISTRY[name].fn(spark, d).collect()
                dt = time.monotonic() - t0
                mism = sum(1 for r in rows for a, b in pairs_cols
                           if r[a] != r[b])
                peak = max(r["state_rows_engine"] for r in rows)
                res[tag] = (dt, peak)
                print(f"{name:32s} {tag:6s} wall={dt:7.2f}s"
                      f" peak_state={peak:8d} mismatches={mism}",
                      flush=True)
            print(f"{name:32s} ratio  wall={res['10x'][0] / res['sf0.1'][0]:.2f}x"
                  f" state={res['10x'][1] / max(1, res['sf0.1'][1]):.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
