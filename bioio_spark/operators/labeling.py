"""Mask connected-component labeling — ONE API, two physical strategies
(the planes/pixels dual-representation policy applied to CC).

Input: a mask DataFrame with columns ``(t, c, z, y, x, node)`` — one row
per foreground pixel, ``node`` a unique BIGINT pixel id. Output: one row
per non-isolated mask pixel: ``node, component, component_size`` where
``component`` is the minimum node id of the pixel's 4-connected
component (right/down adjacency within a (t, c, z) plane).

Strategies:

* ``flat`` — each pixel probes its right+down neighbor through one
  equi-join, then the pointer-jumping CC (functions/clusters.py:44)
  runs over ALL mask nodes: one shuffle on the pixel key per round,
  O(log diameter) rounds. Right for masks that fit a per-round shuffle
  over the full mask.
* ``tiled`` — two-level: (1) LOCAL union-find inside each ``tile`` =
  (TH, TW) block of the YX plane via applyInPandas — zero
  cross-partition traffic; (2) the global pointer-jumping CC runs ONLY
  on the tile-BOUNDARY label graph, so per-round shuffle volume is
  proportional to tile perimeter x #tiles, not mask area. The 100 TB
  form.
* ``auto`` (default) — flat below ``tile_threshold`` mask pixels,
  tiled above. The size comes from the ``approx_size`` hint when the
  caller knows it (catalog dims x fill factor); without a hint one
  ``count()`` job runs — bounded, but callers on hot paths should pass
  the hint.

Both strategies are hash-identical on the same mask (pinned by the
img_label_components / img_label_components_tiled twin oracles and the
equivalence test in tests/test_clusters.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: auto-dispatch boundary: below this many mask pixels the flat
#: formulation's full-mask shuffle is cheaper than the tiled overhead
TILE_THRESHOLD = 4_000_000

#: default tile for the tiled strategy — aligned with the planes-layout
#: chunk scale (a tile's pixels must fit one applyInPandas group)
DEFAULT_TILE = (1024, 1024)

_PLANE = ["t", "c", "z"]


def _neighbor_pairs(mask: DataFrame) -> DataFrame:
    """(doc_a, doc_b) 4-adjacency edges: each pixel probes its right and
    down neighbor through ONE equi join (explode 2 offsets), not two
    mask self-joins."""
    probes = (mask.select(
        *_PLANE, F.col("node").alias("doc_a"),
        F.explode(F.array(
            F.struct(F.col("y").alias("y"), (F.col("x") + 1).alias("x")),
            F.struct((F.col("y") + 1).alias("y"),
                     F.col("x").alias("x")))).alias("n"))
        .select(*_PLANE, "doc_a",
                F.col("n.y").alias("y"), F.col("n.x").alias("x")))
    return (probes.join(
        mask.select(*_PLANE, "y", "x", F.col("node").alias("doc_b")),
        [*_PLANE, "y", "x"])
        .select("doc_a", "doc_b"))


def _label_flat(mask: DataFrame, jump_from: int) -> DataFrame:
    from bioio_spark.functions.clusters import dedup_clusters

    return (dedup_clusters(_neighbor_pairs(mask), jump_from=jump_from)
            .select(F.col("doc_id").alias("node"),
                    F.col("cluster_rep").alias("component"),
                    F.col("cluster_size").alias("component_size")))


def _label_tiled(mask: DataFrame, tile: tuple[int, int]) -> DataFrame:
    import pandas as pd

    from bioio_spark.functions.clusters import connected_components

    TH, TW = tile

    def label_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = {(y, x): i for i, (y, x) in
               enumerate(zip(pdf["y"], pdf["x"]))}
        parent = list(range(len(pdf)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        linked = [False] * len(pdf)
        for (y, x), i in idx.items():
            for ny, nx in ((y, x + 1), (y + 1, x)):
                j = idx.get((ny, nx))
                if j is not None:
                    linked[i] = linked[j] = True
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        roots = [find(i) for i in range(len(pdf))]
        nodes = pdf["node"].to_numpy()
        min_node: dict = {}
        for i, r in enumerate(roots):
            m = min_node.get(r)
            if m is None or nodes[i] < m:
                min_node[r] = nodes[i]
        return pd.DataFrame({
            "node": nodes,
            "local_label": [min_node[r] for r in roots],
            "has_nb": linked,
        })

    local = (mask
             .withColumn("ty", F.floor(F.col("y") / TH))
             .withColumn("tx", F.floor(F.col("x") / TW))
             .groupBy(*_PLANE, "ty", "tx")
             .applyInPandas(label_tile,
                            "node long, local_label long, has_nb boolean"))

    # cross-tile adjacency: only tile-edge pixels probe across the border
    right = (mask.filter((F.col("x") + 1) % TW == 0)
             .select(*_PLANE, F.col("node").alias("a"),
                     F.col("y").alias("py"),
                     (F.col("x") + 1).alias("px_")))
    down = (mask.filter((F.col("y") + 1) % TH == 0)
            .select(*_PLANE, F.col("node").alias("a"),
                    (F.col("y") + 1).alias("py"),
                    F.col("x").alias("px_")))
    probes = right.unionByName(down)
    nbr = mask.select(*_PLANE, F.col("y").alias("py"),
                      F.col("x").alias("px_"),
                      F.col("node").alias("b"))
    bpairs = probes.join(nbr, [*_PLANE, "py", "px_"]).select("a", "b")

    lab = local.select(F.col("node").alias("lnode"),
                       F.col("local_label").alias("llabel"))
    lpairs = (bpairs
              .join(lab, bpairs["a"] == lab["lnode"])
              .select(F.col("llabel").alias("doc_a"), "b")
              .join(lab, F.col("b") == lab["lnode"])
              .select("doc_a", F.col("llabel").alias("doc_b"))
              .filter(F.col("doc_a") != F.col("doc_b"))
              .distinct())
    # the boundary graph is already label-collapsed and sparse; eager
    # pointer jumping (jump_from=1) converges it fastest
    cc = (connected_components(lpairs, jump_from=1)
          .select(F.col("node").alias("cnode"),
                  F.col("label").alias("clabel")))

    bnodes = (bpairs.select(F.col("a").alias("bn"))
              .unionByName(bpairs.select(F.col("b").alias("bn")))
              .distinct())
    in_graph = (local
                .join(bnodes, local["node"] == bnodes["bn"], "left")
                .filter(F.col("has_nb") | F.col("bn").isNotNull())
                .select("node", "local_label"))
    final = (in_graph
             .join(cc, in_graph["local_label"] == cc["cnode"], "left")
             .select("node",
                     F.coalesce("clabel", "local_label")
                     .alias("component")))
    w = Window.partitionBy("component")
    return final.withColumn("component_size", F.count(F.lit(1)).over(w))


def label_mask_components(mask: DataFrame, *,
                          strategy: str = "auto",
                          tile: tuple[int, int] = DEFAULT_TILE,
                          tile_threshold: int = TILE_THRESHOLD,
                          approx_size: int | None = None,
                          jump_from: int = 3) -> DataFrame:
    """Label 4-connected components of a pixel mask; see module doc for
    the flat/tiled/auto strategy contract."""
    if strategy not in ("auto", "flat", "tiled"):
        raise ValueError(f"unknown strategy {strategy!r}; "
                         "use 'auto', 'flat' or 'tiled'")
    if strategy == "auto":
        size = approx_size if approx_size is not None else mask.count()
        strategy = "tiled" if size > tile_threshold else "flat"
    if strategy == "tiled":
        return _label_tiled(mask, tile)
    return _label_flat(mask, jump_from=jump_from)
