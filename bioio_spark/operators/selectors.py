"""Selector algebra over the long-form pixel table (SURVEY §2.2, P1-P6).

`apply_selectors(df, dims, order_out, selectors)` re-expresses the
reference's `reshape_data(data, given_dims, return_dims, **selectors)` read
path (ref bioio/bio_image.py:841-917, selector semantics :776-788) as a
DataFrame plan:

- P1 point select  (int, negatives allowed)  -> pushdown-able equality filter
- P2 fancy select  (list/tuple)              -> IN filter + dense re-index
- P3 strided select(range/slice)             -> range+modulo filter + re-index
- P5 dim insertion (requested but absent)    -> lit(0) column
- P6 default slice (present, unrequested)    -> equality-0 filter

All index resolution happens driver-side against cataloged dim sizes, so the
emitted plan contains only literal comparisons on int columns — Catalyst
pushes them into the parquet scan (PushedFilters) and prunes partitions on
scene/res_level. No shuffle is introduced: every step is a narrow
filter/projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bioio_spark.dimensions import (
    DIM_COLUMNS,
    Dimensions,
    ResolvedSelector,
    resolve_selector,
)


def apply_selectors(
    df: DataFrame,
    dims: Dimensions,
    dimension_order_out: str,
    selectors: dict | None = None,
) -> tuple[DataFrame, Dimensions]:
    """Return (plan, out_dims) implementing the reference selector semantics.

    `df` must carry the long-form dim columns for every letter in
    ``dims.order``; output carries exactly the dim columns of
    ``dimension_order_out`` (re-indexed densely) plus ``value``.
    """
    selectors = dict(selectors or {})
    unknown = set(selectors) - set("TCZYXMS")
    if unknown:
        raise ValueError(f"Unknown selector dims: {sorted(unknown)}")

    out_shape: dict[str, int] = {}
    plan = df
    for letter, size in dims.items:
        col = DIM_COLUMNS[letter]
        sel = selectors.get(letter)
        in_out = letter in dimension_order_out
        if sel is None:
            if in_out:
                out_shape[letter] = size
                continue
            # P6: present but unrequested -> implicit index-0 slice
            plan = plan.filter(F.col(col) == F.lit(0)).drop(col)
            continue
        rs: ResolvedSelector = resolve_selector(sel, size)
        if rs.kind == "point":
            plan = plan.filter(F.col(col) == F.lit(int(rs.indices[0])))
            if in_out:
                plan = plan.withColumn(col, F.lit(0))
                out_shape[letter] = 1
            else:
                plan = plan.drop(col)
        elif rs.kind == "fancy":
            idx = [int(i) for i in rs.indices]
            plan = plan.filter(F.col(col).isin(list(set(idx))))
            if len(set(idx)) == len(idx):
                # dense re-index in listed order; array_position against a
                # literal array -> stays in whole-stage codegen
                arr = F.array(*[F.lit(i) for i in idx])
                plan = plan.withColumn(
                    col, (F.array_position(arr, F.col(col)) - 1).cast("int"))
            else:
                # duplicated indices replicate their hyperplane (numpy fancy
                # indexing semantics): explode the list positions matching
                # this row's index — row multiplication without a join, and
                # the isin() above still reaches the parquet scan.
                positions = F.array(*[
                    F.struct(F.lit(i).alias("old"),
                             F.lit(pos).cast("int").alias("new"))
                    for pos, i in enumerate(idx)])
                matches = F.filter(
                    positions, lambda s: s["old"] == F.col(col))
                plan = (plan.withColumn("__fancy_pos", F.explode(matches))
                        .withColumn(col, F.col("__fancy_pos.new"))
                        .drop("__fancy_pos"))
            if in_out:
                out_shape[letter] = len(idx)
            else:
                plan = plan.filter(F.col(col) == 0).drop(col)
        else:  # stride
            start, stop, step = rs.start, rs.stop, rs.step
            plan = plan.filter(
                (F.col(col) >= start) & (F.col(col) < stop)
                & (((F.col(col) - start) % step) == 0))
            plan = plan.withColumn(
                col, ((F.col(col) - start) / step).cast("int"))
            n = max(0, (stop - start + step - 1) // step)
            if in_out:
                out_shape[letter] = n
            else:
                plan = plan.filter(F.col(col) == 0).drop(col)

    # P5: dims requested in the output but absent from the data
    for letter in dimension_order_out:
        if letter not in dims.order:
            plan = plan.withColumn(DIM_COLUMNS[letter], F.lit(0).cast("int"))
            out_shape[letter] = 1

    out_cols = [DIM_COLUMNS[letter] for letter in dimension_order_out]
    plan = plan.select(*out_cols, "value")
    out_dims = Dimensions(
        dimension_order_out,
        tuple(out_shape[letter] for letter in dimension_order_out),
    )
    return plan, out_dims


def to_ndarray(plan: DataFrame, out_dims: Dimensions, dtype=None):
    """Materialize a selector plan into a dense ndarray (driver-side pivot).

    The Spark analog of the reference's eager `get_image_data`
    (ref bio_image.py:841-917): collect via Arrow and scatter into a dense
    block. Fine at fixture scale; the 100 TB path assembles per-chunk via
    mapInPandas instead (ImageDataset.planes, r2).

    `dtype` is the scene's cataloged pixel dtype; the relational value
    column is DOUBLE (OME pixel values round-trip exactly through float64
    for all integer types up to 32 bits), so the assembled block is cast
    back to the native dtype — the reference preserves the source dtype
    end-to-end (ref bio_image.py:749-762 `dtype` from the lazy array).
    """
    import numpy as np
    from pyspark.sql.types import StructType as _StructType

    is_complex = isinstance(plan.schema["value"].dataType, _StructType)
    pdf = plan.toPandas()
    arr = np.zeros(out_dims.shape,
                   dtype=np.complex128 if is_complex else np.float64)
    if len(pdf):
        cols = [DIM_COLUMNS[letter] for letter in out_dims.order]
        idx = tuple(pdf[c].to_numpy() for c in cols)
        if is_complex:
            # struct<re,im> rows come back as Row/dict objects
            n = len(pdf)
            re = np.fromiter((v["re"] for v in pdf["value"]),
                             dtype=np.float64, count=n)
            im = np.fromiter((v["im"] for v in pdf["value"]),
                             dtype=np.float64, count=n)
            arr[idx] = re + 1j * im
        else:
            arr[idx] = pdf["value"].to_numpy()
    if dtype is not None and np.dtype(dtype) != arr.dtype:
        arr = arr.astype(dtype)
    return arr
