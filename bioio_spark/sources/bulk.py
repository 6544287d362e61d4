"""Distributed bulk catalog: executor-side metadata walk over an
acquisition DIRECTORY, feeding the existing per-file planned readers.

Every planned source catalogs ONE file driver-side (fine per image —
the D8 metadata-only contract — but a serialization point for a real
acquisition directory of millions of files). ``bulk_catalog`` lifts
the same catalog walks onto executors: parallelize the path list ->
``mapInPandas`` batch catalog -> one row per file, with per-file
errors captured as rows (ok=false, err) instead of failing the job —
at directory scale SOME files are always truncated or foreign, and a
catalog stage that dies on the first one never finishes. The output
frame is the input to the per-file read plans, admission control, or
partition planning; no pixel IO happens here.

Formats: TIFF/OME-TIFF (shared IFD walk), DNG (raw-IFD catalog), PNG
(IHDR header). The dispatch table is the extension point — each new
entry is one driver-side catalog function reused verbatim on
executors.

Reference parity: bioio routes directories only file-at-a-time through
``BioImage`` construction (ref ``bio_image.py``); the bulk stage is
the scale path this engine adds.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

CATALOG_SCHEMA = ("path string, fmt string, ok boolean, err string, "
                  "n_pages int, size_y int, size_x int, dtype string, "
                  "n_chunks int, n_bytes bigint")

_COLUMNS = ["path", "fmt", "ok", "err", "n_pages", "size_y", "size_x",
            "dtype", "n_chunks", "n_bytes"]


def _catalog_tiff(path: str) -> dict:
    from bioio_spark.formats.tiff import iter_tiff_chunks

    pages = iter_tiff_chunks(path)
    p0 = pages[0]
    return {"fmt": "tiff", "n_pages": len(pages),
            "size_y": p0["h"], "size_x": p0["w"],
            "dtype": str(p0["dtype"]),
            "n_chunks": sum(len(p["chunks"]) for p in pages)}


def _catalog_dng(path: str) -> dict:
    from bioio_spark.formats.dng import read_dng_catalog

    cat = read_dng_catalog(path)
    return {"fmt": "dng", "n_pages": 1,
            "size_y": cat["size_y"], "size_x": cat["size_x"],
            "dtype": str(cat["dtype"]),
            "n_chunks": len(cat["chunks"])}


def _catalog_png(path: str) -> dict:
    # IHDR is mandatory-first (PNG spec 11.2.2): signature(8) +
    # len/type(8) + width/height/depth/color — a 26-byte ranged read
    with open(path, "rb") as f:
        head = f.read(26)
    if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
        raise ValueError(f"{path}: not a PNG (bad signature/IHDR)")
    w, h = struct.unpack(">II", head[16:24])
    depth = head[24]
    return {"fmt": "png", "n_pages": 1, "size_y": h, "size_x": w,
            "dtype": "<u2" if depth == 16 else "|u1", "n_chunks": 1}


_DISPATCH = {
    ".tif": _catalog_tiff, ".tiff": _catalog_tiff,
    ".dng": _catalog_dng,
    ".png": _catalog_png,
}


def catalog_one(path: str) -> dict:
    """Catalog a single file (the function the executors run): full
    row dict per CATALOG_SCHEMA; failures become (ok=false, err)."""
    row = {c: None for c in _COLUMNS}
    row["path"] = path
    ext = os.path.splitext(path)[1].lower()
    row["fmt"] = ext.lstrip(".") or "?"
    try:
        fn = _DISPATCH.get(ext)
        if fn is None:
            raise ValueError(f"unsupported extension {ext!r} "
                             f"(bulk catalog handles "
                             f"{sorted(_DISPATCH)})")
        row.update(fn(path))
        row["n_bytes"] = os.path.getsize(path)
        row["ok"] = True
        row["err"] = None
    except Exception as exc:
        row["ok"] = False
        row["err"] = f"{type(exc).__name__}: {exc}"[:200]
    return row


def bulk_catalog(spark, paths, n_partitions: int = 0):
    """Executor-side catalog of `paths` -> DataFrame(CATALOG_SCHEMA).

    The path list is parallelized (it is the 100 TB directory listing
    — millions of rows, trivially distributable) and the per-file
    catalog walk runs inside ``mapInPandas``: every partition opens
    its own files, so a 1000-executor cluster catalogs a million-file
    directory in parallel instead of serializing ranged reads through
    the driver. Deterministic row content; no pixel IO."""
    import pandas as pd

    paths = list(paths)
    n = n_partitions or max(
        1, min(len(paths),
               spark.sparkContext.defaultParallelism))
    pdf = spark.createDataFrame([(p,) for p in paths],
                                "path string").repartition(n)

    def walk(batches: Iterator) -> Iterator:
        for b in batches:
            rows = [catalog_one(p) for p in b["path"]]
            yield pd.DataFrame(
                rows if rows else None, columns=_COLUMNS)

    return pdf.mapInPandas(walk, CATALOG_SCHEMA)
