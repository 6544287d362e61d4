"""Adobe DNG (Digital Negative) — the openly-specified camera-RAW
container (Adobe DNG spec 1.4; a classic little-endian TIFF whose raw
IFD carries PhotometricInterpretation=32803 CFA mosaic data plus DNG
tags 50706+). The reference reaches camera RAWs only through the
bioio-bioformats Java bridge; this module gives the native subset:

- ``build_dng``: compose a valid single-IFD DNG — uint16 CFA mosaic,
  strip layout, Compression 1 (none) or 7 (lossless JPEG SOF3 per
  strip, the DNG-mandated lossless codec — formats/ljpeg.py).
- ``read_dng_catalog``: driver-side IFD walk (via the shared
  iter_tiff_chunks) -> dims, dtype, strip byte ranges, CFA pattern,
  black/white levels. No pixel IO (D8 contract).

Scale: strips are independently decodable (each strip is its own
complete SOF3 codestream), so the read plan is one row per strip —
one ranged GET each, zero shuffle, same contract as every other
planned source.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_TYPES = {"SHORT": 3, "LONG": 4, "BYTE": 1, "ASCII": 2,
              "RATIONAL": 5, "SRATIONAL": 10}

CFA_NAMES = {0: "R", 1: "G", 2: "B"}

_CFA_DIM = 33421
_CFA_PATTERN = 33422
_DNG_VERSION = 50706
_UNIQUE_MODEL = 50708
_BLACK_LEVEL = 50714
_WHITE_LEVEL = 50717
_COLOR_MATRIX1 = 50721
_AS_SHOT_NEUTRAL = 50728


def build_dng(plane: np.ndarray, compression: int = 1,
              rows_per_strip: int = 0,
              cfa_pattern: bytes = bytes((0, 1, 1, 2)),
              model: str = "bioio-spark synthetic",
              white_level: int = 0,
              ljpeg_components: int = 1,
              black_level: int = 0,
              as_shot_neutral=None,
              color_matrix1=None) -> bytes:
    """Compose a single-IFD DNG holding `plane` (2-D uint16 CFA
    mosaic). compression: 1 = none, 7 = lossless JPEG per strip
    (ljpeg_components=2 writes the column-interleaved two-component
    SOF3 scans Adobe's converter produces).

    `as_shot_neutral` is 3 (num, den) RATIONAL pairs (tag 50728, the
    camera-neutral white point); `color_matrix1` is 9 signed (num, den)
    SRATIONAL pairs row-major (tag 50721, the XYZ->camera matrix) —
    the metadata the develop stage (img_dng_develop) consumes."""
    if plane.ndim != 2 or plane.dtype != np.uint16:
        raise ValueError("build_dng takes a 2-D uint16 mosaic")
    if compression not in (1, 7):
        raise ValueError("DNG compression must be 1 (none) or 7 "
                         "(lossless JPEG)")
    h, w = plane.shape
    rps = rows_per_strip or h
    if not white_level:
        white_level = 0xFFFF
    strips = []
    for y0 in range(0, h, rps):
        rows = plane[y0:y0 + rps]
        if compression == 1:
            strips.append(rows.astype("<u2").tobytes())
        else:
            from bioio_spark.formats.ljpeg import encode_ljpeg
            strips.append(encode_ljpeg(
                rows, precision=16,
                n_components=ljpeg_components))

    model_b = model.encode() + b"\x00"
    n = len(strips)
    entries = []            # (tag, type, count, packed-or-bytes)

    def ent(tag, typ, values):
        t = _TAG_TYPES[typ]
        if typ == "ASCII":
            entries.append((tag, t, len(values), bytes(values)))
            return
        if typ == "BYTE":
            entries.append((tag, t, len(values), bytes(values)))
            return
        if typ in ("RATIONAL", "SRATIONAL"):
            fmt = "<II" if typ == "RATIONAL" else "<ii"
            entries.append((tag, t, len(values),
                            b"".join(struct.pack(fmt, n, d)
                                     for n, d in values)))
            return
        fmt = "<H" if typ == "SHORT" else "<I"
        entries.append((tag, t, len(values),
                        b"".join(struct.pack(fmt, v) for v in values)))

    # data area layout: header(8) + ifd + out-of-line values + strips
    ent(254, "LONG", [0])
    ent(256, "LONG", [w])
    ent(257, "LONG", [h])
    ent(258, "SHORT", [16])
    ent(259, "SHORT", [compression])
    ent(262, "SHORT", [32803])          # CFA
    ent(273, "LONG", [0] * n)           # patched below (by tag lookup)
    ent(277, "SHORT", [1])
    ent(278, "LONG", [rps])
    ent(279, "LONG", [len(s) for s in strips])
    ent(_CFA_DIM, "SHORT", [2, 2])
    ent(_CFA_PATTERN, "BYTE", cfa_pattern)
    ent(_DNG_VERSION, "BYTE", bytes((1, 4, 0, 0)))
    ent(_UNIQUE_MODEL, "ASCII", model_b)
    ent(_BLACK_LEVEL, "SHORT", [black_level])
    ent(_WHITE_LEVEL, "LONG", [white_level])
    if as_shot_neutral is not None:
        if len(as_shot_neutral) != 3:
            raise ValueError("AsShotNeutral needs 3 (num, den) pairs")
        ent(_AS_SHOT_NEUTRAL, "RATIONAL", list(as_shot_neutral))
    if color_matrix1 is not None:
        if len(color_matrix1) != 9:
            raise ValueError("ColorMatrix1 needs 9 (num, den) pairs")
        ent(_COLOR_MATRIX1, "SRATIONAL", list(color_matrix1))
    entries.sort(key=lambda e: e[0])

    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 10: 8}
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    ool_off = ifd_off + ifd_len
    ool = bytearray()
    fixed = []
    for tag, typ, count, data in entries:
        if len(data) <= 4:
            fixed.append((tag, typ, count, data.ljust(4, b"\x00")))
        else:
            fixed.append((tag, typ, count,
                          struct.pack("<I", ool_off + len(ool))))
            ool.extend(data)
    strip_base = ool_off + len(ool)
    offs, cur = [], strip_base
    for s in strips:
        offs.append(cur)
        cur += len(s)
    # patch strip offsets (they were written as zeros into either the
    # inline slot or the out-of-line area) — located by TAG, never by
    # positional index, so the entries sort can reorder freely
    typ, count = [(t, c) for tg, t, c, _ in entries if tg == 273][0]
    packed = b"".join(struct.pack("<I", o) for o in offs)
    if len(packed) <= 4:
        fixed_idx = [i for i, e in enumerate(fixed) if e[0] == 273][0]
        fixed[fixed_idx] = (273, typ, count, packed.ljust(4, b"\x00"))
    else:
        ptr = [e for e in fixed if e[0] == 273][0][3]
        (loc,) = struct.unpack("<I", ptr)
        ool[loc - ool_off:loc - ool_off + len(packed)] = packed

    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", len(fixed))
    for tag, typ, count, data in fixed:
        out += struct.pack("<HHI", tag, typ, count) + data
    out += struct.pack("<I", 0)         # next IFD
    out += ool
    for s in strips:
        out += s
    return bytes(out)


def read_dng_catalog(path: str) -> dict:
    """Driver-side DNG catalog: the raw-IFD page (DNGVersion present,
    CFA photometric), its strip byte ranges, CFA pattern and levels."""
    from bioio_spark.formats.tiff import iter_tiff_chunks

    pages = iter_tiff_chunks(
        path, keep_tags=(_CFA_DIM, _CFA_PATTERN, _DNG_VERSION,
                         _UNIQUE_MODEL, _BLACK_LEVEL, _WHITE_LEVEL,
                         _COLOR_MATRIX1, _AS_SHOT_NEUTRAL, 262))
    raw = None
    for pg in pages:
        if _DNG_VERSION in pg.get("vendor", {}):
            raw = pg
            break
    if raw is None:
        raise ValueError(f"{path}: no DNGVersion tag — not a DNG")
    v = raw["vendor"]
    if raw["comp"] not in (1, 7):
        raise ValueError(f"unsupported DNG compression {raw['comp']} "
                         "(1=none and 7=lossless JPEG implemented)")
    patt = bytes(v.get(_CFA_PATTERN, b""))
    dim = list(v.get(_CFA_DIM, (2, 2)))
    model = v.get(_UNIQUE_MODEL)
    if isinstance(model, list):
        model = model[0] if model else None
    if isinstance(model, (bytes, bytearray)):
        model = model.split(b"\x00")[0].decode("latin-1")
    elif isinstance(model, str):
        model = model.rstrip("\x00")
    version = bytes(v.get(_DNG_VERSION, b""))
    return {
        "size_y": raw["h"], "size_x": raw["w"],
        "dtype": raw["dtype"], "comp": raw["comp"],
        "chunks": raw["chunks"],
        "cfa_dim": dim,
        "cfa_pattern": "".join(CFA_NAMES.get(b, "?") for b in patt),
        "dng_version": ".".join(str(b) for b in version),
        "model": model,
        "black_level": v.get(_BLACK_LEVEL, [0])[0],
        "white_level": v.get(_WHITE_LEVEL, [0xFFFF])[0],
        # develop metadata: AsShotNeutral (RATIONAL -> floats, exact
        # for dyadic denominators) and ColorMatrix1 (SRATIONAL ->
        # exact signed (num, den) pairs, row-major XYZ->camera)
        "as_shot_neutral": v.get(_AS_SHOT_NEUTRAL),
        "color_matrix1": v.get(_COLOR_MATRIX1),
    }
