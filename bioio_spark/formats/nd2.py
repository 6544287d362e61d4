"""Pure-Python ND2 (Nikon NIS-Elements) baseline codec — the
reference's bioio-nd2 plugin tier (ref README.md:63). The modern ND2
container is publicly mirrored by the open-source `nd2` / `nd2reader`
packages:

- CHUNKS: ``uint32 magic 0x0ABECEDA | uint32 name_length | uint64
  data_length | name bytes (trailing '!') | data``.
- The file opens with the ``ND2 FILE SIGNATURE CHUNK NAME01!`` chunk
  (data = version string, e.g. ``Ver3.0``) and ends with the ``ND2
  CHUNK MAP SIGNATURE 0000001!`` chunk — name -> (offset, size) pairs
  for every chunk — whose own offset is the file's LAST 8 bytes, so a
  reader seeks straight to the index (the same tail-index pattern as
  a zip central directory).
- Pixel chunks are ``ImageDataSeq|<n>!``: an 8-byte double timestamp
  then one frame of component-interleaved samples (uiComp channels
  per pixel).
- Attribute chunks (``ImageAttributesLV!``) hold a CLxLiteVariant
  tagged tree: ``u1 type | u1 name wchar count | UTF-16-LE name
  (NUL-terminated) | value`` with types 2 int32 (u4), 6 double, 8
  UTF-16 string, 11 level (u4 child count + u8 subtree byte length,
  then children). The SLxImageAttributes level carries uiWidth /
  uiHeight / uiComp / uiBpcInMemory / uiSequenceCount.

Experiment loops: the ``ImageMetadataLV!`` chunk carries an
``SLxExperiment`` tree whose nested levels describe the acquisition
loop structure — each level has ``eType`` (public nd2-package
LoopType values: 1 TimeLoop, 2 XYPosLoop, 4 ZStackLoop, 8
NETimeLoop), ``uLoopPars`` (a level with ``uiCount``), and
``ppNextLevelEx`` (a level holding the next inner loop). Frames
unroll with the INNERMOST loop fastest, so a TimeLoop(3) over
ZStackLoop(4) stores frame seq = t*4 + z — the common Z-stack x
timelapse shape. ``read_nd2_experiment`` returns the outer-to-inner
(eType, count) list; ``resolve_nd2_loops`` classifies time loops -> T,
Z stacks -> Z, and XYPos loops -> P (one scene per stage position),
with ``nd2_seq_coords`` mixed-radix-decomposing any nesting.
``dPeriod``/``dZStep`` in ``uLoopPars`` surface as time_interval /
PhysicalPixelSizes.Z. Files without the chunk (or with custom loop
types) read as a flat T series, the documented fallback. Pixels:
uint8/uint16."""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

CHUNK_MAGIC = 0x0ABECEDA
SIG_NAME = b"ND2 FILE SIGNATURE CHUNK NAME01!"
MAP_NAME = b"ND2 CHUNK MAP SIGNATURE 0000001!"

#: SLxExperiment eType values (public nd2-package LoopType enum)
LOOP_TIME = 1
LOOP_XYPOS = 2
LOOP_ZSTACK = 4
LOOP_NETIME = 8
_LOOP_NAME_TO_TYPE = {"TimeLoop": LOOP_TIME, "XYPosLoop": LOOP_XYPOS,
                      "ZStackLoop": LOOP_ZSTACK,
                      "NETimeLoop": LOOP_NETIME}


def _chunk(name: bytes, data: bytes) -> bytes:
    return (struct.pack("<IIQ", CHUNK_MAGIC, len(name), len(data))
            + name + data)


# -- CLxLiteVariant subset -------------------------------------------------

def _lv_name(name: str) -> bytes:
    u = (name + "\x00").encode("utf-16-le")
    return struct.pack("<B", len(name) + 1) + u


def encode_lv(items: dict) -> bytes:
    """dict -> CLxLiteVariant bytes. int -> type 2 (int32), float ->
    type 6 (double), str -> type 8, dict -> type 11 level."""
    out = bytearray()
    for name, val in items.items():
        if isinstance(val, bool):
            raise ValueError("bool not in the baseline LV subset")
        if isinstance(val, int):
            out += b"\x02" + _lv_name(name) + struct.pack("<i", val)
        elif isinstance(val, float):
            out += b"\x06" + _lv_name(name) + struct.pack("<d", val)
        elif isinstance(val, str):
            u = (val + "\x00").encode("utf-16-le")
            out += b"\x08" + _lv_name(name) + u
        elif isinstance(val, dict):
            body = encode_lv(val)
            out += (b"\x0b" + _lv_name(name)
                    + struct.pack("<IQ", len(val), len(body)) + body)
        else:
            raise ValueError(f"LV subset cannot encode {type(val)}")
    return bytes(out)


def decode_lv(data: bytes) -> dict:
    out: dict = {}
    pos = 0
    while pos < len(data):
        typ = data[pos]
        nlen = data[pos + 1]
        name = data[pos + 2:pos + 2 + 2 * nlen].decode(
            "utf-16-le").rstrip("\x00")
        pos += 2 + 2 * nlen
        if typ == 2:
            (out[name],) = struct.unpack_from("<i", data, pos)
            pos += 4
        elif typ == 3:
            (out[name],) = struct.unpack_from("<I", data, pos)
            pos += 4
        elif typ == 6:
            (out[name],) = struct.unpack_from("<d", data, pos)
            pos += 8
        elif typ == 8:
            end = pos
            while data[end:end + 2] != b"\x00\x00":
                end += 2
            out[name] = data[pos:end].decode("utf-16-le")
            pos = end + 2
        elif typ == 11:
            _count, blen = struct.unpack_from("<IQ", data, pos)
            pos += 12
            out[name] = decode_lv(data[pos:pos + blen])
            pos += blen
        else:
            raise ValueError(f"unsupported LV type {typ}")
    return out


# -- container -------------------------------------------------------------

def _encode_experiment(loops: Sequence[tuple]) -> dict:
    """Outer-to-inner [(loop_name_or_etype, count[, pars]), ...] ->
    SLxExperiment LV tree (eType / uLoopPars.uiCount / ppNextLevelEx
    nesting, mirroring the public nd2-package structure). The optional
    third element merges extra uLoopPars entries — e.g.
    ``{"dPeriod": 500.0}`` (ms) on a TimeLoop."""
    exp: Optional[dict] = None
    for loop in reversed(list(loops)):
        name, count = loop[0], loop[1]
        pars = dict(loop[2]) if len(loop) > 2 else {}
        etype = (_LOOP_NAME_TO_TYPE[name]
                 if isinstance(name, str) else int(name))
        pars["uiCount"] = int(count)
        level = {"eType": etype, "uLoopPars": pars}
        if exp is not None:
            level["ppNextLevelEx"] = {"i0000000000": exp}
        exp = level
    return {"SLxExperiment": exp or {}}


def encode_nd2(frames: np.ndarray,
               n_components: int = 1,
               pixel_um: Optional[float] = None,
               channel_names: Optional[Sequence[str]] = None,
               loops: Optional[Sequence[tuple]] = None) -> bytes:
    """frames: (T, Y, X) gray or (T, Y, X, C) component-interleaved,
    uint8/uint16 -> ND2 bytes. `loops` (outer-to-inner
    [("TimeLoop", t), ("ZStackLoop", z)] pairs) writes the
    SLxExperiment chunk; their count product must equal the frame
    count, and frames are assumed stored inner-loop-fastest."""
    a = np.ascontiguousarray(frames)
    if a.ndim == 3:
        a = a[..., None]
    if a.ndim != 4:
        raise ValueError("encode_nd2 expects (T, Y, X[, C]) frames")
    if a.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"ND2 baseline stores uint8/uint16, "
                         f"got {a.dtype}")
    t_n, y_n, x_n, c_n = a.shape
    out = bytearray()
    out += _chunk(SIG_NAME, b"Ver3.0\x00")
    chunk_map = [(SIG_NAME, 0, 7)]
    attrs = {"SLxImageAttributes": {
        "uiWidth": x_n, "uiHeight": y_n, "uiComp": c_n,
        "uiBpcInMemory": 8 * a.itemsize,
        "uiBpcSignificant": 8 * a.itemsize,
        "uiSequenceCount": t_n,
    }}
    if pixel_um is not None:
        attrs["SLxImageAttributes"]["dCalibration"] = float(pixel_um)
    attr_data = encode_lv(attrs)
    pos = len(out)
    out += _chunk(b"ImageAttributesLV!", attr_data)
    chunk_map.append((b"ImageAttributesLV!", pos, len(attr_data)))
    if channel_names:
        text = encode_lv({"SLxImageTextInfo": {
            f"TextInfoItem_{i}": str(n)
            for i, n in enumerate(channel_names)}})
        pos = len(out)
        out += _chunk(b"ImageTextInfoLV!", text)
        chunk_map.append((b"ImageTextInfoLV!", pos, len(text)))
    if loops:
        import math

        if math.prod(int(lp[1]) for lp in loops) != t_n:
            raise ValueError(
                f"loop counts {[lp[1] for lp in loops]} do not factor "
                f"the {t_n} frames")
        meta = encode_lv(_encode_experiment(loops))
        pos = len(out)
        out += _chunk(b"ImageMetadataLV!", meta)
        chunk_map.append((b"ImageMetadataLV!", pos, len(meta)))
    for t in range(t_n):
        name = f"ImageDataSeq|{t}!".encode("ascii")
        data = struct.pack("<d", float(t)) + a[t].tobytes()
        pos = len(out)
        out += _chunk(name, data)
        chunk_map.append((name, pos, len(data)))
    # chunk map: name -> (u8 offset, u8 size); terminated by its own
    # sentinel entry, and the map chunk's offset in the file tail
    map_pos = len(out)
    body = b"".join(name + struct.pack("<QQ", off, size)
                    for name, off, size in chunk_map)
    body += MAP_NAME + struct.pack("<QQ", map_pos, 0)
    out += _chunk(MAP_NAME, body)
    out += struct.pack("<Q", map_pos)
    return bytes(out)


def read_nd2_chunkmap(path: str) -> dict:
    """Tail-seek the chunk map -> {name: (offset, size)} without
    scanning the file."""
    with open(path, "rb") as f:
        f.seek(0, 2)
        end = f.tell()
        f.seek(end - 8)
        (map_pos,) = struct.unpack("<Q", f.read(8))
        f.seek(map_pos)
        magic, nlen, dlen = struct.unpack("<IIQ", f.read(16))
        if magic != CHUNK_MAGIC:
            raise ValueError("bad ND2 chunk-map chunk magic")
        name = f.read(nlen)
        if name != MAP_NAME:
            raise ValueError(f"chunk-map chunk named {name!r}")
        body = f.read(dlen)
    out = {}
    pos = 0
    while pos < len(body):
        bang = body.index(b"!", pos)
        name = body[pos:bang + 1]
        off, size = struct.unpack_from("<QQ", body, bang + 1)
        pos = bang + 1 + 16
        if name == MAP_NAME:
            break
        out[name.decode("ascii")] = (off, size)
    return out


def read_nd2_chunk(path: str, name: str, offset: int,
                   size: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        magic, nlen, dlen = struct.unpack("<IIQ", f.read(16))
        if magic != CHUNK_MAGIC:
            raise ValueError(f"bad chunk magic for {name!r}")
        got = f.read(nlen)
        if got != name.encode("ascii"):
            raise ValueError(f"chunk at {offset} is {got!r}, "
                             f"expected {name!r}")
        return f.read(dlen)


def read_nd2_chunk_slice(path: str, name: str, offset: int,
                         start: int, nbytes: int) -> bytes:
    """A byte RANGE of one chunk's data — the windowed-read primitive:
    only `nbytes` of pixel data move (one ranged GET at object-store
    scale), not the whole frame."""
    with open(path, "rb") as f:
        f.seek(offset)
        magic, nlen, dlen = struct.unpack("<IIQ", f.read(16))
        if magic != CHUNK_MAGIC:
            raise ValueError(f"bad chunk magic for {name!r}")
        got = f.read(nlen)
        if got != name.encode("ascii"):
            raise ValueError(f"chunk at {offset} is {got!r}, "
                             f"expected {name!r}")
        if start + nbytes > dlen:
            raise ValueError(
                f"slice [{start}, {start + nbytes}) beyond chunk "
                f"data of {dlen} bytes")
        f.seek(offset + 16 + nlen + start)
        return f.read(nbytes)


def read_nd2_experiment(path: str) -> list[tuple[int, int]]:
    """SLxExperiment loop structure, outer-to-inner [(eType, count),
    ...]; [] when the file has no ImageMetadataLV! chunk (flat T
    series). A few KB of IO: chunk-map tail seek + one chunk read."""
    cmap = read_nd2_chunkmap(path)
    if "ImageMetadataLV!" not in cmap:
        return []
    lv = decode_lv(read_nd2_chunk(path, "ImageMetadataLV!",
                                  *cmap["ImageMetadataLV!"]))
    exp = lv.get("SLxExperiment")
    out: list[tuple[int, int]] = []
    while isinstance(exp, dict) and "eType" in exp:
        pars = exp.get("uLoopPars", {})
        count = pars.get("uiCount", 0) if isinstance(pars, dict) else 0
        out.append((int(exp["eType"]), int(count)))
        nxt = exp.get("ppNextLevelEx")
        exp = (next(iter(nxt.values()), None)
               if isinstance(nxt, dict) and nxt else None)
    return out


def factor_nd2_loops(loops: Sequence[tuple[int, int]],
                     n_frames: int) -> Optional[tuple[int, int, bool]]:
    """(size_t, size_z, z_inner) when `loops` is a TimeLoop/ZStackLoop
    factorization of n_frames; None -> caller falls back to flat T.
    `z_inner` says whether Z varies fastest across the frame sequence
    (ZStackLoop is the inner loop — the common Z-stack-per-timepoint
    acquisition)."""
    if not loops:
        return None
    t_n = z_n = 1
    kinds = []
    for etype, count in loops:
        if count < 1:
            return None
        if etype in (LOOP_TIME, LOOP_NETIME):
            t_n *= count
            kinds.append("t")
        elif etype == LOOP_ZSTACK:
            z_n *= count
            kinds.append("z")
        else:                      # XYPos / custom loops: not factored
            return None
    if t_n * z_n != n_frames:
        return None
    # the (t, z) split assumes each kind forms ONE contiguous run in
    # the nesting (t..t,z..z or z..z,t..t); interleavings like t,z,t
    # don't unroll to a plain product and fall back
    runs = [k for i, k in enumerate(kinds)
            if i == 0 or kinds[i - 1] != k]
    if len(runs) > 2:
        return None
    z_inner = kinds[-1] == "z" if "z" in kinds else False
    return t_n, z_n, z_inner


#: eType -> axis kind for loop resolution: time loops -> t, Z stacks
#: -> z, stage positions -> p (scenes, the reference's bioio-nd2
#: mapping of multi-position acquisitions)
_LOOP_KIND = {LOOP_TIME: "t", LOOP_NETIME: "t", LOOP_ZSTACK: "z",
              LOOP_XYPOS: "p"}


def resolve_nd2_loops(loops: Sequence[tuple[int, int]],
                      n_frames: int) -> Optional[list[tuple[str, int]]]:
    """Outer-to-inner [(eType, count)] -> [("t"|"z"|"p", count)] when
    every loop is a TimeLoop/NETimeLoop/ZStackLoop/XYPosLoop
    factorization of n_frames; None -> flat-T fallback. Unlike the
    (t_n, z_n) collapse of factor_nd2_loops, the kind list supports ANY
    nesting: frame seq decomposes by mixed radix (inner loop fastest)
    and each kind's combined index comes from its loops in nesting
    order (nd2_seq_coords)."""
    if not loops:
        return None
    out = []
    total = 1
    for etype, count in loops:
        kind = _LOOP_KIND.get(etype)
        if kind is None or count < 1:
            return None
        out.append((kind, int(count)))
        total *= int(count)
    return out if total == n_frames else None


def read_nd2_time_interval(path: str) -> Optional[float]:
    """The outermost TimeLoop/NETimeLoop's uLoopPars.dPeriod
    (milliseconds, the NIS acquisition interval) -> SECONDS, or None
    when no time loop declares a period — feeds the reader's
    time_interval metadata (ref bio_image.py:1066-1077 semantics)."""
    cmap = read_nd2_chunkmap(path)
    if "ImageMetadataLV!" not in cmap:
        return None
    lv = decode_lv(read_nd2_chunk(path, "ImageMetadataLV!",
                                  *cmap["ImageMetadataLV!"]))
    exp = lv.get("SLxExperiment")
    while isinstance(exp, dict) and "eType" in exp:
        pars = exp.get("uLoopPars", {})
        if exp["eType"] in (LOOP_TIME, LOOP_NETIME) and \
                isinstance(pars, dict) and pars.get("dPeriod"):
            return float(pars["dPeriod"]) / 1000.0
        nxt = exp.get("ppNextLevelEx")
        exp = (next(iter(nxt.values()), None)
               if isinstance(nxt, dict) and nxt else None)
    return None


def read_nd2_z_step(path: str) -> Optional[float]:
    """The ZStackLoop's uLoopPars.dZStep (µm per Z plane) — feeds the
    reader's PhysicalPixelSizes.Z, the same source the reference's
    bioio-nd2 reads Z spacing from."""
    cmap = read_nd2_chunkmap(path)
    if "ImageMetadataLV!" not in cmap:
        return None
    lv = decode_lv(read_nd2_chunk(path, "ImageMetadataLV!",
                                  *cmap["ImageMetadataLV!"]))
    exp = lv.get("SLxExperiment")
    while isinstance(exp, dict) and "eType" in exp:
        pars = exp.get("uLoopPars", {})
        if exp["eType"] == LOOP_ZSTACK and isinstance(pars, dict) \
                and pars.get("dZStep"):
            return float(pars["dZStep"])
        nxt = exp.get("ppNextLevelEx")
        exp = (next(iter(nxt.values()), None)
               if isinstance(nxt, dict) and nxt else None)
    return None


def nd2_seq_coords(kinds: Sequence[tuple[str, int]],
                   seq: int) -> dict[str, int]:
    """Frame sequence index -> {"t": i, "z": j, "p": k} under the
    resolved loop list (outer-to-inner; innermost varies fastest)."""
    idx = []
    rem = seq
    for _, count in reversed(list(kinds)):
        idx.append(rem % count)
        rem //= count
    idx.reverse()
    coords = {"t": 0, "z": 0, "p": 0}
    for (kind, count), i in zip(kinds, idx):
        coords[kind] = coords[kind] * count + i
    return coords


def read_nd2_attributes(path: str) -> dict:
    cmap = read_nd2_chunkmap(path)
    off, size = cmap["ImageAttributesLV!"]
    lv = decode_lv(read_nd2_chunk(path, "ImageAttributesLV!",
                                  off, size))
    return lv["SLxImageAttributes"]


def read_nd2_frame(path: str, seq: int) -> np.ndarray:
    """One ImageDataSeq frame -> (Y, X) or (Y, X, C) ndarray."""
    attrs = read_nd2_attributes(path)
    cmap = read_nd2_chunkmap(path)
    name = f"ImageDataSeq|{seq}!"
    if name not in cmap:
        raise KeyError(f"{path}: no frame {seq}")
    data = read_nd2_chunk(path, name, *cmap[name])
    dt = np.dtype("u1" if attrs["uiBpcInMemory"] == 8 else "<u2")
    w, h, comp = attrs["uiWidth"], attrs["uiHeight"], attrs["uiComp"]
    a = np.frombuffer(data, dtype=dt, offset=8,
                      count=w * h * comp)
    a = a.astype(dt.newbyteorder("="), copy=False)
    return (a.reshape(h, w) if comp == 1
            else a.reshape(h, w, comp))


def decode_nd2(path: str):
    """Whole-file decode -> (T, Y, X[, C]) ndarray + attribute dict."""
    attrs = read_nd2_attributes(path)
    frames = [read_nd2_frame(path, t)
              for t in range(attrs["uiSequenceCount"])]
    return np.stack(frames), attrs
