"""MP4 (.mp4/.mov) ISO Base Media File Format codec — the remaining
video-container rows of the reference's imageio tier (bioio-imageio
routes .mp4/.mov via ffmpeg; ref README.md:61,82). Layout per the
public ISO/IEC 14496-12 specification:

- ``ftyp`` brand box, ``mdat`` holding the sample bytes, ``moov``
  with ``mvhd`` + one video ``trak`` (``tkhd``, ``mdia`` →
  ``mdhd``/``hdlr``/``minf`` → ``stbl``)
- the sample table IS the read plan: ``stsz`` sample sizes +
  ``stco``/``co64`` chunk offsets + ``stsc`` sample-to-chunk runs
  resolve every frame to an absolute (offset, nbytes) without
  touching ``mdat`` (the D8 contract); ``stts``/``mdhd`` give the
  frame interval

Sample codec: ``jpeg`` VisualSampleEntry (Motion-JPEG in BMFF — one
baseline JFIF per sample, via bioio_spark.formats.jpeg; exact on
DC-only blocky content, the img_jpeg_roundtrip rule). Frames map to
T; samples to R,G,B channels. AVC/HEVC tracks raise with a clear
message.
"""

from __future__ import annotations

import struct

import numpy as np


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int,
          payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags)
                + payload)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)


def _sample_entry_jpeg(w: int, h: int) -> bytes:
    name = b"\x0bMotion-JPEG".ljust(32, b"\x00")   # pascal string
    body = (b"\x00" * 6 + struct.pack(">H", 1)     # data_ref_index
            + struct.pack(">HH3I", 0, 0, 0, 0, 0)
            + struct.pack(">HH", w, h)
            + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
            + name + struct.pack(">Hh", 24, -1))
    return _box(b"jpeg", body)


def encode_mp4(frames: np.ndarray, fps: int = 25,
               quality: int = 95) -> bytes:
    """(T, Y, X, 3) uint8 RGB frames -> .mp4 bytes (Motion-JPEG
    track, one chunk per sample, progressive ftyp+mdat+moov)."""
    from bioio_spark.formats.jpeg import encode_jpeg

    a = np.asarray(frames)
    if a.ndim != 4 or a.shape[-1] != 3 or a.dtype != np.uint8:
        raise ValueError("encode_mp4 takes (T, Y, X, 3) uint8 RGB")
    t_n, h, w, _ = a.shape
    payloads = [encode_jpeg(a[t], quality=quality) for t in range(t_n)]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"mp41")
    mdat_body = b"".join(payloads)
    offsets = []
    pos = len(ftyp) + 8
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    mdat = _box(b"mdat", mdat_body)

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, fps, t_n)
        + struct.pack(">iH", 0x00010000, 0) + b"\x00" * 10 + _MATRIX
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, t_n) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, fps, t_n, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _sample_entry_jpeg(w, h))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, t_n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, t_n)
                 + b"".join(struct.pack(">I", len(p))
                            for p in payloads))
    stco = _full(b"stco", 0, 0, struct.pack(">I", t_n)
                 + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                       # 64-bit largesize
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:                     # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("corrupt MP4 box size")
        yield typ, body, pos + size
        pos += size


def _child(buf, start, end, typ):
    for t, b, e in _boxes(buf, start, end):
        if t == typ:
            return b, e
    return None


def _top_level_box(f, want: bytes):
    """Seek-walk the top-level boxes and return ONLY `want`'s payload
    bytes — mdat (the sample data, arbitrarily large) is skipped with
    a seek, never read (the D8 contract; moov is a few KB)."""
    f.seek(0, 2)
    file_end = f.tell()
    pos = 0
    while pos + 8 <= file_end:
        f.seek(pos)
        hdr = f.read(8)
        if len(hdr) < 8:
            break
        (size,) = struct.unpack(">I", hdr[:4])
        typ = hdr[4:8]
        body = pos + 8
        if size == 1:                       # 64-bit largesize
            (size,) = struct.unpack(">Q", f.read(8))
            body = pos + 16
        elif size == 0:                     # to end of file
            size = file_end - pos
        if size < 8 or pos + size > file_end:
            raise ValueError("corrupt MP4 box size")
        if typ == want:
            f.seek(body)
            return f.read(pos + size - body)
        pos += size
    return None


def read_mp4_catalog(path: str) -> dict:
    """Driver-side catalog: seek-based top-level box walk reading only
    the moov payload + sample-table parse -> per-frame absolute byte
    ranges; mdat is never read (D8)."""
    with open(path, "rb") as f:
        head = f.read(8)
        if len(head) < 8 or head[4:8] not in (b"ftyp", b"moov",
                                              b"mdat", b"free",
                                              b"wide", b"skip"):
            raise ValueError(f"{path}: not an ISO BMFF (MP4) file")
        buf = _top_level_box(f, b"moov")
    if buf is None:
        raise ValueError(f"{path}: no moov box")

    video = None
    for t, b, e in _boxes(buf, 0, len(buf)):
        if t != b"trak":
            continue
        mdia = _child(buf, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _child(buf, *mdia, b"hdlr")
        if hdlr is None or buf[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        video = (b, e, mdia)
        break
    if video is None:
        raise ValueError(f"{path}: no video track")
    _tb, _te, mdia = video
    mdhd = _child(buf, *mdia, b"mdhd")
    minf = _child(buf, *mdia, b"minf")
    if minf is None:
        raise ValueError(f"{path}: video trak missing minf box")
    stbl = _child(buf, *minf, b"stbl")
    if stbl is None:
        raise ValueError(f"{path}: video trak missing stbl box")
    tabs = {}
    for t, b, e in _boxes(buf, *stbl):
        tabs[t] = (b, e)
    for need in (b"stsd", b"stsz", b"stsc"):
        if need not in tabs:
            raise ValueError(f"{path}: missing {need.decode()} box")
    if b"stco" not in tabs and b"co64" not in tabs:
        raise ValueError(f"{path}: missing stco/co64 box")

    # stsd: codec + dimensions
    sb = tabs[b"stsd"][0]
    (entry_count,) = struct.unpack_from(">I", buf, sb + 4)
    if entry_count < 1:
        raise ValueError(f"{path}: empty stsd")
    fourcc = buf[sb + 12:sb + 16]
    if fourcc not in (b"jpeg", b"mjpa"):
        raise ValueError(
            f"{path}: unsupported MP4 sample codec "
            f"{fourcc.decode('latin1')!r} (jpeg/mjpa Motion-JPEG "
            f"only; AVC/HEVC need an ffmpeg-tier decoder)")
    se = sb + 16                            # VisualSampleEntry body
    w, h = struct.unpack_from(">HH", buf, se + 8 + 16)

    # mdhd: timescale + stts delta -> frame interval
    timescale = duration = None
    if mdhd is not None:
        version = buf[mdhd[0]]
        if version == 1:
            timescale, duration = struct.unpack_from(
                ">IQ", buf, mdhd[0] + 4 + 16)
        else:
            timescale, duration = struct.unpack_from(
                ">II", buf, mdhd[0] + 4 + 8)
    delta = None
    if b"stts" in tabs:
        (n_ent,) = struct.unpack_from(">I", buf, tabs[b"stts"][0] + 4)
        if n_ent >= 1:
            _cnt, delta = struct.unpack_from(
                ">II", buf, tabs[b"stts"][0] + 8)

    # stsz sample sizes
    zb = tabs[b"stsz"][0]
    fixed, n_samples = struct.unpack_from(">II", buf, zb + 4)
    sizes = ([fixed] * n_samples if fixed else
             list(struct.unpack_from(f">{n_samples}I", buf, zb + 12)))

    # chunk offsets (stco 32-bit / co64 64-bit)
    if b"stco" in tabs:
        cb = tabs[b"stco"][0]
        (n_chunks,) = struct.unpack_from(">I", buf, cb + 4)
        chunk_offs = struct.unpack_from(f">{n_chunks}I", buf, cb + 8)
    else:
        cb = tabs[b"co64"][0]
        (n_chunks,) = struct.unpack_from(">I", buf, cb + 4)
        chunk_offs = struct.unpack_from(f">{n_chunks}Q", buf, cb + 8)

    # stsc runs -> samples per chunk
    scb = tabs[b"stsc"][0]
    (n_runs,) = struct.unpack_from(">I", buf, scb + 4)
    runs = [struct.unpack_from(">III", buf, scb + 8 + 12 * i)
            for i in range(n_runs)]         # (first_chunk, spc, sdi)
    frames = []
    si = 0
    for ri, (first, spc, _sdi) in enumerate(runs):
        last = (runs[ri + 1][0] - 1 if ri + 1 < len(runs)
                else n_chunks)
        for ci in range(first - 1, last):
            off = chunk_offs[ci]
            for _ in range(spc):
                if si >= n_samples:
                    break
                frames.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si != n_samples:
        raise ValueError(f"{path}: stsc maps {si} of {n_samples} "
                         f"samples to chunks")
    return {
        "width": int(w), "height": int(h),
        "n_frames": n_samples, "codec": "jpeg",
        "time_interval": (delta / timescale
                          if delta and timescale else None),
        "frames": frames,                   # absolute (offset, size)
    }


def decode_mp4_frame(data: bytes, w: int, h: int) -> np.ndarray:
    """One sample's bytes -> (H, W, 3) uint8 RGB."""
    from bioio_spark.formats.jpeg import decode_jpeg

    img = decode_jpeg(data)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img


def decode_mp4(path: str) -> np.ndarray:
    """Whole-file eager decode -> (T, Y, X, 3) uint8 (test path)."""
    cat = read_mp4_catalog(path)
    out = np.zeros((cat["n_frames"], cat["height"], cat["width"], 3),
                   np.uint8)
    with open(path, "rb") as f:
        for t, (off, size) in enumerate(cat["frames"]):
            f.seek(off)
            out[t] = decode_mp4_frame(f.read(size), cat["width"],
                                      cat["height"])
    return out
