"""MKV (.mkv) Matroska/EBML container codec — the last video-container
row of the reference's imageio tier (bioio-imageio routes .mkv via
ffmpeg; ref README.md:82). Layout per the public EBML (RFC 8794) and
Matroska specifications:

- EBML header (DocType ``matroska``) + ``Segment`` holding ``Info``
  (TimestampScale), ``Tracks`` (one video TrackEntry: CodecID
  ``V_MJPEG``, PixelWidth/Height, DefaultDuration) and one ``Cluster``
  per frame (Timestamp + SimpleBlock)
- the Cluster walk IS the read plan: each SimpleBlock resolves to an
  absolute (offset, nbytes) of its JFIF payload without decoding
  anything (the D8 contract); DefaultDuration gives the frame interval

Sample codec: ``V_MJPEG`` — one baseline JFIF per SimpleBlock via
bioio_spark.formats.jpeg (exact on DC-only blocky content, the
img_jpeg_roundtrip rule). Frames map to T; samples to R,G,B channels.
AVC/HEVC/VP9 tracks raise with a clear message. Lacing is not written
and rejected on read (one frame per SimpleBlock keeps the plan
byte-range-exact).
"""

from __future__ import annotations

import struct

import numpy as np

# EBML / Matroska element IDs (with marker bits, as they appear on disk)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_DOCTYPE = 0x4282
_EBML_SUB = (0x4286, 0x42F7, 0x42F2, 0x42F3, 0x4287, 0x4285)


def _id_bytes(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint(value: int) -> bytes:
    """EBML size VINT: length marker in the leading bits."""
    for n in range(1, 9):
        if value < (1 << (7 * n)) - 1:      # all-ones is reserved
            return ((1 << (7 * n)) | value).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + _vint(len(payload)) + payload


def _uint(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


def encode_mkv(frames: np.ndarray, fps: int = 25,
               quality: int = 95) -> bytes:
    """(T, Y, X, 3) uint8 RGB frames -> .mkv bytes (V_MJPEG track,
    one Cluster+SimpleBlock per frame, millisecond timestamps)."""
    from bioio_spark.formats.jpeg import encode_jpeg

    a = np.asarray(frames)
    if a.ndim != 4 or a.shape[-1] != 3 or a.dtype != np.uint8:
        raise ValueError("encode_mkv takes (T, Y, X, 3) uint8 RGB")
    t_n, h, w, _ = a.shape

    head = _elem(_EBML, b"".join(
        [_uint(_EBML_SUB[0], 1), _uint(_EBML_SUB[1], 1),
         _uint(_EBML_SUB[2], 4), _uint(_EBML_SUB[3], 8),
         _elem(_DOCTYPE, b"matroska"),
         _uint(_EBML_SUB[4], 4), _uint(_EBML_SUB[5], 2)]))

    info = _elem(_INFO, b"".join(
        [_uint(_TIMESTAMP_SCALE, 1_000_000),        # 1 ms units
         _elem(_MUXING_APP, b"bioio_spark"),
         _elem(_WRITING_APP, b"bioio_spark"),
         _elem(_DURATION, struct.pack(
             ">d", t_n * 1000.0 / fps))]))
    video = _elem(_VIDEO, _uint(_PIXEL_WIDTH, w)
                  + _uint(_PIXEL_HEIGHT, h))
    track = _elem(_TRACK_ENTRY, b"".join(
        [_uint(_TRACK_NUMBER, 1), _uint(_TRACK_UID, 1),
         _uint(_TRACK_TYPE, 1),                     # video
         _elem(_CODEC_ID, b"V_MJPEG"),
         _uint(_DEFAULT_DURATION, round(1e9 / fps)), video]))
    tracks = _elem(_TRACKS, track)

    clusters = b""
    for t in range(t_n):
        payload = encode_jpeg(a[t], quality=quality)
        block = _elem(_SIMPLE_BLOCK,
                      _vint(1)                      # track number
                      + struct.pack(">h", 0)        # rel timestamp
                      + b"\x80"                     # keyframe, no lace
                      + payload)
        clusters += _elem(_CLUSTER,
                          _uint(_CLUSTER_TS, round(t * 1000 / fps))
                          + block)
    return head + _elem(_SEGMENT, info + tracks + clusters)


def _read_id(buf: bytes, pos: int) -> tuple:
    b0 = buf[pos]
    for n in range(1, 5):
        if b0 & (0x80 >> (n - 1)):
            return int.from_bytes(buf[pos:pos + n], "big"), pos + n
    raise ValueError(f"bad EBML id at offset {pos}")


def _read_size(buf: bytes, pos: int) -> tuple:
    b0 = buf[pos]
    for n in range(1, 9):
        if b0 & (0x80 >> (n - 1)):
            raw = int.from_bytes(buf[pos:pos + n], "big")
            val = raw & ((1 << (7 * n)) - 1)
            if val == (1 << (7 * n)) - 1:   # unknown size
                val = None
            return val, pos + n
    raise ValueError(f"bad EBML size at offset {pos}")


# elements a Cluster may contain (Matroska spec): Timestamp,
# SimpleBlock, BlockGroup, SilentTracks, Position, PrevSize, EncryptedBlock,
# plus Void/CRC-32 — used to terminate UNKNOWN-SIZE clusters
_CLUSTER_CHILDREN = {_CLUSTER_TS, _SIMPLE_BLOCK, 0xA0, 0x5854, 0xA7,
                     0xAB, 0xAF, 0xEC, 0xBF}


def _unknown_cluster_end(buf, start: int, end: int) -> int:
    """End of an unknown-size Cluster per the EBML rule: it runs until
    the first element that is not a valid Cluster child (e.g. the next
    Cluster or any other level-1 element) — the shape live muxers
    (streamed Matroska) produce."""
    pos = start
    while pos < end:
        try:
            eid, p_sz = _read_id(buf, pos)
            size, p_body = _read_size(buf, p_sz)
        except (ValueError, IndexError):
            break
        if (eid not in _CLUSTER_CHILDREN or size is None
                or p_body + size > end):
            break
        pos = p_body + size
    return pos


def _children(buf: bytes, start: int, end: int):
    """Yield (id, payload_start, payload_end) for sibling elements.
    Unknown-size elements: a Segment (or any non-Cluster master) runs
    to the parent's end; an unknown-size CLUSTER ends at its first
    non-Cluster-child sibling, so the following Clusters stay visible
    as siblings instead of being silently swallowed."""
    pos = start
    while pos < end:
        eid, pos = _read_id(buf, pos)
        size, pos = _read_size(buf, pos)
        if size is None:
            if eid == _CLUSTER:
                elem_end = _unknown_cluster_end(buf, pos, end)
                yield eid, pos, elem_end
                pos = elem_end
                continue
            size = end - pos                # unknown size: to parent end
        if pos + size > end:
            raise ValueError("corrupt EBML element size")
        yield eid, pos, pos + size
        pos += size


def _child(buf, start, end, eid):
    for i, b, e in _children(buf, start, end):
        if i == eid:
            return b, e
    return None


def _get_uint(buf, span) -> int:
    b, e = span
    return int.from_bytes(buf[b:e], "big")


def read_mkv_catalog(path: str) -> dict:
    """Driver-side catalog: EBML header + Segment walk -> per-frame
    absolute byte ranges; SimpleBlock payloads are never read (D8)."""
    import mmap

    with open(path, "rb") as f:
        try:
            # memory-map instead of read(): the walk touches only
            # element headers, so cluster/block payloads are never
            # paged in — cataloging a multi-GB file reads a few KB
            buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:
            raise ValueError(f"{path}: not an EBML (MKV) file")
    if buf[:4] != _id_bytes(_EBML):
        raise ValueError(f"{path}: not an EBML (MKV) file")
    top = list(_children(buf, 0, len(buf)))
    head = next((s for i, *s in top if i == _EBML), None)
    seg = next((s for i, *s in top if i == _SEGMENT), None)
    if head is None or seg is None:
        raise ValueError(f"{path}: missing EBML header or Segment")
    doctype = _child(buf, *head, _DOCTYPE)
    if doctype is None or buf[doctype[0]:doctype[1]] not in (
            b"matroska", b"webm"):
        raise ValueError(f"{path}: not a Matroska DocType")

    timescale = 1_000_000
    info = _child(buf, *seg, _INFO)
    if info is not None:
        ts = _child(buf, *info, _TIMESTAMP_SCALE)
        if ts is not None:
            timescale = _get_uint(buf, ts)

    tracks = _child(buf, *seg, _TRACKS)
    if tracks is None:
        raise ValueError(f"{path}: no Tracks element")
    video = None
    for i, b, e in _children(buf, *tracks):
        if i != _TRACK_ENTRY:
            continue
        tt = _child(buf, b, e, _TRACK_TYPE)
        if tt is None or _get_uint(buf, tt) != 1:
            continue
        video = (b, e)
        break
    if video is None:
        raise ValueError(f"{path}: no video track")
    codec = _child(buf, *video, _CODEC_ID)
    codec_id = buf[codec[0]:codec[1]] if codec else b""
    if codec_id != b"V_MJPEG":
        raise ValueError(
            f"{path}: unsupported MKV codec "
            f"{codec_id.decode('latin1')!r} (V_MJPEG only; "
            f"AVC/HEVC/VP9 need an ffmpeg-tier decoder)")
    tn_span = _child(buf, *video, _TRACK_NUMBER)
    track_no = _get_uint(buf, tn_span) if tn_span else 1
    vid = _child(buf, *video, _VIDEO)
    if vid is None:
        raise ValueError(f"{path}: video track has no Video element")
    pw = _child(buf, *vid, _PIXEL_WIDTH)
    ph = _child(buf, *vid, _PIXEL_HEIGHT)
    if pw is None or ph is None:
        raise ValueError(f"{path}: Video element missing "
                         "PixelWidth/PixelHeight")
    w = _get_uint(buf, pw)
    h = _get_uint(buf, ph)
    dd = _child(buf, *video, _DEFAULT_DURATION)
    time_interval = (_get_uint(buf, dd) / 1e9) if dd else None

    frames = []
    for i, b, e in _children(buf, *seg):
        if i != _CLUSTER:
            continue
        for j, bb, be in _children(buf, b, e):
            if j != _SIMPLE_BLOCK:
                continue
            # varint track number + 2-byte rel ts + flags, then data
            tno, pos = _read_size(buf, bb)
            if tno != track_no:
                continue
            flags = buf[pos + 2]
            if flags & 0x06:
                raise ValueError(f"{path}: laced SimpleBlocks "
                                 f"unsupported")
            frames.append((pos + 3, be - (pos + 3)))
    if not frames:
        raise ValueError(f"{path}: no SimpleBlocks for the video "
                         f"track")
    del timescale                           # ms-unit default; DD is ns
    return {
        "width": int(w), "height": int(h),
        "n_frames": len(frames), "codec": "mjpeg",
        "time_interval": time_interval,
        "frames": frames,                   # absolute (offset, size)
    }


def decode_mkv_frame(data: bytes, w: int, h: int) -> np.ndarray:
    """One SimpleBlock payload -> (H, W, 3) uint8 RGB."""
    from bioio_spark.formats.jpeg import decode_jpeg

    img = decode_jpeg(data)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img


def decode_mkv(path: str) -> np.ndarray:
    """Whole-file eager decode -> (T, Y, X, 3) uint8 (test path)."""
    cat = read_mkv_catalog(path)
    out = np.zeros((cat["n_frames"], cat["height"], cat["width"], 3),
                   np.uint8)
    with open(path, "rb") as f:
        for t, (off, size) in enumerate(cat["frames"]):
            f.seek(off)
            out[t] = decode_mkv_frame(f.read(size), cat["width"],
                                      cat["height"])
    return out
