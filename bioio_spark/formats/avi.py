"""AVI (.avi) RIFF container codec — the video-container row of the
reference's imageio tier (bioio-imageio routes .avi via ffmpeg; ref
README.md:61,83). Layout per the public Microsoft RIFF/AVI
specification:

- ``RIFF('AVI ')`` with a ``LIST('hdrl')`` holding the 56-byte
  ``avih`` MainAVIHeader and one ``LIST('strl')`` per stream
  (``strh`` AVIStreamHeader + ``strf`` BITMAPINFOHEADER for video)
- ``LIST('movi')`` holding ``00db`` (uncompressed DIB) / ``00dc``
  (compressed) frame chunks, word-aligned
- ``idx1`` AVIOLDINDEX: per-frame {ckid, flags, offset, size} — the
  read plan; offsets are relative to the ``movi`` fourcc (absolute
  offsets, written by some muxers, are auto-detected)

Frame codecs implemented: BI_RGB 24-bit DIB (bottom-up BGR rows,
4-byte row padding — bit-exact) and MJPG (one baseline JFIF per frame
via bioio_spark.formats.jpeg — exact on DC-only blocky content, the
img_jpeg_roundtrip rule). Frames map to T; BGR samples to R,G,B
channels.
"""

from __future__ import annotations

import struct

import numpy as np

AVIF_HASINDEX = 0x10
AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def _dib_encode(frame: np.ndarray) -> bytes:
    """(H, W, 3) RGB -> bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = frame.shape
    row_bytes = (w * 3 + 3) & ~3
    out = np.zeros((h, row_bytes), np.uint8)
    out[:, :w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return out.tobytes()


def _dib_decode(data: bytes, w: int, h: int) -> np.ndarray:
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8,
                         count=h * row_bytes).reshape(h, row_bytes)
    return rows[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1]


def encode_avi(frames: np.ndarray, codec: str = "rgb",
               fps: int = 25, quality: int = 95) -> bytes:
    """(T, Y, X, 3) uint8 RGB frames -> .avi bytes. ``codec`` is
    'rgb' (BI_RGB DIB, bit-exact) or 'mjpg' (per-frame baseline
    JFIF)."""
    a = np.asarray(frames)
    if a.ndim != 4 or a.shape[-1] != 3 or a.dtype != np.uint8:
        raise ValueError("encode_avi takes (T, Y, X, 3) uint8 RGB")
    t_n, h, w, _ = a.shape
    if codec == "rgb":
        ckid, compression = b"00db", 0
        payloads = [_dib_encode(a[t]) for t in range(t_n)]
    elif codec == "mjpg":
        from bioio_spark.formats.jpeg import encode_jpeg

        ckid, compression = b"00dc", struct.unpack("<I", b"MJPG")[0]
        payloads = [encode_jpeg(a[t], quality=quality)
                    for t in range(t_n)]
    else:
        raise ValueError(f"unknown AVI codec {codec!r}")

    frame_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0,
        AVIF_HASINDEX, t_n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids"
            + (b"MJPG" if codec == "mjpg" else b"DIB ")
            + struct.pack("<IHHIIIIIIiI4h", 0, 0, 0, 0, 1, fps, 0,
                          t_n, frame_bytes, -1, 0, 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       len(payloads[0]), 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b""
    offsets = []                        # relative to the movi fourcc
    for p in payloads:
        offsets.append(4 + len(movi_body))
        movi_body += _chunk(ckid, p)
    movi = _list(b"movi", movi_body)
    idx = b"".join(
        ckid + struct.pack("<3I", AVIIF_KEYFRAME, off, len(p))
        for off, p in zip(offsets, payloads))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def read_avi_catalog(path: str) -> dict:
    """Driver-side catalog: RIFF walk + idx1 -> per-frame absolute
    byte ranges; no frame IO (D8 contract)."""
    with open(path, "rb") as f:
        head = f.read(12)
        if head[:4] != b"RIFF" or head[8:12] != b"AVI ":
            raise ValueError(f"{path}: not a RIFF/AVI file")
        (riff_size,) = struct.unpack_from("<I", head, 4)
        avih = strh = strf = None
        vid_stream_no = None            # index of the 'vids' strl
        n_strl = 0
        movi_pos = None                 # offset of the 'movi' fourcc
        idx_raw = None

        def walk_strl(start: int, end: int) -> None:
            # one LIST('strl'): capture strh+strf ONLY from the first
            # 'vids' stream — an audio strl before/after the video one
            # must not leak its header (scale/rate) or format block
            nonlocal strh, strf, vid_stream_no, n_strl
            this_no, n_strl = n_strl, n_strl + 1
            pos, s_strh, s_strf = start, None, None
            while pos + 8 <= end:
                f.seek(pos)
                hdr = f.read(8)
                (size,) = struct.unpack_from("<I", hdr, 4)
                if hdr[:4] == b"strh":
                    s_strh = f.read(size)
                elif hdr[:4] == b"strf":
                    s_strf = f.read(size)
                pos += 8 + size + (size & 1)
            if (vid_stream_no is None and s_strh is not None
                    and s_strh[:4] == b"vids"):
                strh, strf, vid_stream_no = s_strh, s_strf, this_no

        def walk(start: int, end: int) -> None:
            nonlocal avih, movi_pos, idx_raw
            pos = start
            while pos + 8 <= end:
                f.seek(pos)
                hdr = f.read(8)
                fourcc = hdr[:4]
                (size,) = struct.unpack_from("<I", hdr, 4)
                if fourcc == b"LIST":
                    ltype = f.read(4)
                    if ltype == b"movi":
                        movi_pos = pos + 8
                    elif ltype == b"strl":
                        walk_strl(pos + 12, pos + 8 + size)
                    else:
                        walk(pos + 12, pos + 8 + size)
                elif fourcc == b"avih":
                    avih = f.read(size)
                elif fourcc == b"idx1":
                    idx_raw = f.read(size)
                pos += 8 + size + (size & 1)

        walk(12, 12 + riff_size - 4)
    if avih is None or strf is None or movi_pos is None:
        raise ValueError(f"{path}: missing avih/vids strl/movi")
    (_uspf, _mbps, _pad, _flags, total_frames, _init, _streams,
     _sbuf, width, height) = struct.unpack_from("<10I", avih, 0)
    (_bisize, bw, bh, _planes, bit_count,
     compression) = struct.unpack_from("<IiiHHI", strf, 0)
    fourcc = struct.pack("<I", compression)
    if compression == 0:
        codec = "rgb"
        if bit_count != 24:
            raise ValueError(f"{path}: BI_RGB bit depth {bit_count} "
                             f"unsupported (24-bit only)")
    elif fourcc == b"MJPG":
        codec = "mjpg"
    else:
        raise ValueError(f"{path}: unsupported AVI codec "
                         f"{fourcc!r} ({compression})")
    scale, rate = (1, 25)
    if strh is not None and len(strh) >= 28:
        scale, rate = struct.unpack_from("<II", strh, 20)
    stream_prefix = b"%02d" % vid_stream_no
    frames = []
    if idx_raw:
        n = len(idx_raw) // 16
        base = movi_pos
        for i in range(n):
            ckid, _fl, off, size = struct.unpack_from(
                "<4s3I", idx_raw, i * 16)
            # only the video stream's chunks: an audio 'NNwb' entry,
            # or another stream's 'NNdb/NNdc', is not a frame
            if ckid[:2] != stream_prefix or ckid[2:4] not in (b"db",
                                                              b"dc"):
                continue
            frames.append((off, size))
        # offsets may be movi-relative (canonical) or absolute (some
        # muxers): detect by checking the first entry lands on its ckid
        if frames:
            with open(path, "rb") as f:
                f.seek(base + frames[0][0])
                rel_ok = f.read(2) == stream_prefix
                f.seek(frames[0][0])
                abs_ok = f.read(2) == stream_prefix
            shift = base if rel_ok else (0 if abs_ok else None)
            if shift is None:
                raise ValueError(f"{path}: idx1 offsets resolve "
                                 f"nowhere")
            frames = [(shift + off + 8, size) for off, size in frames]
    if not frames:
        raise ValueError(f"{path}: no frame entries in idx1")
    if total_frames and len(frames) != total_frames:
        raise ValueError(f"{path}: idx1 lists {len(frames)} frames, "
                         f"avih declares {total_frames}")
    return {
        "width": int(bw or width), "height": int(abs(bh) or height),
        "n_frames": len(frames), "codec": codec,
        # BI_RGB with biHeight < 0 is a TOP-DOWN DIB (rows already in
        # raster order — decode must NOT mirror them)
        "topdown": bool(bh < 0),
        "time_interval": (scale / rate) if rate else None,
        "frames": frames,               # absolute (offset, size)
    }


def decode_avi_frame(data: bytes, codec: str, w: int, h: int,
                     topdown: bool = False) -> np.ndarray:
    """One frame chunk payload -> (H, W, 3) uint8 RGB."""
    if codec == "rgb":
        img = _dib_decode(data, w, h)
        return img[::-1] if topdown else img
    from bioio_spark.formats.jpeg import decode_jpeg

    img = decode_jpeg(data)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img


def decode_avi(path: str) -> np.ndarray:
    """Whole-file eager decode -> (T, Y, X, 3) uint8 (test path)."""
    cat = read_avi_catalog(path)
    out = np.zeros((cat["n_frames"], cat["height"], cat["width"], 3),
                   np.uint8)
    with open(path, "rb") as f:
        for t, (off, size) in enumerate(cat["frames"]):
            f.seek(off)
            out[t] = decode_avi_frame(f.read(size), cat["codec"],
                                      cat["width"], cat["height"],
                                      cat["topdown"])
    return out
