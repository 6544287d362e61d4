"""Pure-Python NetPBM codec (PGM/PPM, the P2/P3 ASCII and P5/P6 binary
forms) — imageio-tier surface (ref README.md:61 full-list link). The
format is an open one-page spec: magic, whitespace/comment-separated
width height maxval, then samples — ASCII decimals or big-endian
binary (1 byte up to maxval 255, 2 bytes above, per the spec)."""

from __future__ import annotations

import re

import numpy as np

_MAGIC_GRAY = (b"P2", b"P5")
_MAGIC_RGB = (b"P3", b"P6")


def decode_pnm(data: bytes) -> np.ndarray:
    """PGM -> (H, W), PPM -> (H, W, 3); uint8 (maxval <= 255) or uint16
    (stored big-endian two-byte samples)."""
    magic = data[:2]
    if magic not in _MAGIC_GRAY + _MAGIC_RGB:
        raise ValueError(f"not a PGM/PPM file (magic {magic!r})")
    binary = magic in (b"P5", b"P6")
    samples = 3 if magic in _MAGIC_RGB else 1
    # header tokens: width height maxval, with '#' comments to EOL
    pos, vals = 2, []
    while len(vals) < 3:
        m = re.match(rb"(?:\s+|#[^\n]*\n)*(\d+)", data[pos:])
        if not m:
            raise ValueError("truncated PGM/PPM header")
        vals.append(int(m.group(1)))
        pos += m.end()
    w, h, maxval = vals
    if not 0 < maxval < 65536:
        raise ValueError(f"bad PGM/PPM maxval {maxval}")
    n = w * h * samples
    if binary:
        pos += 1                       # single whitespace after maxval
        dt = np.dtype(">u2" if maxval > 255 else "u1")
        arr = np.frombuffer(data, dtype=dt, count=n, offset=pos)
        arr = arr.astype(dt.newbyteorder("="))
    else:
        toks = re.split(rb"(?:\s|#[^\n]*\n)+", data[pos:].strip())
        if len(toks) < n:
            raise ValueError(
                f"PGM/PPM body has {len(toks)} samples, need {n}")
        dt = np.dtype("u2" if maxval > 255 else "u1")
        arr = np.array([int(t) for t in toks[:n]], dtype=dt)
    shape = (h, w) if samples == 1 else (h, w, 3)
    return arr.reshape(shape)


def encode_pnm(img: np.ndarray, ascii_form: bool = False) -> bytes:
    """(H, W) -> PGM, (H, W, 3) -> PPM; uint8 or uint16 (binary form
    stores 16-bit samples big-endian per the spec)."""
    a = np.asarray(img)
    if a.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"PGM/PPM encodes uint8/uint16, got {a.dtype}")
    if a.ndim == 2:
        magic = b"P2" if ascii_form else b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P3" if ascii_form else b"P6"
    else:
        raise ValueError(
            f"PGM/PPM encodes HxW or HxWx3, got shape {a.shape}")
    maxval = 255 if a.dtype == np.uint8 else 65535
    head = b"%s\n%d %d\n%d\n" % (magic, a.shape[1], a.shape[0], maxval)
    if ascii_form:
        return head + b" ".join(
            b"%d" % v for v in a.ravel()) + b"\n"
    if a.dtype == np.uint16:
        a = a.astype(">u2")
    return head + np.ascontiguousarray(a).tobytes()
