"""Pure-Python RIFF/WAVE PCM codec (stdlib struct + numpy).

The real-audio twin of the in-repo PNG/JPEG image codecs: multimodal
audio rows carry actual WAV files, so the decode path in the training
pipeline exercises a genuine container. Scope: PCM (format tag 1),
8-bit unsigned / 16-bit signed, any channel count, unknown RIFF chunks
(LIST/fact/...) skipped per the spec.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode samples as PCM WAV. `samples` is (n,) mono or
    (channels, n); uint8 maps to 8-bit unsigned PCM, int16 to 16-bit
    signed PCM."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[None, :]
    if a.ndim != 2:
        raise ValueError(f"samples must be (n,) or (channels, n), "
                         f"got shape {a.shape}")
    channels, n = a.shape
    if a.dtype == np.uint8:
        bits = 8
        payload = np.ascontiguousarray(a.T)        # interleave frames
    elif a.dtype == np.int16:
        bits = 16
        payload = np.ascontiguousarray(a.T.astype("<i2"))
    else:
        raise ValueError(f"PCM WAV supports uint8/int16, got {a.dtype}")
    data = payload.tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        out += b"\x00"                              # RIFF chunk padding
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV -> ((channels, n) ndarray, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln % 2)                    # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunks")
    tag, channels, rate, _, _, bits = fmt
    if tag != 1:
        raise ValueError(f"only PCM WAV supported (format tag {tag})")
    if bits == 8:
        arr = np.frombuffer(raw, dtype=np.uint8)
    elif bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    n = len(arr) // channels
    return arr[:n * channels].reshape(n, channels).T.copy(), rate
