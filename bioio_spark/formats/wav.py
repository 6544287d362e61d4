"""Pure-Python RIFF/WAVE PCM codec (stdlib struct + numpy).

The real-audio twin of the in-repo PNG/JPEG image codecs: multimodal
audio rows carry actual WAV files, so the decode path in the training
pipeline exercises a genuine container. Scope: PCM (format tag 1:
8-bit unsigned / 16-, 24-, 32-bit signed), IEEE float (tag 3: 32/64
bit), WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE with a PCM/float SubFormat),
any channel count, unknown RIFF chunks (LIST/fact/...) skipped per the
spec. The encoder writes tags 1 and 3.
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
    tag = 1
    if a.dtype == np.uint8:
        bits = 8
        payload = np.ascontiguousarray(a.T)        # interleave frames
    elif a.dtype == np.int16:
        bits = 16
        payload = np.ascontiguousarray(a.T.astype("<i2"))
    elif a.dtype == np.int32:
        bits = 32
        payload = np.ascontiguousarray(a.T.astype("<i4"))
    elif a.dtype == np.float32:
        tag, bits = 3, 32                           # IEEE float
        payload = np.ascontiguousarray(a.T.astype("<f4"))
    elif a.dtype == np.float64:
        tag, bits = 3, 64
        payload = np.ascontiguousarray(a.T.astype("<f8"))
    else:
        raise ValueError("PCM WAV supports uint8/int16/int32/"
                         f"float32/float64, got {a.dtype}")
    data = payload.tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", tag, channels, sample_rate,
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
    ext = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln % 2)                    # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            # extensible headers: cbSize(2) + validbits(2) + mask(4) +
            # SubFormat GUID(16) after the 16 PCM bytes
            ext = body[18:] if len(body) > 18 else None
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunks")
    tag, channels, rate, _, _, bits = fmt[:6]
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real codec sits in the SubFormat
        # GUID's leading 2 bytes (after cbSize + valid-bits + mask)
        # ext = validBitsPerSample(2) + channelMask(4) + SubFormat(16)
        if ext is None or len(ext) < 8:
            raise ValueError("extensible WAV missing its SubFormat")
        (tag,) = struct.unpack("<H", ext[6:8])
    if tag == 1:
        if bits == 8:
            arr = np.frombuffer(raw, dtype=np.uint8)
        elif bits == 16:
            arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
        elif bits == 24:
            # 3-byte little-endian signed: widen to int32 w/ sign extend
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[:len(b) - len(b) % 3].reshape(-1, 3).astype(np.uint32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            arr = v.astype(np.int32)
            arr[v >= (1 << 23)] -= 1 << 24
        elif bits == 32:
            arr = np.frombuffer(raw, dtype="<i4").astype(np.int32)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:
        if bits == 32:
            arr = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits == 64:
            arr = np.frombuffer(raw, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    n = len(arr) // channels
    return arr[:n * channels].reshape(n, channels).T.copy(), rate
