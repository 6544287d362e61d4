"""RIFF/WAVE PCM codec (the real-audio twin of the PNG/JPEG tiers)."""

import numpy as np
import pytest

from bioio_spark.formats.wav import decode_wav, encode_wav


def test_mono_uint8_roundtrip():
    s = (np.arange(800) % 251).astype(np.uint8)
    back, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and back.shape == (1, 800)
    np.testing.assert_array_equal(back[0], s)


def test_stereo_int16_roundtrip():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, (2, 500), dtype=np.int16)
    back, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and back.shape == (2, 500)
    np.testing.assert_array_equal(back, s)


def test_skips_unknown_chunks():
    import struct

    s = np.arange(10, dtype=np.uint8)
    data = bytearray(encode_wav(s))
    # splice a LIST chunk between fmt and data
    i = data.find(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    data[i:i] = extra
    data[4:8] = struct.pack("<I", len(data) - 8)
    back, _ = decode_wav(bytes(data))
    np.testing.assert_array_equal(back[0], s)


def test_rejects_non_pcm_and_garbage():
    import struct

    s = np.zeros(4, dtype=np.uint8)
    data = bytearray(encode_wav(s))
    i = data.find(b"fmt ") + 8
    data[i:i + 2] = struct.pack("<H", 3)      # IEEE float tag
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav")
    with pytest.raises(ValueError, match="uint8/int16"):
        encode_wav(np.zeros(4, dtype=np.float32))


def test_autocodec_sniffs_wav():
    from bioio_spark.functions.multimodal import AutoCodec, WavCodec

    payload = WavCodec.encode(5, "audio", 800, 1, 1)
    out = AutoCodec.decode(payload)
    assert out.shape == (1, 1, 800)
    want = ((np.arange(800, dtype=np.int64) * 31 + 35) % 251)
    np.testing.assert_array_equal(out[0, 0], want.astype(np.uint8))
