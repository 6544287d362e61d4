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
    data[i:i + 2] = struct.pack("<H", 2)      # ADPCM: out of scope
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav")
    with pytest.raises(ValueError, match="uint8/int16"):
        encode_wav(np.zeros(4, dtype=np.complex64))


def test_autocodec_sniffs_wav():
    from bioio_spark.functions.multimodal import AutoCodec, WavCodec

    payload = WavCodec.encode(5, "audio", 800, 1, 1)
    out = AutoCodec.decode(payload)
    assert out.shape == (1, 1, 800)
    want = ((np.arange(800, dtype=np.int64) * 31 + 35) % 251)
    np.testing.assert_array_equal(out[0, 0], want.astype(np.uint8))


@pytest.mark.parametrize("dtype", [np.int32, np.float32, np.float64])
def test_wide_pcm_and_float_roundtrip(dtype):
    from bioio_spark.formats.wav import decode_wav, encode_wav

    rng = np.random.default_rng(89)
    if dtype == np.int32:
        a = rng.integers(-2**31, 2**31 - 1, (2, 300)).astype(dtype)
    else:
        a = (rng.random((2, 300)) * 2 - 1).astype(dtype)
    out, rate = decode_wav(encode_wav(a, 44100))
    assert rate == 44100 and out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, a)


def test_24bit_pcm_decode():
    """24-bit PCM (the studio-standard depth): hand-packed 3-byte LE
    samples incl. negatives widen to sign-extended int32."""
    import struct

    from bioio_spark.formats.wav import decode_wav

    vals = [0, 1, -1, 8388607, -8388608, 123456, -654321]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
            + (b"\x00" if len(raw) % 2 else b""))
    out, rate = decode_wav(data)
    assert rate == 48000
    np.testing.assert_array_equal(out[0], np.array(vals, np.int32))


def test_extensible_header_decodes():
    """WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) with a PCM SubFormat — how
    pro-audio tools write >2-channel or >16-bit files."""
    import struct

    from bioio_spark.formats.wav import decode_wav

    a = np.array([[100, -200, 300, -400]], np.int16)
    raw = a.T.astype("<i2").tobytes()
    sub = struct.pack("<H", 1) + bytes(14)       # PCM GUID head
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
           + struct.pack("<HHI", 22, 16, 0x4) + sub)
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    out, rate = decode_wav(data)
    np.testing.assert_array_equal(out, a)
