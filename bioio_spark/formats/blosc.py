"""Pure-Python Blosc1 container codec — the compressor wild Zarr v2 /
OME-NGFF 0.4 stores actually use (zarr-python 2's DEFAULT compressor is
``Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)``; the reference's
bioio-ome-zarr plugin reads such stores via numcodecs). Implemented
from the published c-blosc format documentation (c-blosc
``README_HEADER.rst`` and the blosc.c block/split semantics):

- 16-byte header: ``version | versionlz | flags | typesize`` then
  little-endian int32 ``nbytes`` (uncompressed), ``blocksize``,
  ``cbytes`` (total compressed frame size).
- ``flags``: bit 0 byte-shuffle, bit 1 pure memcpy, bit 2 bitshuffle,
  bits 5-7 the inner codec (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib,
  4 zstd).
- memcpy frames carry the raw bytes right after the header.
- Otherwise an int32 offset table (``bstarts``, one absolute offset
  per block, nblocks = ceil(nbytes/blocksize)) precedes the blocks.
- Each block is a sequence of SPLITS. Per c-blosc 1.x
  ``split_block``: nsplits = typesize when the codec is blosclz or
  lz4, typesize <= 16 (MAX_SPLITS) and blocksize/typesize >= 128
  (MIN_BUFFERSIZE); else 1. Each split = int32 csize + payload; a
  csize equal to the split's uncompressed size marks a stored-raw
  split (c-blosc never emits compressed data of exactly that size).
- Byte-shuffle operates PER BLOCK: element bytes transpose into
  typesize byte planes (with typesize splits, each split is one byte
  plane); unshuffle runs after split reassembly.

Inner codecs route through battle-tested libraries: lz4 BLOCK format /
snappy / zstd via pyarrow's bundled codecs, zlib via the stdlib.
blosclz (c-blosc's own LZ77, rare as a Zarr cname) and bitshuffle
raise a clear error rather than risking a silently-wrong hand-rolled
decode.

Scale note: a Blosc frame is one Zarr chunk — decode happens
executor-side inside the chunk task, so wild-store reads keep the
planned zero-shuffle shape of the plain-zlib path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_VERSION_FORMAT = 2            # BLOSC_VERSION_FORMAT (blosc1)
_MAX_SPLITS = 16
_MIN_BUFFERSIZE = 128

_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPY = 0x2
_FLAG_BITSHUFFLE = 0x4

#: flags bits 5-7 -> codec name (c-blosc compressor format codes)
CODEC_OF_CODE = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib",
                 4: "zstd"}
CODE_OF_CNAME = {"blosclz": 0, "lz4": 1, "lz4hc": 1, "snappy": 2,
                 "zlib": 3, "zstd": 4}


def _pa_codec(name: str):
    import pyarrow as pa
    return pa.Codec(name)


def _inner_compress(codec: int, raw: bytes, clevel: int) -> bytes:
    if codec == 1:
        return _pa_codec("lz4_raw").compress(raw, asbytes=True)
    if codec == 2:
        return _pa_codec("snappy").compress(raw, asbytes=True)
    if codec == 3:
        return zlib.compress(raw, min(clevel, 9))
    if codec == 4:
        return _pa_codec("zstd").compress(raw, asbytes=True)
    raise ValueError(f"unsupported blosc inner codec {codec} "
                     "(supported: lz4, snappy, zlib, zstd)")


def _inner_decompress(codec: int, data: bytes, nbytes: int) -> bytes:
    if codec == 1:
        return _pa_codec("lz4_raw").decompress(
            data, decompressed_size=nbytes, asbytes=True)
    if codec == 2:
        return _pa_codec("snappy").decompress(
            data, decompressed_size=nbytes, asbytes=True)
    if codec == 3:
        return zlib.decompress(data)
    if codec == 4:
        return _pa_codec("zstd").decompress(
            data, decompressed_size=nbytes, asbytes=True)
    raise ValueError(
        f"unsupported blosc inner codec {CODEC_OF_CODE.get(codec, codec)}"
        " (supported: lz4/lz4hc, snappy, zlib, zstd)")


def _shuffle(raw: bytes, typesize: int) -> bytes:
    """Byte-shuffle: [e0b0 e0b1 ...] -> [all b0][all b1]... per block."""
    a = np.frombuffer(raw, np.uint8).reshape(-1, typesize)
    return a.T.tobytes()


def _unshuffle(raw: bytes, typesize: int) -> bytes:
    a = np.frombuffer(raw, np.uint8).reshape(typesize, -1)
    return a.T.tobytes()


def _nsplits(codec: int, typesize: int, blocksize: int) -> int:
    """c-blosc 1.x split_block: part of the wire format — the decoder
    derives the split count from the same rule the encoder used."""
    if codec in (0, 1) and 1 <= typesize <= _MAX_SPLITS \
            and blocksize // typesize >= _MIN_BUFFERSIZE:
        return typesize
    return 1


def blosc_decode(frame: bytes) -> bytes:
    """One Blosc1 frame -> its uncompressed bytes."""
    if len(frame) < 16:
        raise ValueError("blosc frame shorter than its 16-byte header")
    version, _versionlz, flags, typesize = frame[0], frame[1], \
        frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    if version > _VERSION_FORMAT + 1:
        raise ValueError(f"unsupported blosc format version {version}")
    if cbytes > len(frame):
        raise ValueError(
            f"blosc header claims {cbytes} bytes, frame has "
            f"{len(frame)}")
    if flags & _FLAG_MEMCPY:
        return bytes(frame[16:16 + nbytes])
    if flags & _FLAG_BITSHUFFLE:
        raise ValueError("blosc bitshuffle filter is not supported")
    codec = (flags >> 5) & 0x7
    typesize = typesize or 1
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    out = bytearray(nbytes)
    for j, bstart in enumerate(bstarts):
        bsize = min(blocksize, nbytes - j * blocksize)
        nsp = _nsplits(codec, typesize, blocksize)
        if bsize % nsp:
            nsp = 1                      # ragged tail block
        neblock = bsize // nsp
        pos = bstart
        parts = []
        for _ in range(nsp):
            (csize,) = struct.unpack_from("<i", frame, pos)
            pos += 4
            payload = frame[pos:pos + csize]
            pos += csize
            if csize == neblock:         # stored-raw split
                parts.append(bytes(payload))
            else:
                parts.append(_inner_decompress(codec, payload, neblock))
        block = b"".join(parts)
        if flags & _FLAG_SHUFFLE and typesize > 1 \
                and bsize % typesize == 0:
            block = _unshuffle(block, typesize)
        out[j * blocksize:j * blocksize + bsize] = block
    return bytes(out)


def blosc_encode(raw: bytes, typesize: int = 1, cname: str = "lz4",
                 clevel: int = 5, shuffle: int = 1,
                 blocksize: int = 0) -> bytes:
    """Uncompressed bytes -> one Blosc1 frame (fixture/sink side).
    ``shuffle``: 0 none, 1 byte-shuffle (the numcodecs values)."""
    if cname not in CODE_OF_CNAME:
        raise ValueError(f"unsupported blosc cname {cname!r}")
    codec = CODE_OF_CNAME[cname]
    if codec == 0:
        raise ValueError("blosclz encode is not supported; use lz4")
    nbytes = len(raw)
    if clevel == 0 or nbytes < 32:
        header = bytes([_VERSION_FORMAT, 0, _FLAG_MEMCPY,
                        typesize if typesize < 256 else 1]) \
            + struct.pack("<iii", nbytes, nbytes, nbytes + 16)
        return header + raw
    if not blocksize:
        blocksize = min(nbytes, 1 << 20)
        blocksize -= blocksize % max(typesize, 1)
        blocksize = max(blocksize, max(typesize, 1))
    flags = (codec << 5) | (_FLAG_SHUFFLE if shuffle == 1
                            and typesize > 1 else 0)
    nblocks = -(-nbytes // blocksize)
    bstarts = []
    blocks_out = []
    pos = 16 + 4 * nblocks
    for j in range(nblocks):
        bsize = min(blocksize, nbytes - j * blocksize)
        block = raw[j * blocksize:j * blocksize + bsize]
        if flags & _FLAG_SHUFFLE and bsize % typesize == 0:
            block = _shuffle(block, typesize)
        nsp = _nsplits(codec, typesize, blocksize)
        if bsize % nsp:
            nsp = 1
        neblock = bsize // nsp
        enc = bytearray()
        for s in range(nsp):
            part = block[s * neblock:(s + 1) * neblock]
            comp = _inner_compress(codec, part, clevel)
            if len(comp) >= neblock:     # incompressible: store raw
                comp = part
            enc += struct.pack("<i", len(comp)) + comp
        bstarts.append(pos)
        blocks_out.append(bytes(enc))
        pos += len(enc)
    body = b"".join(blocks_out)
    cbytes = 16 + 4 * nblocks + len(body)
    if cbytes >= nbytes + 16:            # compression didn't pay
        header = bytes([_VERSION_FORMAT, 0, _FLAG_MEMCPY,
                        typesize if typesize < 256 else 1]) \
            + struct.pack("<iii", nbytes, nbytes, nbytes + 16)
        return header + raw
    header = bytes([_VERSION_FORMAT, 0, flags,
                    typesize if typesize < 256 else 1]) \
        + struct.pack("<iii", nbytes, blocksize, cbytes)
    return header + struct.pack(f"<{nblocks}i", *bstarts) + body
