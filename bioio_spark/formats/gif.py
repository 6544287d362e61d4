"""Pure-Python GIF codec (GIF87a/89a) — imageio-tier surface (the
reference's bioio-imageio plugin lists .gif among its everyday formats,
ref README.md:61 full-list link) and the one baseline container with a
REAL frame axis: a multi-frame GIF maps to T in the standard order, so
the multimodal video tier can carry actual files.

Implemented from the published spec (GIF89a Specification, CompuServe
1990): logical screen descriptor, global/local color tables, graphic
control extensions (delay, transparency), image descriptors with
interlace, and GIF-LZW — LSB-first bit packing, variable code width
from (min_code_size+1) to 12 bits, Clear/EOI codes, width bump when the
table reaches 2^width (no EarlyChange — that quirk is TIFF's). Frames
composite onto the canvas honoring transparency; disposal 2 restores
the background between frames.

Encode writes GIF89a with one global color table: grayscale uint8 in /
out via the identity gray palette; RGB frames palette-quantize exactly
when they hold <= 256 distinct colors (raises otherwise — a baseline
codec does not dither)."""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def lzw_decode_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-LZW: LSB-first codes, initial width min_code_size+1,
    CLEAR=2^min, EOI=CLEAR+1; decoder widens when the table reaches
    2^width (one code AHEAD of registration, since the next code to
    assign is len(table))."""
    CLEAR = 1 << min_code_size
    EOI = CLEAR + 1
    width = min_code_size + 1
    table: list[bytes] = []
    prev: Optional[bytes] = None
    out = bytearray()
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)        # missing EOI: be liberal
            acc |= data[pos] << nbits    # LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == CLEAR:
            table = [bytes([i]) for i in range(CLEAR)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == EOI:
            return bytes(out)
        if not table:
            raise ValueError("GIF LZW stream must start with Clear")
        if prev is None:
            entry = table[code]
        else:
            entry = (table[code] if code < len(table)
                     else prev + prev[:1])          # KwKwK
            if len(table) < 4096:       # deferred-clear: table caps
                table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


def lzw_encode_gif(data: bytes, min_code_size: int) -> bytes:
    """Encoder twin of lzw_decode_gif (Clear-led, EOI-terminated,
    table reset when the 12-bit space fills)."""
    CLEAR = 1 << min_code_size
    EOI = CLEAR + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(CLEAR)}

    width = min_code_size + 1
    table = fresh()
    next_code = EOI + 1
    emit(CLEAR, width)
    w = b""
    for b in data:
        ch = bytes([b])
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1       # decoder widens at table size 2^width
        elif next_code == 4096:
            emit(CLEAR, width)
            table = fresh()
            next_code = EOI + 1
            width = min_code_size + 1
        w = ch
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = idx[src]
            src += 1
    return out


def decode_gif(data: bytes):
    """GIF bytes -> (frames, delays_cs). frames is (N, H, W) uint8 when
    every used palette entry is gray, else (N, H, W, 3) uint8; delays
    in centiseconds (0 for still images)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    W, H, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames, delays = [], []
    # gray iff every color table in the file is gray — the same rule the
    # reader's catalog probe applies, so shape promises stay consistent
    def _gray(p):
        return bool((p[:, 0] == p[:, 1]).all()
                    and (p[:, 1] == p[:, 2]).all())

    all_gray = gct is None or _gray(gct)
    canvas = np.zeros((H, W, 3), np.uint8)
    delay, transp, disposal = 0, None, 0
    prev_disposal, prev_region, prev_snapshot = 0, None, None
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:                      # trailer
            break
        if b == 0x21:                      # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:              # graphic control
                size = data[pos]
                flags, delay = struct.unpack_from(
                    "<BH", data, pos + 1)
                tidx = data[pos + 4]
                transp = tidx if flags & 1 else None
                disposal = (flags >> 2) & 0x7
                pos += size + 1
            while data[pos]:               # skip (sub-)blocks
                pos += data[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x0, y0, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            all_gray = all_gray and _gray(pal)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(
            lzw_decode_gif(bytes(lzw), min_code)[:w * h],
            dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        # a GCE's disposal applies AFTER its own frame renders, i.e.
        # before the NEXT frame draws — so the clear for disposal 2
        # (restore to background) and the revert for disposal 3
        # (restore to previous) happen here, keyed to the PREVIOUS
        # frame's setting, over the previous frame's region
        if prev_disposal == 2 and prev_region is not None:
            py, px_, ph, pw = prev_region
            canvas[py:py + ph, px_:px_ + pw] = 0
        elif prev_disposal == 3 and prev_region is not None:
            py, px_, ph, pw = prev_region
            canvas[py:py + ph, px_:px_ + pw] = prev_snapshot
        region = canvas[y0:y0 + h, x0:x0 + w]
        # snapshot the covered pixels BEFORE drawing so disposal 3 can
        # revert them when the next frame arrives
        snapshot = region.copy() if disposal == 3 else None
        opaque = (np.ones((h, w), bool) if transp is None
                  else idx != transp)
        region[opaque] = pal[idx[opaque]]
        frames.append(canvas.copy())
        delays.append(delay)
        prev_disposal, prev_region = disposal, (y0, x0, h, w)
        prev_snapshot = snapshot
        transp, disposal = None, 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    out = np.stack(frames)
    if all_gray:
        out = out[..., 0]                  # gray palettes collapse
    return out, delays


def encode_gif(frames: np.ndarray,
               delays: Optional[Sequence[int]] = None,
               interlace: bool = False) -> bytes:
    """(H, W) / (N, H, W) gray or (N, H, W, 3) RGB uint8 -> GIF89a.
    Multi-frame inputs write one graphic-control + image block per
    frame (an animation: the real-file video container of the
    multimodal tier)."""
    a = np.asarray(frames)
    if a.dtype != np.uint8:
        raise ValueError(f"GIF encodes uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[None]
    if a.ndim == 3:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1)
        idx_frames = a
    elif a.ndim == 4 and a.shape[3] == 3:
        flat = a.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(
                f"GIF palette limit: {len(pal)} distinct colors > 256")
        pad = np.zeros((256, 3), np.uint8)
        pad[:len(pal)] = pal
        pal = pad
        idx_frames = inv.astype(np.uint8).reshape(a.shape[:3])
    else:
        raise ValueError(
            f"GIF encodes (N,)H,W gray or N,H,W,3 RGB, got {a.shape}")
    n, h, w = idx_frames.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    out += pal.tobytes()                    # 256-entry global table
    dl = list(delays or [0] * n)
    if len(dl) != n:
        raise ValueError(f"{len(dl)} delays for {n} frames")
    for fi in range(n):
        if n > 1 or dl[fi]:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0,
                               int(dl[fi]), 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0)
        frame = idx_frames[fi]
        if interlace:
            rows = [frame[y] for s, st in _INTERLACE_PASSES
                    for y in range(s, h, st)]
            frame = np.stack(rows)
        out.append(8)                       # min LZW code size
        lzw = lzw_encode_gif(frame.tobytes(), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
