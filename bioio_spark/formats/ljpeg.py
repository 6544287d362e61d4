"""Lossless JPEG (ITU-T T.81 Annex H, process 14 / SOF3) — the
compression DNG and most camera-RAW containers use for their mosaic
data (DNG spec 1.4, "Compression=7 means lossless JPEG"). Predictive
coding only: no DCT, no quantization — each sample's difference from a
neighbor prediction is entropy-coded exactly like a baseline DC
coefficient (SSSS category via Huffman + SSSS raw bits), with the
T.81 H.1.2 specials: differences live modulo 2^16 and SSSS=16 carries
NO extra bits (diff = 32768).

Subset: single-component scans (DNG CFA mosaics are one plane),
precision 2-16 bits, point transform 0, all seven spatial predictors
on decode, predictor selectable on encode. Shares the bit-level
Huffman machinery with the baseline codec (formats/jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

from bioio_spark.formats.jpeg import (_BitReader, _BitWriter,
                                      _build_codes, _build_decode_table,
                                      _decode_huffman, _extend)

# canonical Huffman table over SSSS categories 0..16: small categories
# get short codes; counts[i] = number of codes of length i+1
_LJPEG_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 2]
_LJPEG_SYMBOLS = list(range(17))


def _predict(ra: int, rb: int, rc: int, psv: int) -> int:
    if psv == 1:
        return ra
    if psv == 2:
        return rb
    if psv == 3:
        return rc
    if psv == 4:
        return ra + rb - rc
    if psv == 5:
        return ra + ((rb - rc) >> 1)
    if psv == 6:
        return rb + ((ra - rc) >> 1)
    if psv == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid predictor {psv}")


def _pred_at(px, y: int, x: int, default: int, psv: int) -> int:
    """Per-component prediction per T.81 H.1: first sample uses the
    precision default, row starts predict from above, the first row
    predicts from the left, everything else uses the selected
    predictor."""
    if y == 0 and x == 0:
        return default
    if x == 0:
        return int(px[y - 1, 0])
    if y == 0:
        return int(px[0, x - 1])
    return _predict(int(px[y, x - 1]), int(px[y - 1, x]),
                    int(px[y - 1, x - 1]), psv)


def encode_ljpeg(plane: np.ndarray, precision: int = 16,
                 predictor: int = 1, n_components: int = 1) -> bytes:
    """Encode a 2-D unsigned integer plane as a lossless JPEG (SOF3).

    n_components > 1 uses the DNG/dcraw column-interleave convention
    (the form Adobe's converter writes): component c owns plane
    columns c::n, the declared SOF width is the per-component width,
    and the interleaved scan emits one sample per component per MCU —
    each component predicting from ITS OWN plane."""
    if plane.ndim != 2:
        raise ValueError("encode_ljpeg takes a single 2-D plane")
    if not 2 <= precision <= 16:
        raise ValueError("lossless JPEG precision must be 2..16")
    if not 1 <= n_components <= 4:
        raise ValueError("lossless JPEG supports 1..4 components")
    h, w = plane.shape
    if w % n_components:
        raise ValueError(f"width {w} not divisible by "
                         f"{n_components} components")
    wc = w // n_components
    px = plane.astype(np.int64)
    if px.min() < 0 or px.max() >= (1 << precision):
        raise ValueError("plane values exceed the stated precision")
    comps = [px[:, c::n_components] for c in range(n_components)]
    codes = _build_codes(_LJPEG_COUNTS, _LJPEG_SYMBOLS)
    bw = _BitWriter()
    default = 1 << (precision - 1)
    mask = 0xFFFF
    for y in range(h):
        for x in range(wc):
            for comp in comps:
                pred = _pred_at(comp, y, x, default, predictor)
                diff = (int(comp[y, x]) - pred) & mask
                if diff > 0x7FFF:
                    diff -= 0x10000
                if diff == -0x8000:
                    cat, bits = 16, 0
                else:
                    cat = abs(diff).bit_length()
                    bits = (diff if diff >= 0
                            else diff + (1 << cat) - 1)
                code, length = codes[cat]
                bw.write(code, length)
                if cat and cat != 16:
                    bw.write(bits, cat)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dht = seg(0xFFC4, bytes([0x00]) + bytes(_LJPEG_COUNTS)
              + bytes(_LJPEG_SYMBOLS))
    comps_hdr = b"".join(bytes([c + 1, 0x11, 0])
                         for c in range(n_components))
    sof = seg(0xFFC3, struct.pack(">BHHB", precision, h, wc,
                                  n_components) + comps_hdr)
    scan_hdr = bytes([n_components]) + b"".join(
        bytes([c + 1, 0x00]) for c in range(n_components))
    sos = seg(0xFFDA, scan_hdr + bytes([predictor, 0, 0x00]))
    return (b"\xFF\xD8" + dht + sof + sos + scan + b"\xFF\xD9")


def decode_ljpeg(data: bytes) -> np.ndarray:
    """Decode a lossless JPEG (SOF3) -> (H, W) uint16 (uint8 when
    precision <= 8). Multi-component interleaved scans (Nf 1..4, the
    DNG/dcraw convention) decode to the column-interleaved full-width
    plane W = samples_per_line * Nf."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    tables = {}
    precision = h = w = None
    ns = nf = None
    comp_tds = []
    predictor = None
    scan_off = None
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
        payload = data[pos + 4:pos + 2 + ln]
        if marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                counts = list(payload[p + 1:p + 17])
                n = sum(counts)
                syms = list(payload[p + 17:p + 17 + n])
                tables[tc_th & 0x0F] = _build_decode_table(counts, syms)
                p += 17 + n
        elif marker == 0xFFC3:
            precision, h, w, nf = struct.unpack(">BHHB", payload[:6])
            if not 1 <= nf <= 4:
                raise ValueError(
                    f"{nf}-component lossless JPEG unsupported "
                    "(1..4 per the DNG convention)")
            for c in range(nf):
                hv = payload[6 + 3 * c + 1]
                if hv != 0x11:
                    raise ValueError("subsampled lossless JPEG "
                                     "components unsupported")
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            raise ValueError("not a lossless JPEG (DCT SOF marker)")
        elif marker == 0xFFDD:
            # DRI: a nonzero restart interval would interleave RSTn
            # markers into the entropy stream, which this explicit
            # subset does not resync on — reject rather than decode
            # corrupt pixels silently
            (ri,) = struct.unpack(">H", payload[:2])
            if ri:
                raise ValueError(
                    f"restart interval {ri} unsupported (lossless "
                    "JPEG subset decodes unsegmented scans only)")
        elif marker == 0xFFDA:
            ns = payload[0]
            comp_tds = [payload[2 + 2 * c] >> 4 for c in range(ns)]
            predictor = payload[1 + 2 * ns]
            pt = payload[3 + 2 * ns] & 0x0F
            if pt:
                raise ValueError("nonzero point transform unsupported")
            scan_off = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_off is None or precision is None or nf is None \
            or ns is None:
        raise ValueError("lossless JPEG missing SOF3/SOS")
    if ns != nf:
        raise ValueError("non-interleaved lossless JPEG scans "
                         "unsupported")
    comp_tabs = [tables[td] for td in comp_tds]
    br = _BitReader(data[scan_off:])
    comps = [np.zeros((h, w), dtype=np.int64) for _ in range(nf)]
    default = 1 << (precision - 1)
    mask = 0xFFFF
    for y in range(h):
        for x in range(w):
            for comp, table in zip(comps, comp_tabs):
                cat = _decode_huffman(br, table)
                if cat == 16:
                    diff = 0x8000
                else:
                    diff = _extend(br.read_bits(cat), cat)
                pred = _pred_at(comp, y, x, default, predictor)
                comp[y, x] = (pred + diff) & mask
    if nf == 1:
        out = comps[0]
    else:
        out = np.zeros((h, w * nf), dtype=np.int64)
        for c in range(nf):
            out[:, c::nf] = comps[c]
    dt = np.uint8 if precision <= 8 else np.uint16
    return out.astype(dt)
