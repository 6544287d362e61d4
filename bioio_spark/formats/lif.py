"""Pure-Python LIF (Leica Image Format) baseline codec — the
reference's bioio-lif plugin tier (ref README.md:62). The container
layout is public (Leica's LIF documentation; the open-source readlif
package mirrors it):

- A stream of BLOCKS, each ``int32 0x70 | uint32 block_size | 0x2A
  test byte | payload``. The FIRST block's payload is ``uint32 nc`` +
  the XML settings document as nc UTF-16-LE code units.
- Every subsequent block is an object memory block: ``0x2A | uint64
  memory_size (format version 2) | 0x2A | uint32 nd | block-id string
  (nd UTF-16-LE units, e.g. "MemBlock_42")`` followed by memory_size
  raw data bytes.
- The XML tree (``LMSDataContainerHeader``) holds one ``<Element>``
  per image with ``<ImageDescription>``: ``<ChannelDescription
  Resolution= BytesInc=>`` per channel and ``<DimensionDescription
  DimID= NumberOfElements= BytesInc=>`` per dimension (DimID 1 X,
  2 Y, 3 Z, 4 T), plus ``<Memory MemoryBlockID=>`` naming the block
  that carries the pixels. BytesInc values are byte STRIDES, so any
  interleaving decodes with as_strided-style arithmetic.

Scope: grayscale 8/16-bit channels (Resolution 8/16), dims X/Y/Z/T/M
(DimID 10 = Leica tile scans, stage positions from the TileScanInfo
attachment),
multi-scene files (one Element per scene). Encode writes version-2
blocks with C-order strides (x fastest, then y, z, t; channels
outermost) — the layout Leica exports for non-RGB scans."""

from __future__ import annotations

import re
import struct
from typing import Optional, Sequence

import numpy as np

_MAGIC = 0x70
_TEST = 0x2A

_DIM_ID = {"X": 1, "Y": 2, "Z": 3, "T": 4, "M": 10}
_DIM_OF_ID = {v: k for k, v in _DIM_ID.items()}


def _block(payload: bytes) -> bytes:
    return struct.pack("<iI", _MAGIC, len(payload)) + payload


def _u16(s: str) -> bytes:
    return s.encode("utf-16-le")


def encode_lif(scenes: Sequence[dict]) -> bytes:
    """scenes: [{"name": str, "data": TCZYX (or MTCZYX tile-scan)
    ndarray (uint8/uint16), "pps": optional (z_um, y_um, x_um),
    "tiles": optional [(pos_y_um, pos_x_um), ...] per M}] -> LIF bytes
    (version 2). Mosaic scenes write DimID 10 (the Leica tile
    dimension) plus a TileScanInfo attachment with stage positions."""
    elements = []
    blocks = []
    for si, sc in enumerate(scenes):
        a = np.ascontiguousarray(sc["data"])
        if a.ndim == 5:
            a = a[None]
        if a.ndim != 6:
            raise ValueError(
                "encode_lif expects 5D TCZYX or 6D MTCZYX scenes")
        if a.dtype not in (np.uint8, np.uint16):
            raise ValueError(
                f"LIF baseline stores uint8/uint16, got {a.dtype}")
        m_n, t_n, c_n, z_n, y_n, x_n = a.shape
        res = 8 * a.itemsize
        # strides (BytesInc): x fastest, then y/z/t/m, channels outermost
        bx = a.itemsize
        by = bx * x_n
        bz = by * y_n
        bt = bz * z_n
        bm = bt * t_n
        bc = bm * m_n
        chans = "".join(
            f'<ChannelDescription DataType="0" ChannelTag="0" '
            f'Resolution="{res}" NameOfMeasuredQuantity="" Min="0" '
            f'Max="{(1 << res) - 1}" Unit="" LUTName="Gray" '
            f'IsLUTInverted="0" BytesInc="{ci * bc}" BitInc="0"/>'
            for ci in range(c_n))
        pps = sc.get("pps")
        dims = ""
        for name, n, inc in (("X", x_n, bx), ("Y", y_n, by),
                             ("Z", z_n, bz), ("T", t_n, bt),
                             ("M", m_n, bm)):
            if name in ("Z", "T", "M") and n == 1:
                continue
            # Length: physical extent in METERS (the Leica unit)
            length = 0.0
            if pps and name in ("X", "Y", "Z"):
                um = {"X": pps[2], "Y": pps[1], "Z": pps[0]}[name]
                length = (um or 0.0) * 1e-6 * max(n - 1, 1)
            dims += (f'<DimensionDescription DimID="{_DIM_ID[name]}" '
                     f'NumberOfElements="{n}" Origin="0" '
                     f'Length="{length}" Unit="m" '
                     f'BytesInc="{inc}" BitInc="0"/>')
        tiles_xml = ""
        tiles = sc.get("tiles")
        if tiles is not None:
            if len(tiles) != m_n:
                raise ValueError(
                    f"{len(tiles)} tile positions for {m_n} tiles")
            tiles_xml = ('<Attachment Name="TileScanInfo">' + "".join(
                f'<Tile FieldX="0" FieldY="0" '
                f'PosX="{px_ * 1e-6}" PosY="{py_ * 1e-6}"/>'
                for py_, px_ in tiles) + "</Attachment>")
        block_id = f"MemBlock_{si}"
        data = a.transpose(2, 0, 1, 3, 4, 5).tobytes()  # c, m, t, z, y, x
        elements.append(
            f'<Element Name="{sc.get("name") or f"Series{si:03d}"}" '
            f'Visibility="1" CopyOption="1" UniqueID="{si}">'
            f'<Data><Image TextDescription="">'
            f'<ImageDescription><Channels>{chans}</Channels>'
            f'<Dimensions>{dims}</Dimensions></ImageDescription>'
            f'{tiles_xml}</Image></Data>'
            f'<Memory Size="{len(data)}" MemoryBlockID="{block_id}"/>'
            f'</Element>')
        desc = _u16(block_id)
        payload = (bytes([_TEST]) + struct.pack("<Q", len(data))
                   + bytes([_TEST])
                   + struct.pack("<I", len(block_id)) + desc)
        blocks.append(_block(payload) + data)
    xml = ('<LMSDataContainerHeader Version="2">'
           '<Element Name="LifFile" Visibility="1" CopyOption="1">'
           '<Data><Experiment/></Data><Children>'
           + "".join(elements) + "</Children></Element>"
           "</LMSDataContainerHeader>")
    u = _u16(xml)
    head = (bytes([_TEST]) + struct.pack("<I", len(xml)) + u)
    return _block(head) + b"".join(blocks)


def parse_lif_header(path: str) -> dict:
    """Driver-side plan: the XML document + per-block data offsets —
    header/IDs only, no pixel IO. Returns {"xml": str, "blocks":
    {block_id: {"offset": int, "size": int}}, "scenes": [scene dict]}
    where each scene dict has name, shape (t,c,z,y,x), dtype, strides
    {dim: BytesInc}, channel_incs, block_id, pps (µm or None)."""
    blocks = {}
    with open(path, "rb") as f:
        head = f.read(8)
        magic, size = struct.unpack("<iI", head)
        if magic != _MAGIC:
            raise ValueError("not a LIF file (bad block magic)")
        payload = f.read(size)
        if payload[0] != _TEST:
            raise ValueError("not a LIF file (bad test byte)")
        (nc,) = struct.unpack_from("<I", payload, 1)
        xml = payload[5:5 + 2 * nc].decode("utf-16-le")
        if xml == "LMS_Object_File":
            # single-object LOF container: same block framing, XML at
            # the TAIL — delegate (the returned dict shape is shared,
            # so every LIF plane/window reader works unchanged)
            from bioio_spark.formats.lof import parse_lof_header

            return parse_lof_header(path)
        pos = 8 + size
        while True:
            f.seek(pos)
            head = f.read(8)
            if len(head) < 8:
                break
            magic, bsize = struct.unpack("<iI", head)
            if magic != _MAGIC:
                raise ValueError(f"bad memory-block magic at {pos}")
            payload = f.read(bsize)
            if payload[0] != _TEST or payload[9] != _TEST:
                raise ValueError(f"bad memory-block layout at {pos}")
            (mem_size,) = struct.unpack_from("<Q", payload, 1)
            (nd,) = struct.unpack_from("<I", payload, 10)
            bid = payload[14:14 + 2 * nd].decode("utf-16-le")
            blocks[bid] = {"offset": pos + 8 + bsize, "size": mem_size}
            pos += 8 + bsize + mem_size

    scenes = scenes_from_lif_xml(xml)
    return {"xml": xml, "blocks": blocks, "scenes": scenes}


def scenes_from_lif_xml(xml: str) -> list[dict]:
    """The <Element>/<ImageDescription> vocabulary shared by LIF and
    the single-object LOF files: dimensions (DimID/NumberOfElements/
    BytesInc), channel strides, tile-scan attachments, physical
    lengths."""
    scenes = []
    for el in re.finditer(
            r"<Element (?![^>]*Name=\"LifFile\")[^>]*>.*?</Element>",
            xml, re.S):
        seg = el.group(0)
        if "<ImageDescription>" not in seg:
            continue
        name_m = re.search(r'Name="([^"]*)"', seg)
        chan_incs = [int(m) for m in re.findall(
            r'<ChannelDescription[^>]*BytesInc="(\d+)"', seg)]
        resolutions = {int(r) for r in re.findall(
            r'<ChannelDescription[^>]*Resolution="(\d+)"', seg)}
        if len(resolutions) != 1 or resolutions & {8, 16} != resolutions:
            raise ValueError(
                f"unsupported LIF channel resolutions {resolutions}")
        res = resolutions.pop()
        dims = {}
        pps_len = {}
        for m in re.finditer(r"<DimensionDescription ([^>]*)/>", seg):
            attrs = dict(re.findall(r'(\w+)="([^"]*)"', m.group(1)))
            did = int(attrs["DimID"])
            if did not in _DIM_OF_ID:
                raise ValueError(f"unsupported LIF DimID {did}")
            nm = _DIM_OF_ID[did]
            dims[nm] = {"n": int(attrs["NumberOfElements"]),
                        "inc": int(attrs["BytesInc"])}
            pps_len[nm] = float(attrs.get("Length") or 0.0)
        if "X" not in dims or "Y" not in dims:
            raise ValueError("LIF image without X/Y dimensions")
        bid_m = re.search(r'MemoryBlockID="([^"]*)"', seg)
        if bid_m is None:
            raise ValueError("LIF image without a memory block id")
        shape = {d: dims.get(d, {"n": 1})["n"] for d in "TCZYX"}
        shape["C"] = len(chan_incs) or 1
        pps = None
        vals = {}
        for d in ("Z", "Y", "X"):
            if d in dims and pps_len.get(d):
                n = max(dims[d]["n"] - 1, 1)
                vals[d] = pps_len[d] * 1e6 / n
        if vals:
            pps = (vals.get("Z"), vals.get("Y"), vals.get("X"))
        tiles = None
        att = re.search(
            r'<Attachment Name="TileScanInfo">(.*?)</Attachment>',
            seg, re.S)
        if att:
            tiles = [(float(m.group("py")) * 1e6,
                      float(m.group("px")) * 1e6)
                     for m in re.finditer(
                         r'<Tile[^>]*PosX="(?P<px>[^"]+)"'
                         r'[^>]*PosY="(?P<py>[^"]+)"', att.group(1))]
        scenes.append({
            "name": name_m.group(1) if name_m else None,
            "shape": (shape["T"], shape["C"], shape["Z"],
                      shape["Y"], shape["X"]),
            "m_n": dims.get("M", {"n": 1})["n"],
            "tiles_um": tiles,       # per-M (PosY, PosX) stage µm
            "dtype": "uint16" if res == 16 else "uint8",
            "strides": {d: dims[d]["inc"] for d in dims},
            "channel_incs": chan_incs or [0],
            "block_id": bid_m.group(1),
            "pps": pps,
        })
    return scenes


def read_lif_plane(path: str, header: dict, scene_idx: int,
                   t: int, c: int, z: int, m: int = 0,
                   y0: int = 0, y1: Optional[int] = None) -> np.ndarray:
    """One YX plane via stride arithmetic — seek-based, reads only the
    plane's rows (contiguous when BytesInc(X) == itemsize, the Leica
    export layout). ``y0``/``y1`` restrict the read to a half-open row
    window: the seek starts at row y0 and only (y1-y0) rows' bytes are
    fetched — the ranged-GET shape of a windowed read."""
    sc = header["scenes"][scene_idx]
    blk = header["blocks"][sc["block_id"]]
    t_n, c_n, z_n, y_n, x_n = sc["shape"]
    if y1 is None:
        y1 = y_n
    if not (0 <= y0 < y1 <= y_n):
        raise ValueError(f"bad row window [{y0}, {y1}) for {y_n} rows")
    dt = np.dtype(sc["dtype"])
    st = sc["strides"]
    base = (sc["channel_incs"][c]
            + t * (st.get("T") or 0)
            + z * (st.get("Z") or 0)
            + m * (st.get("M") or 0))
    bx = st.get("X") or dt.itemsize
    by = st.get("Y") or bx * x_n
    n_rows = y1 - y0
    with open(path, "rb") as f:
        if bx == dt.itemsize and by == bx * x_n:
            f.seek(blk["offset"] + base + y0 * by)
            buf = f.read(by * n_rows)
            return np.frombuffer(buf, dtype=dt).reshape(n_rows, x_n)
        # non-contiguous strides: row-by-row gather; each sample is the
        # first `itemsize` bytes of its `bx`-wide slot
        rows = []
        # the final slot may be truncated to just its sample bytes (the
        # memory block ends at the last sample), so read exactly what
        # the row needs and zero-pad the slot grid
        need = bx * (x_n - 1) + dt.itemsize
        for y in range(y0, y1):
            f.seek(blk["offset"] + base + y * by)
            buf = f.read(need)
            if bx == dt.itemsize:
                rows.append(np.frombuffer(buf, dtype=dt, count=x_n))
            else:
                raw = np.zeros(bx * x_n, np.uint8)
                raw[:len(buf)] = np.frombuffer(buf, np.uint8)
                rows.append(np.ascontiguousarray(
                    raw.reshape(x_n, bx)[:, :dt.itemsize])
                    .view(dt).ravel())
        return np.stack(rows)


def decode_lif(path: str):
    """Whole-file decode -> [(name, TCZYX ndarray), ...] — the test /
    small-file path; the reader tier uses the planned per-plane
    reads."""
    h = parse_lif_header(path)
    out = []
    for si, sc in enumerate(h["scenes"]):
        t_n, c_n, z_n, y_n, x_n = sc["shape"]
        m_n = sc.get("m_n", 1)
        a = np.empty((m_n,) + sc["shape"], dtype=sc["dtype"])
        for m in range(m_n):
            for t in range(t_n):
                for c in range(c_n):
                    for z in range(z_n):
                        a[m, t, c, z] = read_lif_plane(
                            path, h, si, t, c, z, m=m)
        out.append((sc["name"], a[0] if m_n == 1 else a))
    return out
