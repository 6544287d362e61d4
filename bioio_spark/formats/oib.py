"""Olympus OIB (.oib) codec — the single-file sibling of OIF that the
reference routes to bioio-bioformats (the `.oib` row of the Bio-Formats
long tail; ref README.md:74). An OIB is an OLE2 compound document
(public MS-CFB spec — bioio_spark.formats.cfb) holding exactly the OIF
payload: the UTF-16 INI main file and one TIFF stream per plane, plus
an ``OibInfo.txt`` stream mapping storage stream names back to the
original OIF file names (the layout Bio-Formats' OIBReader and the
oiffile package consume).

So OIB = CFB container + the OIF vocabulary this repo already speaks;
the catalog is the INI, and each plane resolves to SECTOR EXTENTS in
the .oib file — the distributed-read plan unit (executors seek-read
their plane's byte runs; contiguously-written streams are one ranged
GET each).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def encode_oib(block: np.ndarray, name: str = "image",
               channel_names: Optional[Sequence[str]] = None,
               um_per_px: Optional[float] = None,
               z_step_um: Optional[float] = None,
               time_interval_s: Optional[float] = None) -> bytes:
    """TCZYX block -> .oib bytes: OibInfo.txt + the OIF INI stream +
    one TIFF stream per (t, c, z) plane, packed as MS-CFB."""
    from bioio_spark.formats.cfb import build_cfb
    from bioio_spark.formats.oif import build_oif
    from bioio_spark.formats.tiff import encode_tiff

    if block.ndim != 5:
        raise ValueError("encode_oib takes a TCZYX block")
    t_n, c_n, z_n, y_n, x_n = block.shape
    ini = build_oif(t_n, c_n, z_n, y_n, x_n,
                    channel_names=channel_names, um_per_px=um_per_px,
                    z_step_um=z_step_um,
                    time_interval_s=time_interval_s)
    streams = [("Stream00000", "﻿".encode("utf-16-le")
                + ini.encode("utf-16-le"))]
    info = ["[OibSaveInfo]", f'MainFileName="{name}.oif"',
            f'Stream00000="{name}.oif"']
    idx = 1
    for t in range(t_n):
        for c in range(c_n):
            for z in range(z_n):
                sname = f"Stream{idx:05d}"
                fname = f"s_C{c + 1:03d}Z{z + 1:03d}T{t + 1:03d}.tif"
                streams.append((sname, encode_tiff([block[t, c, z]])))
                info.append(f'{sname}="{fname}"')
                idx += 1
    info_bytes = ("﻿" + "\r\n".join(info)).encode("utf-16-le")
    return build_cfb([("OibInfo.txt", info_bytes)] + streams)


def parse_oib_info(text: str) -> dict:
    """OibInfo.txt -> {stream_name: original_file_name}."""
    from bioio_spark.formats.oif import parse_oif

    ini = parse_oif(text)
    save = ini.get("OibSaveInfo")
    if save is None:
        raise ValueError("OibInfo.txt lacks [OibSaveInfo]")
    return {k: str(v) for k, v in save.items()
            if k.startswith("Stream")}


def read_oib_catalog(path: str) -> dict:
    """Driver-side catalog: CFB directory + OibInfo map + the INI
    stream. Returns the read_oif_catalog dict shape with ``planes``
    mapping (t, c, z) -> sector-extent lists instead of file paths."""
    from bioio_spark.formats.cfb import CfbFile
    from bioio_spark.formats.oif import _PLANE_RE, parse_oif

    cfb = CfbFile(path)
    names = set(cfb.stream_names())
    if "OibInfo.txt" not in names:
        raise ValueError(f"{path}: no OibInfo.txt stream — not an OIB")
    info_raw = cfb.read_stream("OibInfo.txt").decode("utf-16-le")
    stream_of = parse_oib_info(info_raw)
    oif_stream = next((s for s, fn in stream_of.items()
                       if fn.lower().endswith(".oif")), None)
    if oif_stream is None:
        raise ValueError(f"{path}: OibSaveInfo names no .oif stream")
    ini_text = cfb.read_stream(oif_stream).decode("utf-16-le")
    ini = parse_oif(ini_text)
    sizes = {}
    for sec, kv in ini.items():
        if sec.startswith("Axis ") and "AxisCode" in kv:
            code = str(kv["AxisCode"]).upper()
            if code in "XYCZT":
                sizes[code] = int(kv.get("MaxSize", 1)) or 1
    ch_names = []
    ci = 1
    while f"Channel {ci} Parameters" in ini:
        ch_names.append(str(ini[f"Channel {ci} Parameters"].get(
            "DyeName", f"Ch{ci}")))
        ci += 1
    for ax in "XY":
        if ax not in sizes:
            raise ValueError(f"{path}: OIB INI lacks axis {ax}")
    ref = ini.get("Reference Image Parameter", {})
    interval = ini.get("Time Scan Parameters", {}).get("Interval")
    planes = {}
    for sname, fname in stream_of.items():
        m = _PLANE_RE.search(fname)
        if m and sname in names:
            key = (int(m.group(3)) - 1, int(m.group(1)) - 1,
                   int(m.group(2)) - 1)
            planes[key] = cfb.stream_extents(sname)
    if not planes:
        raise FileNotFoundError(f"{path}: no plane streams in OIB")
    t_n, c_n, z_n = (sizes.get("T", 1), sizes.get("C", 1),
                     sizes.get("Z", 1))
    if len(planes) != t_n * c_n * z_n:
        raise ValueError(
            f"{path}: {len(planes)} plane streams do not fill the "
            f"TxCxZ grid {t_n}x{c_n}x{z_n}")
    return {
        "size_t": t_n, "size_c": c_n, "size_z": z_n,
        "size_y": sizes["Y"], "size_x": sizes["X"],
        "channel_names": ch_names or None,
        "um_per_px": ref.get("WidthConvertValue"),
        "z_step_um": ref.get("ZConvertValue"),
        "time_interval": (float(interval) / 1000.0
                          if interval is not None else None),
        "planes": planes,
        "ini": ini,
    }
