"""Olympus OIF (.oif) codec — the FluoView directory dialect that the
reference routes to bioio-bioformats (the `.oif` row of the Bio-Formats
long tail; ref README.md:74). The layout is public (Olympus FluoView
FV1000 OIF notes; mirrored by Bio-Formats' OIFReader and the oiffile
package):

- the main ``name.oif`` file is UTF-16-LE INI text (with BOM):
  ``[Axis N Parameters Common]`` sections declare the axis vocabulary
  (``AxisCode`` of X/Y/C/Z/T with ``MaxSize``), ``[Channel N
  Parameters]`` carry dye names, ``[Reference Image Parameter]`` the
  µm-per-pixel conversion values
- pixel data lives beside it in ``name.oif.files/`` as ONE TIFF PER
  PLANE named ``s_C%03dZ%03dT%03d.tif`` (1-based indices)

So the INI is the catalog and the plane files are the natural Spark
unit of work — the same one-file-per-task lever as the TIFF glob
series, but with the axis sizes and channel names coming from the
vendor metadata instead of filename conventions.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import numpy as np

_PLANE_RE = re.compile(r"s_C(\d+)Z(\d+)T(\d+)\.tif$", re.IGNORECASE)


def parse_oif(text: str) -> dict:
    """INI subset parse -> {section: {key: value}} with quotes
    stripped and numbers coerced."""
    out: dict = {}
    section = None
    for line in text.splitlines():
        line = line.strip().lstrip("﻿")
        if not line or line.startswith(";"):
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1]
            out[section] = {}
            continue
        if "=" not in line or section is None:
            continue
        k, v = line.split("=", 1)
        v = v.strip().strip('"')
        try:
            coerced = int(v)
        except ValueError:
            try:
                coerced = float(v)
            except ValueError:
                coerced = v
        out[section][k.strip()] = coerced
    return out


def build_oif(size_t: int, size_c: int, size_z: int, size_y: int,
              size_x: int,
              channel_names: Optional[Sequence[str]] = None,
              um_per_px: Optional[float] = None,
              z_step_um: Optional[float] = None,
              time_interval_s: Optional[float] = None) -> str:
    """The INI text of a ``.oif`` main file (the field subset this
    codec reads; axis order X,Y,C,Z,T as FluoView writes)."""
    lines = ["[Version Info]", 'SystemName="FLUOVIEW FV1000"',
             'FileVersion="1.2.1.0"', ""]
    for i, (code, size) in enumerate(
            [("X", size_x), ("Y", size_y), ("C", size_c),
             ("Z", size_z), ("T", size_t)]):
        lines += [f"[Axis {i} Parameters Common]",
                  f'AxisCode="{code}"',
                  f'AxisName="{code}"',
                  f"MaxSize={size}", ""]
    if time_interval_s is not None:
        lines += ["[Time Scan Parameters]",
                  f"Interval={time_interval_s * 1000.0}", ""]
    for ci in range(size_c):
        nm = (channel_names[ci] if channel_names
              and ci < len(channel_names) else f"Ch{ci + 1}")
        lines += [f"[Channel {ci + 1} Parameters]",
                  f'DyeName="{nm}"', f"CH Activate={1}", ""]
    if um_per_px is not None or z_step_um is not None:
        lines += ["[Reference Image Parameter]"]
        if um_per_px is not None:
            lines += [f"WidthConvertValue={um_per_px}",
                      f"HeightConvertValue={um_per_px}",
                      'WidthUnit="um"', 'HeightUnit="um"']
        if z_step_um is not None:
            lines += [f"ZConvertValue={z_step_um}"]
        lines += [""]
    return "\r\n".join(lines)


def encode_oif(block: np.ndarray, out_dir: str, name: str = "image",
               channel_names: Optional[Sequence[str]] = None,
               um_per_px: Optional[float] = None,
               z_step_um: Optional[float] = None,
               time_interval_s: Optional[float] = None) -> str:
    """TCZYX block -> ``{out_dir}/{name}.oif`` + ``{name}.oif.files/``
    with one single-plane TIFF per (t, c, z). Returns the .oif path."""
    from bioio_spark.formats.tiff import encode_tiff

    if block.ndim != 5:
        raise ValueError("encode_oif takes a TCZYX block")
    t_n, c_n, z_n, _y, _x = block.shape
    oif_path = os.path.join(out_dir, f"{name}.oif")
    files_dir = oif_path + ".files"
    os.makedirs(files_dir, exist_ok=True)
    text = build_oif(t_n, c_n, z_n, block.shape[3], block.shape[4],
                     channel_names=channel_names, um_per_px=um_per_px,
                     z_step_um=z_step_um,
                     time_interval_s=time_interval_s)
    with open(oif_path, "wb") as f:
        f.write("﻿".encode("utf-16-le"))
        f.write(text.encode("utf-16-le"))
    for t in range(t_n):
        for c in range(c_n):
            for z in range(z_n):
                p = os.path.join(
                    files_dir, f"s_C{c + 1:03d}Z{z + 1:03d}"
                               f"T{t + 1:03d}.tif")
                with open(p, "wb") as f:
                    f.write(encode_tiff([block[t, c, z]]))
    return oif_path


def read_oif_catalog(path: str) -> dict:
    """Driver-side catalog: decode the UTF-16 INI, resolve axis sizes
    + channel names + conversions, and enumerate the plane files.
    Plane-file indices are validated against the axis grid."""
    with open(path, "rb") as f:
        raw = f.read()
    text = raw.decode("utf-16-le", errors="strict")
    ini = parse_oif(text)
    sizes = {}
    for sec, kv in ini.items():
        if sec.startswith("Axis ") and "AxisCode" in kv:
            code = str(kv["AxisCode"]).upper()
            if code in "XYCZT":
                sizes[code] = int(kv.get("MaxSize", 1)) or 1
    for ax in "XY":
        if ax not in sizes:
            raise ValueError(f"{path}: OIF INI lacks axis {ax}")
    names = []
    ci = 1
    while f"Channel {ci} Parameters" in ini:
        names.append(str(ini[f"Channel {ci} Parameters"].get(
            "DyeName", f"Ch{ci}")))
        ci += 1
    ref = ini.get("Reference Image Parameter", {})
    interval = ini.get("Time Scan Parameters", {}).get("Interval")
    files_dir = path + ".files"
    planes = {}
    if os.path.isdir(files_dir):
        for fn in sorted(os.listdir(files_dir)):
            m = _PLANE_RE.search(fn)
            if m:
                c, z, t = (int(m.group(1)) - 1, int(m.group(2)) - 1,
                           int(m.group(3)) - 1)
                planes[(t, c, z)] = os.path.join(files_dir, fn)
    if not planes:
        raise FileNotFoundError(
            f"{path}: no s_C###Z###T###.tif planes in {files_dir}")
    t_n = sizes.get("T", 1)
    c_n = sizes.get("C", 1)
    z_n = sizes.get("Z", 1)
    if len(planes) != t_n * c_n * z_n:
        raise ValueError(
            f"{path}: {len(planes)} plane files do not fill the "
            f"TxCxZ grid {t_n}x{c_n}x{z_n}")
    return {
        "size_t": t_n, "size_c": c_n, "size_z": z_n,
        "size_y": sizes["Y"], "size_x": sizes["X"],
        "channel_names": names or None,
        "um_per_px": ref.get("WidthConvertValue"),
        "z_step_um": ref.get("ZConvertValue"),
        "time_interval": (float(interval) / 1000.0
                          if interval is not None else None),
        "planes": planes,
        "ini": ini,
    }
