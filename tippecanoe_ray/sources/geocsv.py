"""geocsv point source (geocsv.cpp:14-140): CSV with lat/lon columns
sniffed by name from the header — "y"/"lat"/*latitude* and
"x"/"lon"/"lng"/"long"/*longitude* (case-insensitive); rows with empty
coordinates are skipped; remaining columns become attributes."""

from __future__ import annotations

import csv

import numpy as np
import pyarrow as pa

from ..functions.spatial import lonlat_to_world


def sniff_latlon_columns(header: list[str]) -> tuple[int, int]:
    """Return (latcol, loncol) per geocsv.cpp:40-52; -1 when absent."""
    latcol = loncol = -1
    for i, h in enumerate(header):
        lower = h.lower()
        if lower == "y" or lower == "lat" or "latitude" in lower:
            latcol = i
        if lower in ("x", "lon", "lng", "long") or "longitude" in lower:
            loncol = i
    return latcol, loncol


def read_geocsv_points(path: str) -> pa.Table:
    """Parse a geocsv file into (seq, wx, wy, <attr columns as strings>).
    seq counts data lines (including skipped null-geometry rows, like
    the reference's seq++)."""
    with open(path, newline="") as f:
        rd = csv.reader(f)
        try:
            header = next(rd)
        except StopIteration:
            raise ValueError(f"{path}: empty csv")
        latcol, loncol = sniff_latlon_columns(header)
        if latcol < 0 or loncol < 0:
            raise ValueError(f'{path}: can\'t find "lat" and "lon" columns')
        seqs: list[int] = []
        lons: list[float] = []
        lats: list[float] = []
        attr_names = [h for i, h in enumerate(header) if i not in (latcol, loncol)]
        attr_cols: dict[str, list[str]] = {h: [] for h in attr_names}
        seq = 0
        for line in rd:
            seq += 1
            if len(line) != len(header):
                raise ValueError(
                    f"{path}:{seq + 1}: mismatched column count "
                    f"{len(line)} vs {len(header)}"
                )
            if not line[loncol] or not line[latcol]:
                continue  # null geometry skipped (geocsv.cpp:77-85)
            seqs.append(seq)
            lons.append(float(line[loncol]))
            lats.append(float(line[latcol]))
            for i, h in enumerate(header):
                if i not in (latcol, loncol):
                    attr_cols[h].append(line[i])
    wx, wy = lonlat_to_world(np.array(lons), np.array(lats))
    cols = {
        "seq": pa.array(seqs, pa.int64()),
        "wx": pa.array(wx.astype(np.int64)),
        "wy": pa.array(wy.astype(np.int64)),
    }
    for h in attr_names:
        name = h if h not in cols else h + "_attr"
        cols[name] = pa.array(attr_cols[h], pa.string())
    return pa.table(cols)
