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


# ------------------------------------------------- faithful CSV parsing
# (csv.cpp:5-54: csv_split keeps quotes and strips whitespace right
# after a comma; csv_dequote collapses doubled quotes; is_number is the
# JSON-number grammar)


def csv_split(s: str) -> list[str]:
    """csv.cpp:5-40 verbatim: split on commas outside quotes, stop at
    CR/LF, eat whitespace immediately after each comma, and a comma at
    end-of-line yields one trailing empty field."""
    ret: list[str] = []
    i = 0
    n = len(s)
    while i < n and s[i] not in "\n\r":
        start = i
        within = False
        while i < n and s[i] not in "\n\r":
            if s[i] == '"':
                within = not within
            if s[i] == "," and not within:
                break
            i += 1
        ret.append(s[start:i])
        if i < n and s[i] == ",":
            i += 1
            while i < n and s[i].isspace():
                i += 1
            if i >= n or s[i] in "\r\n":
                ret.append("")
                break
    return ret


def csv_dequote(s: str) -> str:
    """csv.cpp:42-54: drop quote characters, a doubled quote emits one."""
    out = []
    i = 0
    while i < len(s):
        if s[i] == '"':
            if i + 1 < len(s) and s[i + 1] == '"':
                out.append('"')
        else:
            out.append(s[i])
        i += 1
    return "".join(out)


def csv_is_number(s: str) -> bool:
    """csv.cpp:114-175 — the JSON number grammar (no leading zeros, an
    optional fraction that must have digits, an optional exponent)."""
    i = 0
    n = len(s)
    if i >= n or (s[i] != "-" and not s[i].isdigit()):
        return False
    if s[i] == "-":
        i += 1
        if i >= n:
            return False
    if i < n and s[i] == "0":
        i += 1
    elif i < n and s[i].isdigit():
        i += 1
        while i < n and s[i].isdigit():
            i += 1
    else:
        return False
    if i < n and s[i] == ".":
        i += 1
        if i >= n or not s[i].isdigit():
            return False
        while i < n and s[i].isdigit():
            i += 1
    if i < n and s[i] in "eE":
        i += 1
        if i < n and s[i] in "+-":
            i += 1
        if i >= n or not s[i].isdigit():
            return False
        while i < n and s[i].isdigit():
            i += 1
    return i == n


def read_geocsv_vector(path: str, empty_null: bool = False):
    """Parse a geocsv file the reference's way (parse_geocsv,
    geocsv.cpp:14-140) into vector-pipeline point features plus the
    attribute side table: returns (features pa.Table via
    features_table, {seq: (None, [(key, type, value), ...])}).

    - fields split with csv_split / csv_dequote (NOT python csv);
    - coordinates parsed from the RAW token with C atof semantics;
    - attribute typing: is_number → 'double' with the raw token kept,
      empty + `empty_null` (--empty-csv-columns-are-null) → 'null',
      else 'string';
    - seq numbers the EMITTED features consecutively (the serializer's
      counter; rows with empty coordinates are skipped)."""
    from ..functions.attributes import _atof
    from ..functions.text import check_utf8
    from ..pipelines.vector_pyramid import features_table

    with open(path, "rb") as f:
        raw = f.read()
    lines = raw.split(b"\n")
    # csv_getline keeps the newline and stops at EOF; a trailing empty
    # chunk after the final newline is not a line
    if lines and lines[-1] == b"":
        lines.pop()
    if not lines:
        raise ValueError(f"{path}: empty csv")
    err = check_utf8(lines[0])
    if err:
        raise ValueError(f"{path}: {err}")
    header = [csv_dequote(h) for h in csv_split(lines[0].decode("utf-8"))]
    latcol, loncol = sniff_latlon_columns(header)
    if latcol < 0 or loncol < 0:
        raise ValueError(f'{path}: can\'t find "lat" and "lon" columns')
    rows: list[tuple] = []
    attrs: dict = {}
    seq = 0
    for lineno, bline in enumerate(lines[1:], start=1):
        err = check_utf8(bline)
        if err:
            raise ValueError(f"{path}: {err}")
        line = csv_split(bline.decode("utf-8"))
        if len(line) != len(header):
            raise ValueError(
                f"{path}:{lineno + 1}: mismatched column count "
                f"{len(line)} vs {len(header)}"
            )
        if not line[loncol] or not line[latcol]:
            continue  # null geometry skipped (geocsv.cpp:77-85)
        lon = _atof(line[loncol])
        lat = _atof(line[latcol])
        wx, wy = lonlat_to_world(np.array([lon]), np.array([lat]))
        arows = []
        for i, h in enumerate(header):
            if i in (latcol, loncol):
                continue
            v = csv_dequote(line[i])
            if csv_is_number(v):
                arows.append((h, "double", v))
            elif len(v) == 0 and empty_null:
                arows.append((h, "null", "null"))
            else:
                arows.append((h, "string", v))
        attrs[seq] = (None, arows)
        rows.append(
            (seq, 1, np.array([1], np.uint8),
             np.array([[int(wx[0]), int(wy[0])]], np.int64))
        )
        seq += 1
    return features_table(rows), attrs
