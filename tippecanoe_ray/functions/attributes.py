"""Attribute machinery — declarative per-feature attribute transforms
applied as vectorized Arrow batch maps (the reference applies them at
ingest, serial.cpp:785-958):

- include / exclude / exclude-all (-y / -x / -X)   serial.cpp:850-861
- set-attribute (--set-attribute)                  serial.cpp:785-799
- type coercion (-T) with tippecanoe's exact
  truthiness and rounding rules                    serial.cpp:924-958
- null-attribute removal                           tile.cpp:1321-1337
- UTF-16-rune-safe string truncation
  (--maximum-string-attribute-length)              text.cpp:110-135
- single precision (-pN): doubles -> float32       serial.cpp:804-811

All operate on pyarrow Tables whose attribute columns are the feature
attributes (the engine's columnar analogue of the key/value pool)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc

GEOM_COLS = {"seq", "t", "ops", "xy", "wx", "wy", "index", "label_x", "label_y", "minzoom"}


def include_exclude(
    t: pa.Table,
    include: set[str] | None = None,
    exclude: set[str] | None = None,
    exclude_all: bool = False,
) -> pa.Table:
    """-y keeps only `include`; -x drops `exclude`; -X drops everything
    not explicitly included (serial.cpp:850-861). Geometry/engine
    columns always survive."""
    keep = []
    for name in t.column_names:
        if name in GEOM_COLS:
            keep.append(name)
        elif exclude_all:
            if include and name in include:
                keep.append(name)
        elif include is not None:
            if name in include:
                keep.append(name)
        elif exclude and name in exclude:
            continue
        else:
            keep.append(name)
    return t.select(keep)


def set_attribute(t: pa.Table, name: str, value) -> pa.Table:
    """--set-attribute: overwrite or insert a constant attribute
    (serial.cpp:785-799)."""
    arr = pa.array([value] * len(t))
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


def drop_null_attributes(t: pa.Table) -> pa.Table:
    """Null-attribute removal (tile.cpp:1321-1337): in the columnar
    model a column that is entirely null is dropped; per-feature nulls
    are naturally absent at encode time (encode skips None)."""
    keep = [
        name
        for name in t.column_names
        if name in GEOM_COLS or t[name].null_count < len(t)
    ]
    return t.select(keep)


def coerce_string(val: str | None) -> tuple[str, str]:
    return "string", val if val is not None else ""



import re as _re

_NUM_PREFIX = _re.compile(r"[ \t\n\r\f\v]*[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")
# C strtod also accepts INF/INFINITY/NAN (case-insensitive, optional
# sign) — the reference corpus exercises these (geocsv lat/lon "nan"
# and "inf" rows feed lonlat2tile's NaN/infinity handling)
_SPECIAL_PREFIX = _re.compile(
    r"[ \t\n\r\f\v]*([+-]?)(infinity|inf|nan)", _re.IGNORECASE)


def _atof(s: str) -> float:
    """C strtod/atof: longest valid numeric prefix (including
    inf/infinity/nan), 0.0 otherwise."""
    sp = _SPECIAL_PREFIX.match(s)
    if sp:
        word = sp.group(2).lower()
        v = float("nan") if word == "nan" else float("inf")
        return -v if sp.group(1) == "-" else v
    m = _NUM_PREFIX.match(s)
    if not m:
        return 0.0
    try:
        return float(m.group(0))
    except ValueError:
        return 0.0

def _coerce_one(vt: str, val: str, want: str) -> tuple[str, str]:
    """coerce_value (serial.cpp:924-958) for one stringified value.
    vt: the current MVT-ish type tag ('string'|'double'|'bool'|'null');
    want: 'string'|'float'|'int'|'bool'."""
    if want == "string":
        return "string", val
    if want == "float":
        # serial.cpp:931: milo::dtoa_milo(atof(val)) — C atof parses the
        # longest numeric prefix and yields 0 for non-numeric input
        from .text import dtoa_milo

        return "double", dtoa_milo(_atof(val))
    if want == "int":
        if len(val) == 0:
            return "double", "0"
        if not val.isdigit():
            try:
                f = float(val)
            except ValueError:
                f = 0.0
            # std::to_string(round(x)) prints 6 decimal places
            r = float(math.floor(f + 0.5) if f >= 0 else math.ceil(f - 0.5))
            return "double", f"{r:.6f}"
        return "double", val
    if want == "bool":
        falsy = val in ("false", "0", "null") or len(val) == 0
        if not falsy and vt == "double":
            try:
                falsy = float(val) == 0
            except ValueError:
                falsy = False
        return "bool", "false" if falsy else "true"
    raise ValueError(f"unknown coercion target {want}")


def coerce_column(t: pa.Table, name: str, want: str) -> pa.Table:
    """-T name:type over an attribute column, reproducing the
    reference's truthiness rules. Values are handled as their
    stringified forms (the reference carries all numbers as decimal
    strings, serial.hpp:35-44)."""
    col = t[name]
    vt = "double" if pa.types.is_floating(col.type) or pa.types.is_integer(col.type) else "string"
    out_vals = []
    out_type = None
    for v in col.to_pylist():
        sval = "" if v is None else (
            (repr(v) if isinstance(v, float) and v != int(v) else str(int(v)))
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            else str(v)
        )
        ot, ov = _coerce_one(vt, sval, want)
        out_type = ot
        out_vals.append(ov)
    if out_type == "bool":
        arr = pa.array([v == "true" for v in out_vals])
    elif out_type == "double":
        arr = pa.array([float(v) for v in out_vals])
    else:
        arr = pa.array(out_vals)
    return t.set_column(t.column_names.index(name), name, arr)


def truncate16(s: str, runes: int) -> str:
    """UTF-16-rune-aware truncation (text.cpp:110-135): astral-plane
    characters count as two runes; never splits a code point."""
    out = []
    used = 0
    for ch in s:
        used += 2 if ord(ch) > 0xFFFF else 1
        if used <= runes:
            out.append(ch)
        else:
            break
    return "".join(out)


def truncate_string_attributes(t: pa.Table, max_len: int) -> pa.Table:
    """--maximum-string-attribute-length over all string columns."""
    for i, name in enumerate(t.column_names):
        if name in GEOM_COLS:
            continue
        if pa.types.is_string(t[name].type) or pa.types.is_large_string(t[name].type):
            vals = [
                None if v is None else (truncate16(v, max_len) if len(v) > max_len else v)
                for v in t[name].to_pylist()
            ]
            t = t.set_column(i, name, pa.array(vals, t[name].type))
    return t


def single_precision(t: pa.Table) -> pa.Table:
    """-pN: store doubles as float32 for smaller tiles
    (serial.cpp:804-811)."""
    for i, name in enumerate(t.column_names):
        if name in GEOM_COLS:
            continue
        if pa.types.is_float64(t[name].type):
            t = t.set_column(i, name, pc.cast(t[name], pa.float32()))
    return t
