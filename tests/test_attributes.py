"""Attribute machinery unit tests — semantics cited to serial.cpp /
text.cpp / tile.cpp; coercion truthiness cross-checked against the
reference rules."""

import pyarrow as pa

from tippecanoe_ray.functions.attributes import (
    coerce_column,
    drop_null_attributes,
    include_exclude,
    set_attribute,
    single_precision,
    truncate16,
    truncate_string_attributes,
)


def _t(**cols):
    return pa.table(cols)


def test_include_exclude():
    t = _t(seq=[1], a=["x"], b=["y"], c=["z"])
    assert include_exclude(t, exclude={"b"}).column_names == ["seq", "a", "c"]
    assert include_exclude(t, include={"a"}).column_names == ["seq", "a"]
    assert include_exclude(t, include={"c"}, exclude_all=True).column_names == ["seq", "c"]
    assert include_exclude(t, exclude_all=True).column_names == ["seq"]


def test_set_attribute():
    t = _t(a=[1, 2])
    t2 = set_attribute(t, "b", "v")
    assert t2["b"].to_pylist() == ["v", "v"]
    t3 = set_attribute(t2, "a", 9)
    assert t3["a"].to_pylist() == [9, 9]


def test_drop_null():
    t = _t(seq=[1, 2], a=[None, None], b=[1, None])
    assert drop_null_attributes(t).column_names == ["seq", "b"]


def test_coerce_bool_truthiness():
    """serial.cpp:946-955: false/0/null/empty and numeric 0 are falsy;
    everything else (incl. 'no') is true."""
    t = _t(v=["false", "0", "null", "", "no", "true", "0.0"])
    out = coerce_column(t, "v", "bool")["v"].to_pylist()
    assert out == [False, False, False, False, True, True, True]
    # numeric zero is falsy when the value is typed numeric
    t2 = _t(v=[0.0, 1.5, 0.0])
    out2 = coerce_column(t2, "v", "bool")["v"].to_pylist()
    assert out2 == [False, True, False]


def test_coerce_int():
    """non-digit strings round via atof; std::to_string prints 6dp."""
    t = _t(v=["12", "3.7", "", "abc", "-2.5"])
    out = coerce_column(t, "v", "int")["v"].to_pylist()
    assert out == [12.0, 4.0, 0.0, 0.0, -3.0]  # round() half away from zero


def test_coerce_float_and_string():
    t = _t(v=["1.25", "x"])
    assert coerce_column(t, "v", "float")["v"].to_pylist() == [1.25, 0.0]
    t2 = _t(v=[3])
    assert coerce_column(t2, "v", "string")["v"].to_pylist() == ["3"]


def test_truncate16():
    assert truncate16("hello", 3) == "hel"
    # astral-plane characters count as two UTF-16 runes (text.cpp:118-122)
    s = "a\U0001F600b"
    assert truncate16(s, 2) == "a"
    assert truncate16(s, 3) == "a\U0001F600"
    assert truncate16(s, 4) == s
    t = _t(v=["abcdef", "ab"])
    out = truncate_string_attributes(t, 4)["v"].to_pylist()
    assert out == ["abcd", "ab"]


def test_single_precision():
    t = _t(v=pa.array([1.100000000001], pa.float64()))
    out = single_precision(t)
    assert out["v"].type == pa.float32()
