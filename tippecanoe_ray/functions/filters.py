"""Feature-filter expressions (`-j` / `-J`) — the Mapbox-GL-legacy
filter language of the reference's evaluator (evaluator.cpp:94-365),
compiled to vectorized pandas predicates.

Supported operators: ==, !=, <, <=, >, >=, has, !has, in, !in,
all, any, none; special keys $zoom, $type, $id. A filter document may
be a bare expression (applies to every layer) or a {layer: expr} map
with "*" as the wildcard layer (evaluator.cpp / tile.cpp:1231-1288).

Type semantics per the reference: values of different classes (string
vs number vs bool) are never equal and fail ordered comparisons
(evaluator.cpp:116-180): comparisons on mismatched types evaluate to
false (so both `==` and its negation can be false).
"""

from __future__ import annotations

import numbers

import numpy as np
import pandas as pd


def _is_num(v) -> bool:
    return isinstance(v, numbers.Number) and not isinstance(v, bool)


def _cmp_series(s: pd.Series, v, op: str) -> pd.Series:
    """Vectorized comparison with class-matched semantics."""
    if isinstance(v, bool):
        cls = s.map(lambda x: isinstance(x, bool))
    elif _is_num(v):
        cls = s.map(_is_num)
    else:
        cls = s.map(lambda x: isinstance(x, str))
    out = pd.Series(False, index=s.index, dtype=bool)
    if op == "!=":
        # class mismatch ⇒ not equal ⇒ true for != (evaluator.cpp:199);
        # missing values fail every comparison
        out[~cls & s.notna()] = True
    if not cls.any():
        return out
    sub = s[cls]
    if op == "==":
        r = sub == v
    elif op == "!=":
        r = sub != v
    elif op == "<":
        r = sub < v
    elif op == "<=":
        r = sub <= v
    elif op == ">":
        r = sub > v
    elif op == ">=":
        r = sub >= v
    else:
        raise ValueError(op)
    out.loc[cls] = r.astype(bool).to_numpy()
    return out


class CompiledFilter:
    """A compiled per-layer filter; call .mask(df, zoom=, layer=)."""

    def __init__(self, doc):
        if isinstance(doc, dict):
            self.per_layer = {k: v for k, v in doc.items()}
        else:
            self.per_layer = {"*": doc}

    def _expr_for(self, layer: str):
        if layer in self.per_layer:
            return self.per_layer[layer]
        return self.per_layer.get("*")

    def mask(self, df: pd.DataFrame, zoom: int = 0, layer: str = "*",
             type_col: str | None = None, id_col: str | None = None) -> np.ndarray:
        expr = self._expr_for(layer)
        if expr is None:
            return np.ones(len(df), dtype=bool)
        return self._eval(expr, df, zoom, type_col, id_col).to_numpy()

    def _col(self, df: pd.DataFrame, key: str, zoom: int, type_col, id_col) -> pd.Series:
        if key == "$zoom":
            return pd.Series(zoom, index=df.index)
        if key == "$type":
            if type_col and type_col in df:
                return df[type_col]
            return pd.Series("Point", index=df.index)
        if key == "$id":
            if id_col and id_col in df:
                return df[id_col]
            return pd.Series(np.nan, index=df.index)
        if key in df.columns:
            return df[key]
        return pd.Series([None] * len(df), index=df.index)

    def _eval(self, expr, df: pd.DataFrame, zoom: int, type_col, id_col) -> pd.Series:
        if not isinstance(expr, list) or not expr:
            raise ValueError(f"bad filter expression: {expr!r}")
        op = expr[0]
        if op == "all":
            out = pd.Series(True, index=df.index)
            for sub in expr[1:]:
                out &= self._eval(sub, df, zoom, type_col, id_col)
            return out
        if op == "any":
            out = pd.Series(False, index=df.index)
            for sub in expr[1:]:
                out |= self._eval(sub, df, zoom, type_col, id_col)
            return out
        if op == "none":
            out = pd.Series(False, index=df.index)
            for sub in expr[1:]:
                out |= self._eval(sub, df, zoom, type_col, id_col)
            return ~out
        if op == "has":
            s = self._col(df, expr[1], zoom, type_col, id_col)
            return s.notna() & s.map(lambda x: x is not None)
        if op == "!has":
            s = self._col(df, expr[1], zoom, type_col, id_col)
            return ~(s.notna() & s.map(lambda x: x is not None))
        if op == "in":
            s = self._col(df, expr[1], zoom, type_col, id_col)
            out = pd.Series(False, index=df.index)
            for v in expr[2:]:
                out |= _cmp_series(s, v, "==")
            return out
        if op == "!in":
            s = self._col(df, expr[1], zoom, type_col, id_col)
            out = pd.Series(False, index=df.index)
            for v in expr[2:]:
                out |= _cmp_series(s, v, "==")
            return ~out
        if op in ("==", "!=", "<", "<=", ">", ">="):
            s = self._col(df, expr[1], zoom, type_col, id_col)
            return _cmp_series(s, expr[2], op)
        raise ValueError(f"unknown filter op {op!r}")


def compile_filter(doc) -> CompiledFilter:
    return CompiledFilter(doc)


def filter_dataset(ds, doc, zoom: int = 0, layer: str = "*"):
    """Apply a compiled filter to a Dataset of attribute rows."""
    f = compile_filter(doc)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df[f.mask(df, zoom=zoom, layer=layer)]

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# Row-wise evaluation over stringified serial values (the vector
# pipeline's -j/-J gate, evaluator.cpp:94-412 + tile.cpp:1231-1288).

_NO_KEY = ("__no_such_key__", "")
_TYPE_NAME = {1: "Point", 2: "LineString", 3: "Polygon"}


def _compare_sv(vt: str, s: str, two) -> tuple[int, bool]:
    """compare() (evaluator.cpp:12-89): (cmp, fail). `two` is a parsed
    JSON literal. Classes never mix (fail=True). Reproduces the
    reference's asymmetric bool compare (`one > two` as the cmp)."""
    if vt == "string":
        if not isinstance(two, str):
            return 0, True
        return (s > two) - (s < two), False
    if vt == "double":
        if isinstance(two, bool) or not isinstance(two, (int, float)):
            return 0, True
        v = float(s)
        w = float(two)
        return (v > w) - (v < w), False
    if vt == "bool":
        if not isinstance(two, bool):
            return 0, True
        return int((s == "true") > two), False
    if vt == "null":
        if two is not None:
            return 0, True
        return 0, False
    raise ValueError(f"bad serial value type {vt!r}")


def _eval_sv(get, f, excl: set) -> int:
    """eval() (evaluator.cpp:94-343) over a key->(<vt>,<s>) getter."""
    if f is True or f is None:
        return 1
    if f is False:
        return 0
    if isinstance(f, (int, float)):
        return 0 if f == 0 else 1
    if isinstance(f, str):
        return 0 if f == "" else 1
    if not isinstance(f, list) or not f or not isinstance(f[0], str):
        raise ValueError(f"bad filter expression: {f!r}")
    op = f[0]
    if op in ("has", "!has"):
        present = get(f[1]) is not _NO_KEY
        return int(present if op == "has" else not present)
    if op in ("==", "!=", "<", "<=", ">", ">="):
        ff = get(f[1])
        if ff is _NO_KEY:
            return int(op == "!=")  # not found: only != is true
        cmp, fail = _compare_sv(ff[0], ff[1], f[2])
        if fail:
            return int(op == "!=")  # mismatched classes are not equal
        return int({"==": cmp == 0, "!=": cmp != 0, ">": cmp > 0,
                    ">=": cmp >= 0, "<": cmp < 0, "<=": cmp <= 0}[op])
    if op in ("all", "any", "none"):
        v = op == "all"
        for sub in f[1:]:
            out = _eval_sv(get, sub, excl)
            if op == "all":
                v = v and out > 0
                if not v:
                    break
            else:
                v = v or out > 0
                if v:
                    break
        return int(not v) if op == "none" else int(v)
    if op in ("in", "!in"):
        ff = get(f[1])
        if ff is _NO_KEY:
            return int(op == "!in")
        found = False
        for two in f[2:]:
            cmp, fail = _compare_sv(ff[0], ff[1], two)
            if not fail and cmp == 0:
                found = True
                break
        return int(found if op == "in" else not found)
    if op == "attribute-filter":
        if _eval_sv(get, f[2], excl) <= 0:
            excl.add(f[1])
        return 1
    raise ValueError(f"unknown filter op {op!r}")


def evaluate_feature(filter_doc: dict, layer: str, rows, t: int,
                     fid, zoom: int) -> tuple[bool, set]:
    """evaluate() (evaluator.cpp:345-412) for one feature: the layer's
    expression AND the "*" expression must both pass. rows are the
    feature's stringified (key, vt, s) attributes; $id/$type/$zoom are
    added insert-if-absent AFTER them (tile.cpp:1254-1279 unordered_map
    insert keeps the first value). Returns (keep, exclude_attributes)."""
    attrs: dict = {}
    for k, vt, s in rows:
        attrs.setdefault(k, (vt, s))
    if fid is not None:
        attrs.setdefault("$id", ("double", str(fid)))
    attrs.setdefault("$type", ("string", _TYPE_NAME.get(t, "Point")))
    attrs.setdefault("$zoom", ("double", str(zoom)))

    def get(key: str):
        return attrs.get(key, _NO_KEY)

    excl: set = set()
    ok = True
    f = filter_doc.get(layer)
    if ok and f is not None:
        ok = _eval_sv(get, f, excl) > 0
    f = filter_doc.get("*")
    if ok and f is not None:
        ok = _eval_sv(get, f, excl) > 0
    return ok, excl
