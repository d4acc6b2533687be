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
