"""Guessing passes + tilestats + filter expressions."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from tippecanoe_ray.functions.filters import compile_filter, filter_dataset
from tippecanoe_ray.pipelines.pyramid import PyramidConfig, add_bucket, geotag_narrow
from tippecanoe_ray.sources.image_table import synthesize_image_table
from tippecanoe_ray.stages.stats import (
    guess_basezoom_droprate,
    guess_maxzoom,
    index_statistics,
    tilestats,
)


def _narrow(n, hotspot=0.0):
    ds = synthesize_image_table(n, with_payload=False)
    cfg = PyramidConfig(hotspot_frac=hotspot)
    return add_bucket(geotag_narrow(ds, cfg), 3)


def test_welford_merge_matches_direct(ray_session):
    nb = _narrow(3000)
    stats = index_statistics(nb, max_zoom_hist=8)
    # direct single-pass computation
    import pyarrow.compute as pc

    idx = np.sort(
        np.concatenate(
            [t["index"].to_numpy(zero_copy_only=False) for t in nb.to_arrow_refs_resolved()]
        ).astype(np.uint64)
    ) if False else None
    df = nb.to_pandas()
    s = np.sort(df["index"].to_numpy().astype(np.uint64))
    diffs = (s[1:] - s[:-1]).astype(np.float64)
    logs = np.log(diffs[diffs > 0])
    assert stats["count"] == len(logs)
    assert abs(stats["mean"] - logs.mean()) < 1e-9
    assert abs(stats["m2"] - ((logs - logs.mean()) ** 2).sum()) < 1e-6 * max(1, stats["m2"])


def test_guess_maxzoom_reasonable(ray_session):
    stats_u = index_statistics(_narrow(3000), max_zoom_hist=8)
    mz_u = guess_maxzoom(stats_u)
    stats_h = index_statistics(_narrow(3000, hotspot=0.9), max_zoom_hist=8)
    mz_h = guess_maxzoom(stats_h)
    assert 0 <= mz_u <= 20
    assert mz_h >= mz_u  # clustered data needs deeper zooms


def test_guess_basezoom(ray_session):
    stats = index_statistics(_narrow(4000, hotspot=0.8), max_zoom_hist=10)
    bz, dr = guess_basezoom_droprate(stats, maxzoom=10, max_features=50)
    assert 0 < bz <= 10
    assert dr >= 1.0


def test_tilestats(ray_session):
    df = pd.DataFrame(
        {
            "name": [f"n{i % 7}" for i in range(200)],
            "score": np.arange(200) * 0.5,
            "flag": ["yes" if i % 2 else None for i in range(200)],
        }
    )
    ds = ray.data.from_pandas(df)
    st = tilestats(ds, ["name", "score", "flag"])
    attrs = {a["attribute"]: a for a in st["attributes"]}
    assert attrs["score"]["type"] == "number"
    assert attrs["score"]["min"] == 0.0 and attrs["score"]["max"] == 99.5
    assert len(attrs["name"]["values"]) == 7
    assert attrs["flag"]["count"] == 100
    assert st["attributeCount"] == 3


def test_filter_expressions(ray_session):
    df = pd.DataFrame(
        {
            "kind": ["a", "b", "a", "c", None],
            "pop": [10, 200, 35, 4, 50],
        }
    )
    f = compile_filter([">=", "pop", 30])
    assert f.mask(df).tolist() == [False, True, True, False, True]
    f = compile_filter(["all", ["==", "kind", "a"], ["<", "pop", 20]])
    assert f.mask(df).tolist() == [True, False, False, False, False]
    f = compile_filter(["in", "kind", "a", "c"])
    assert f.mask(df).tolist() == [True, False, True, True, False]
    f = compile_filter(["!has", "kind"])
    assert f.mask(df).tolist() == [False, False, False, False, True]
    f = compile_filter(["none", ["==", "kind", "b"], ["==", "kind", "c"]])
    assert f.mask(df).tolist() == [True, False, True, False, True]
    # $zoom variable + per-layer wildcard
    f = compile_filter({"*": [">=", "$zoom", 5]})
    assert f.mask(df, zoom=4).sum() == 0
    assert f.mask(df, zoom=5).sum() == 5
    # class-mismatch semantics: string vs number never equal, != true
    f = compile_filter(["==", "kind", 3])
    assert f.mask(df).sum() == 0
    f = compile_filter(["!=", "kind", 3])
    assert f.mask(df).tolist() == [True, True, True, True, False]
    # dataset-level filter
    ds = ray.data.from_pandas(df)
    out = filter_dataset(ds, [">", "pop", 30]).to_pandas()
    assert len(out) == 3
