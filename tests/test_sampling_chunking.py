"""Unit tests for the deterministic sampling and chunking operators
(the oracle harness covers end-to-end equality; these pin the edge
semantics)."""

import numpy as np
import pandas as pd
import pytest

from tippecanoe_ray.functions.hashing import splitmix64
from tippecanoe_ray.pipelines.textpipe import Chunker


def test_chunker_windows_and_tail():
    c = Chunker(size=8, overlap=2)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [" ".join(str(i) for i in range(20)),  # 20 tokens
                 "one two",                            # short: one chunk
                 ""],                                  # empty: no chunks
    })
    out = c(df)
    # stride 6: windows [0:8] [6:14] [12:20] [18:20]
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_idx) == [0, 1, 2, 3]
    assert list(d1.n_tokens) == [8, 8, 8, 2]
    assert list(out[out.doc_id == 2].n_tokens) == [2]
    assert (out.doc_id == 3).sum() == 0


def test_chunker_hash_matches_rejoin():
    from tippecanoe_ray.functions.hashing import fnv1a64_strings

    c = Chunker(size=4, overlap=0)
    out = c(pd.DataFrame({"doc_id": [7], "text": ["a  b\tc\nd e"]}))
    # whitespace runs collapse; chunks rejoin with single spaces
    expect = fnv1a64_strings(np.array(["a b c d", "e"], object))
    assert list(out.chunk_hash) == list(expect.astype(np.int64))


def test_chunker_rejects_bad_overlap():
    with pytest.raises(ValueError):
        Chunker(size=4, overlap=4)


def test_stratified_sample_smallest_ranks(ray_session):
    import ray

    from tippecanoe_ray.pipelines.sampling import stratified_sample

    n = 500
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "key": np.arange(n) % 3})
    out = stratified_sample(
        ray.data.from_pandas(df), "key", "doc_id", 5).to_pandas()
    assert len(out) == 15
    ranks = splitmix64(np.arange(n).astype(np.uint64))
    for k in range(3):
        ids = df.doc_id[df.key == k].to_numpy()
        expect = set(ids[np.argsort(ranks[ids])][:5].tolist())
        assert set(out.doc_id[out.key == k]) == expect


def test_rate_sample_deterministic(ray_session):
    import ray

    from tippecanoe_ray.pipelines.sampling import rate_sample

    df = pd.DataFrame({"doc_id": np.arange(2000)})
    a = rate_sample(ray.data.from_pandas(df), "doc_id", 0.25).to_pandas()
    b = rate_sample(ray.data.from_pandas(df), "doc_id", 0.25).to_pandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    assert 0.18 < len(a) / 2000 < 0.32  # ~Bernoulli(0.25)
    thr = np.uint64(int(0.25 * float(1 << 64)))
    expect = np.arange(2000)[
        splitmix64(np.arange(2000).astype(np.uint64)) < thr]
    assert sorted(a.doc_id) == expect.tolist()


def test_connected_components_shapes(ray_session):
    import pandas as pd

    from tippecanoe_ray.pipelines.components import (
        connected_components, dedup_groups,
    )

    pairs = pd.DataFrame({"a": [1, 2, 3, 10, 20, 21, 20, 30],
                          "b": [2, 3, 4, 11, 21, 22, 22, 31]})
    cc = connected_components(pairs)
    got = dict(zip(cc.node, cc.component))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}
    g = dedup_groups(pairs)
    assert list(zip(g.component, g.n_members)) == [
        (1, 4), (10, 2), (20, 3), (30, 2)]


def test_connected_components_chain(ray_session):
    import numpy as np
    import pandas as pd

    from tippecanoe_ray.pipelines.components import connected_components

    n = 300  # pathological single chain: worst case for round count
    pairs = pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    cc = connected_components(pairs)
    assert len(cc) == n and (cc.component == 0).all()
    assert len(connected_components(pairs.head(0))) == 0
