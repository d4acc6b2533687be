"""hamming_near_dup_pairs: banded Hamming near-dup over a precomputed
64-bit hash column (the image table's phash, BASELINE.json input_hint).
Full recall at max_hamming <= bands-1 (pigeonhole), so the banded
result must EQUAL an all-pairs brute force."""

import numpy as np
import pandas as pd
import ray.data

from tippecanoe_ray.functions.hashing import popcount64, splitmix64
from tippecanoe_ray.pipelines.dedup import hamming_near_dup_pairs


def _brute(ids: np.ndarray, h: np.ndarray, max_hamming: int) -> pd.DataFrame:
    ii, jj = np.triu_indices(len(ids), k=1)
    ham = popcount64(h[ii] ^ h[jj])
    m = ham <= max_hamming
    df = pd.DataFrame({"a": ids[ii[m]], "b": ids[jj[m]], "hamming": ham[m]})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def test_hamming_near_dup_matches_brute_force(ray_session):
    # planted replica groups of 3 differing in <= 2 low bits, plus
    # random singletons — banding (4x16) must find exactly the
    # brute-force pair set at Hamming <= 3
    k = np.arange(240, dtype=np.int64)
    h = splitmix64((k // 3).astype(np.uint64)) ^ (k % 3).astype(np.uint64)
    ids = np.array([f"img-{i:06d}" for i in k])
    ds = ray.data.from_pandas(
        pd.DataFrame({"image_id": ids, "phash": h.view(np.int64)})
    )
    got = hamming_near_dup_pairs(ds, "phash", "image_id", max_hamming=3)
    want = _brute(ids, h, 3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"hamming": np.int64}),
        want.astype({"hamming": np.int64}),
    )
    assert len(got) >= 240 // 3 * 3  # every group contributes C(3,2) pairs


def test_hamming_near_dup_bands8(ray_session):
    # 8 bands of 8 bits: full recall up to Hamming 7
    rs = np.random.RandomState(7)
    base = rs.randint(0, 2**63, size=60).astype(np.uint64)
    # pair i with a copy having 5 random bits flipped
    flip = np.zeros(60, dtype=np.uint64)
    for i in range(60):
        bits = rs.choice(64, size=5, replace=False)
        flip[i] = np.bitwise_or.reduce((np.uint64(1) << bits.astype(np.uint64)))
    h = np.concatenate([base, base ^ flip])
    ids = np.array([f"v{i:04d}" for i in range(120)])
    ds = ray.data.from_pandas(
        pd.DataFrame({"image_id": ids, "phash": h.view(np.int64)})
    )
    got = hamming_near_dup_pairs(
        ds, "phash", "image_id", max_hamming=7, bands=8
    )
    want = _brute(ids, h, 7)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"hamming": np.int64}),
        want.astype({"hamming": np.int64}),
    )
