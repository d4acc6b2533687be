"""Unit tests for the pure vectorized kernels (no Ray needed)."""

import numpy as np
import pytest

from tippecanoe_ray.functions.hashing import fnv1a64, fnv1a64_strings, splitmix64
from tippecanoe_ray.functions.spatial import (
    decode_hilbert,
    decode_quadkey,
    encode_hilbert,
    encode_quadkey,
    lonlat_to_world,
    tile_of,
    world_to_lonlat,
)
from tippecanoe_ray.stages.minzoom import (
    drop_ladder_scan,
    minzoom_for_rank_range,
    minzoom_from_ranks,
)


def test_fnv_vector_matches_scalar():
    ids = [f"img-{i:012d}" for i in range(200)] + ["", "a", "hello world", "ü¢€"]
    vec = fnv1a64_strings(ids)
    for i, s in enumerate(ids):
        assert int(vec[i]) == fnv1a64(s)


def test_fnv_known_value():
    # public FNV-1a 64 test vector
    assert fnv1a64(b"") == 14695981039346656037
    assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C


def test_curves_roundtrip():
    rs = np.random.RandomState(7)
    wx = rs.randint(0, 2**32, 5000).astype(np.int64)
    wy = rs.randint(0, 2**32, 5000).astype(np.int64)
    qk = encode_quadkey(wx, wy)
    dx, dy = decode_quadkey(qk)
    np.testing.assert_array_equal(dx, wx.astype(np.uint64))
    np.testing.assert_array_equal(dy, wy.astype(np.uint64))
    hi = encode_hilbert(wx, wy)
    hx, hy = decode_hilbert(hi)
    np.testing.assert_array_equal(hx, wx.astype(np.uint64))
    np.testing.assert_array_equal(hy, wy.astype(np.uint64))


def test_hilbert_scalar_reference():
    # independent scalar implementation of the wikipedia algorithm with
    # 32-bit unsigned wrap (projection.cpp:106-139 semantics)
    def h_ref(x, y):
        d = 0
        s = 1 << 31
        while s > 0:
            rx = 1 if (x & s) else 0
            ry = 1 if (y & s) else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = (s - 1 - x) & 0xFFFFFFFF
                    y = (s - 1 - y) & 0xFFFFFFFF
                x, y = y, x
            s //= 2
        return d

    rs = np.random.RandomState(3)
    wx = rs.randint(0, 2**32, 64).astype(np.int64)
    wy = rs.randint(0, 2**32, 64).astype(np.int64)
    hi = encode_hilbert(wx, wy)
    for i in range(len(wx)):
        assert int(hi[i]) == h_ref(int(wx[i]), int(wy[i]))


def test_projection_fixed_points():
    wx, wy = lonlat_to_world(np.array([0.0, -180.0, 180.0]), np.array([0.0, 0.0, 0.0]))
    assert wx.tolist() == [2**31, 0, 2**32]
    assert wy.tolist() == [2**31, 2**31, 2**31]
    # NaN/inf handling per projection.cpp:22-55
    wx, wy = lonlat_to_world(np.array([np.nan, np.inf]), np.array([np.inf, np.nan]))
    assert (wx > 2**32).all()  # pushed off-plane


def test_projection_roundtrip_stability():
    rs = np.random.RandomState(11)
    wx = rs.randint(0, 2**32, 10000).astype(np.int64)
    wy = rs.randint(1 << 28, 2**32 - (1 << 28), 10000).astype(np.int64)
    lon, lat = world_to_lonlat(wx, wy)
    wx2, wy2 = lonlat_to_world(lon, lat)
    assert int(np.abs(wx2 - wx).max()) <= 1
    assert int(np.abs(wy2 - wy).max()) <= 1


def test_tile_of():
    tx, ty = tile_of(np.array([0, 2**31, 2**32 - 1]), np.array([0, 2**31, 2**32 - 1]), 4)
    assert tx.tolist() == [0, 8, 15]
    assert ty.tolist() == [0, 8, 15]


@pytest.mark.parametrize(
    "n,maxzoom,basezoom,droprate",
    [(3000, 14, 14, 2.5), (3000, 14, 14, 1.0), (4000, 10, 8, 2.0), (2500, 14, 16, 2.5)],
)
def test_minzoom_vec_matches_scan(n, maxzoom, basezoom, droprate):
    a = drop_ladder_scan(n, maxzoom, basezoom, droprate)
    b = minzoom_from_ranks(n, maxzoom, basezoom, droprate)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "maxzoom,basezoom,droprate",
    [(6, 4, 2.5), (14, 14, 2.5), (10, 7, 1.5), (6, 4, 2.37862)],
)
def test_minzoom_matches_cpp_interleave(maxzoom, basezoom, droprate):
    """Bit-faithful emulation of calc_feature_minzoom's INTERLEAVED
    float state (main.cpp:299-325: seq++ per feature per level, then
    descending test-and-subtract with break) must equal the vectorized
    cascade — the repeated-subtraction thresholds are the exact model."""
    from tippecanoe_ray.stages.minzoom import intervals

    n = 1500
    iv = intervals(maxzoom, basezoom, droprate)
    seq = [0.0] * (maxzoom + 1)
    cpp = np.zeros(n, np.uint8)
    for m in range(n):
        for i in range(maxzoom, -1, -1):
            seq[i] += 1.0
        for i in range(maxzoom, -1, -1):
            if seq[i] < 0:
                cpp[m] = i + 1
                break
            seq[i] -= iv[i]
    np.testing.assert_array_equal(cpp, minzoom_from_ranks(n, maxzoom, basezoom, droprate))


@pytest.mark.parametrize(
    "maxzoom,basezoom,droprate",
    # incl. basezoom BELOW maxzoom (apron windows must build the full
    # global threshold ladder, not len(surv)+2 entries) and a sub-2
    # droprate (steady-state never pins — exercises the from-origin
    # fallback)
    [(14, 14, 2.5), (6, 4, 2.5), (10, 7, 1.5), (8, 4, 5.0), (6, 4, 3.7)],
)
def test_minzoom_rank_range_matches_full(maxzoom, basezoom, droprate):
    n = 200_000
    full = minzoom_from_ranks(n, maxzoom, basezoom, droprate)
    rs = np.random.RandomState(5)
    for _ in range(12):
        r0 = int(rs.randint(0, n - 100))
        r1 = min(n, r0 + int(rs.randint(1, 40000)))
        part = minzoom_for_rank_range(r0, r1, maxzoom, basezoom, droprate)
        np.testing.assert_array_equal(part, full[r0:r1])


def test_splitmix_dispersion():
    h = splitmix64(np.arange(10000, dtype=np.uint64))
    # low 16 bits should be near-uniform
    _, counts = np.unique(h & np.uint64(0xF), return_counts=True)
    assert counts.min() > 400


def test_dtoa_milo_formats():
    """milo::dtoa_milo parity (functions/text.py): Grisu2 digits +
    prettify rules — probed 3000+ random doubles bit-exact vs the
    reference header; these pin the format boundaries."""
    from tippecanoe_ray.functions.text import dtoa_milo

    assert dtoa_milo(0.0) == "0"
    assert dtoa_milo(1.0) == "1"
    assert dtoa_milo(-1.5) == "-1.5"
    assert dtoa_milo(0.1) == "0.1"
    assert dtoa_milo(1e20) == "100000000000000000000"
    assert dtoa_milo(1e21) == "1e+21"          # e-notation threshold
    assert dtoa_milo(5e-7) == "5e-7"
    assert dtoa_milo(1e-6) == "0.000001"
    assert dtoa_milo(1234.5678) == "1234.5678"
    assert dtoa_milo(float("inf")) == "inf"
    assert dtoa_milo(float("-inf")) == "-inf"
    assert dtoa_milo(float("nan")) == "nan"


def test_dtoa_milo_vs_probe():
    import os
    import random
    import struct
    import subprocess

    import pytest

    if not os.path.exists("/tmp/dtoa_probe"):
        pytest.skip("dtoa probe not built")
    from tippecanoe_ray.functions.text import dtoa_milo

    rng = random.Random(99)
    vals = []
    for _ in range(400):
        b = rng.getrandbits(64)
        v = struct.unpack("<d", struct.pack("<Q", b))[0]
        if v == v and abs(v) != float("inf"):
            vals.append(v)
    hexes = "\n".join(
        format(struct.unpack("<Q", struct.pack("<d", v))[0], "x") for v in vals
    )
    out = subprocess.run(["/tmp/dtoa_probe"], input=hexes,
                         capture_output=True, text=True)
    for v, exp in zip(vals, out.stdout.splitlines()):
        assert dtoa_milo(v) == exp, v


def test_unidecode_roundtrip(tmp_path):
    """text.cpp:191-257: NUL-separated table, 1-indexed + two empty
    prefix entries, ASCII lowercased; smash maps codepoints and passes
    out-of-range through."""
    from tippecanoe_ray.functions.text import read_unidecode, unidecode_smash

    data = b"A\x00B\x00\xc3\xa9\x00"  # entries for codepoints 2, 3, 4
    p = tmp_path / "uni.bin"
    p.write_bytes(data)
    table = read_unidecode(str(p))
    assert table[0] == "" and table[1] == ""
    assert table[2] == "a" and table[3] == "b"     # lowercased ASCII
    assert unidecode_smash(table, "\x02\x03") == "ab"
    assert unidecode_smash(table, "zzz") == "zzz"  # out of range passes
    assert unidecode_smash([], "abc") == "abc"     # no table = identity
