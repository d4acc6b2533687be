"""Deterministic geotagging + spatial-index assignment (map_batches stage).

The input table (image_id, bytes, w, h, fmt, caption, phash) has no
lat/lon; positions are a pure function of the row (FIXTURES.md §1) so
tile assignment is reproducible and cross-checkable:

- ``fnv`` rule (authoritative): h = fnv1a64(image_id);
  wx = h & 0xFFFFFFFF; wy = (h >> 32) & 0xFFFFFFFF — uniform on the
  2^32×2^32 world plane (the reference's native coordinate system,
  /root/reference/projection.cpp:22-65). An optional hotspot fraction
  maps rows into small city bboxes chosen by h % n_hotspots, to
  exercise skew handling.
- ``lcg`` rule (oracle-friendly): wx/wy from Knuth-style multiplicative
  mixes of an integer key, expressible 1:1 in ANSI SQL so DuckDB can
  recompute tile assignments as a correctness oracle.

Both emit int64 ``wx``, ``wy`` plus the uint64 spatial ``index``
(quadkey by default, Hilbert optional — projection.cpp:106-199) as a
vectorized, zero-copy ``map_batches(batch_format="pyarrow")`` stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a64_strings
from ..functions.spatial import M32, encode_hilbert, encode_quadkey

# LCG-rule constants — small enough that key*A fits in int64 for the key
# ranges of the test tables, so the same expression works in DuckDB SQL.
LCG_A_X = 2654435761  # Knuth multiplicative hash constant (2^32 * phi)
LCG_A_Y = 2246822519  # xxhash prime 2
LCG_C_Y = 374761393  # xxhash prime 5
WORLD_MOD = 1 << 32


def lcg_world(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """SQL-expressible world position:
    wx = (key * 2654435761) % 2^32
    wy = ((key + 374761393) * 2246822519) % 2^32
    """
    k = np.asarray(key, dtype=np.int64)
    wx = (k * LCG_A_X) % WORLD_MOD
    wy = ((k + LCG_C_Y) * LCG_A_Y) % WORLD_MOD
    return wx, wy


def lcg_world_sql(key_expr: str) -> tuple[str, str]:
    """The identical rule as DuckDB SQL expressions."""
    wx = f"(({key_expr}) * {LCG_A_X}) % {WORLD_MOD}"
    wy = f"((({key_expr}) + {LCG_C_Y}) * {LCG_A_Y}) % {WORLD_MOD}"
    return wx, wy


# Hotspot bboxes: (wx0, wy0, span) on the world plane; deterministic
# "city" rectangles ~1/2^10 of the world across (≈ a zoom-10 tile).
def _hotspot_boxes(n_hotspots: int, seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    span = 1 << 22  # 2^32 / 2^10
    x0 = rs.randint(0, WORLD_MOD - span, size=n_hotspots).astype(np.int64)
    y0 = rs.randint(WORLD_MOD // 8, WORLD_MOD - WORLD_MOD // 8 - span, size=n_hotspots).astype(np.int64)
    return np.stack([x0, y0, np.full(n_hotspots, span, dtype=np.int64)], axis=1)


def fnv_world(
    image_ids,
    hotspot_frac: float = 0.0,
    n_hotspots: int = 4,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """FIXTURES.md §1 geotag rule over image_id strings.

    NOTE: raw FNV-1a has weak low-bit avalanche for ids differing only
    in their last characters (the final byte perturbs wx by only
    ~Δ·0x1b3), which clumps sequential ids and violates the intended
    uniform distribution on the world plane. We therefore finalize with
    splitmix64 — still "a stable 64-bit hash of image_id", now uniform.
    The identical rule is applied when deriving GeoJSON for the
    reference binary, so golden tile assignments stay comparable.
    """
    from ..functions.hashing import splitmix64

    h = splitmix64(fnv1a64_strings(image_ids))
    wx = (h & M32).astype(np.int64)
    wy = ((h >> np.uint64(32)) & M32).astype(np.int64)
    if hotspot_frac > 0:
        boxes = _hotspot_boxes(n_hotspots, seed)
        # h2: an independent mix so hotspot membership does not correlate
        # with position bits
        from ..functions.hashing import splitmix64

        h2 = splitmix64(h)
        hot = (h2 % np.uint64(10_000)) < np.uint64(int(hotspot_frac * 10_000))
        which = (h2 >> np.uint64(16)) % np.uint64(len(boxes))
        bx = boxes[which.astype(np.int64)]
        frac_x = (h & M32).astype(np.float64) / WORLD_MOD
        frac_y = ((h >> np.uint64(32)) & M32).astype(np.float64) / WORLD_MOD
        hx = bx[:, 0] + (frac_x * bx[:, 2]).astype(np.int64)
        hy = bx[:, 1] + (frac_y * bx[:, 2]).astype(np.int64)
        wx = np.where(hot, hx, wx)
        wy = np.where(hot, hy, wy)
    return wx, wy


class Geotag:
    """map_batches callable: append wx, wy, index, seq columns.

    Stateless and vectorized; usable as a plain function too. ``seq``
    preserves input identity for stable (index, seq) sort ties
    (reference: composite sort key main.cpp:247-264).
    """

    def __init__(
        self,
        id_col: str = "image_id",
        rule: str = "fnv",
        curve: str = "quadkey",
        hotspot_frac: float = 0.0,
        n_hotspots: int = 4,
        seq_col: str | None = None,
        seed: int = 42,
    ):
        self.id_col = id_col
        self.rule = rule
        self.curve = curve
        self.hotspot_frac = hotspot_frac
        self.n_hotspots = n_hotspots
        self.seq_col = seq_col
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.rule == "fnv":
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            wx, wy = fnv_world(ids, self.hotspot_frac, self.n_hotspots, self.seed)
        elif self.rule == "lcg":
            key = batch[self.id_col].to_numpy(zero_copy_only=False)
            wx, wy = lcg_world(key)
        else:
            raise ValueError(f"unknown geotag rule {self.rule!r}")
        # the reference's point index drops the bottom coordinate bit
        # ("keep old behavior, which loses one bit of precision",
        # serial.cpp:689-692) — reproduce for identical sort order
        ix = wx & ~np.int64(1)
        iy = wy & ~np.int64(1)
        if self.curve == "quadkey":
            index = encode_quadkey(ix, iy)
        elif self.curve == "hilbert":
            index = encode_hilbert(ix, iy)
        else:
            raise ValueError(f"unknown curve {self.curve!r}")
        def _set(t: pa.Table, name: str, arr: pa.Array) -> pa.Table:
            # overwrite rather than duplicate when the input already
            # carries a column of the same name (e.g. a persisted table
            # that was geotagged before)
            if name in t.column_names:
                return t.set_column(t.column_names.index(name), name, arr)
            return t.append_column(name, arr)

        out = _set(batch, "wx", pa.array(wx, type=pa.int64()))
        out = _set(out, "wy", pa.array(wy, type=pa.int64()))
        out = _set(out, "index", pa.array(index, type=pa.uint64()))
        # strip schema-level metadata (parquet's b'pandas' blob): Ray's
        # shuffle schema-dedup calls hash(schema), which raises
        # "unhashable type: 'dict'" on metadata-carrying schemas and
        # warns once per reduce task (zero-copy)
        out = out.replace_schema_metadata(None)
        if self.seq_col is not None and self.seq_col == "seq" and "seq" in batch.column_names:
            return out  # input already carries the sequence column
        if self.seq_col is not None:
            seq = batch[self.seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            # derive a deterministic per-row sequence from the id hash so
            # ties on `index` break identically at any parallelism level
            seq = fnv1a64_strings(batch[self.id_col].to_numpy(zero_copy_only=False)).astype(np.int64) \
                if self.rule == "fnv" else key.astype(np.int64)
        return _set(out, "seq", pa.array(seq, type=pa.int64()))
