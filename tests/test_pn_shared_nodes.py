"""-pn / --no-simplification-of-shared-nodes (serial.cpp:507-599,
main.cpp:2015-2169, geometry.cpp:234-268, clip.cpp:781-877).

The global node pass was verified byte-exact against an instrumented
reference build (identical 1027-entry node index on NE countries);
these tests pin the behavior against the stock reference binary:
per-tile feature counts must match exactly on polygon corpora, and
LINE geometry must match vertex-exact (polygon output differs only by
the reference's wagyu union restructuring — ring rotation/merging in
clean_or_clip_poly, a documented deviation of clean_poly_tile_scale).
"""

import os
import sqlite3
import subprocess
import tempfile

import numpy as np
import pytest

from tests.conftest import has_reference


def _src(name):
    p = f"/root/reference/tests/{name}/in.json"
    return p if os.path.exists(p) else p + ".gz"


def _ref_tiles(src, maxzoom, extra):
    from tests.util_reference import TIPPECANOE

    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "o.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, f"-z{maxzoom}", "--no-tile-size-limit",
             "-q", *extra, src],
            check=True, capture_output=True,
        )
        con = sqlite3.connect(mb)
        out = {}
        for z, x, y, data in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        ):
            out[(z, x, (1 << z) - 1 - y)] = bytes(data)
        con.close()
        return out


def _our_tiles(src, cfg):
    from tippecanoe_ray.pipelines.vector_pyramid import (
        build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.sources.geojson import read_geojson_vector

    tiles = build_vector_pyramid(ingest_features(read_geojson_vector(src), cfg), cfg)
    return {
        (int(r["z"]), int(r["x"]), int(r["y"])): bytes(r["tile"])
        for r in tiles.take_all()
        if r["n_features"] > 0  # skip strategy-counter phantom rows
    }


def _geoms(data):
    from tippecanoe_ray.stages.mvt import decode_tile

    out = []
    for layer in decode_tile(data):
        for f in layer["features"]:
            out.append((f["type"], tuple(
                (cmd, tuple(map(tuple, pts))) for cmd, pts in f["geometry"]
            )))
    return out


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_pn_countries_geometry_exact(ray_session):
    """Polygon corpus: -pn output geometry matches the reference
    EXACTLY (r3: the wagyu-port cleaner closed the last ring
    rotation/merging gap, so full vertex parity holds)."""
    from tippecanoe_ray.pipelines.vector_pyramid import VectorConfig

    src = _src("ne_110m_admin_0_countries")
    ref = _ref_tiles(src, 3, ["-pn"])
    cfg = VectorConfig(maxzoom=3, layer_name="in", prevent_shared_nodes=True)
    ours = _our_tiles(src, cfg)
    keys = sorted(set(ref) | set(ours))
    bad = []
    for k in keys:
        a = ours.get(k)
        b = ref.get(k)
        if a is None or b is None:
            bad.append(f"{k}: missing {'ours' if a is None else 'ref'}")
        elif sorted(_geoms(a)) != sorted(_geoms(b)):
            bad.append(f"{k}: geometry differs")
    assert not bad, bad[:10]


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_pn_lines_vertex_exact(ray_session):
    """Line corpus: -pn output is vertex-exact vs the reference (lines
    skip wagyu, so every kept vertex must agree: global shared-node
    marking, DP retain accounting, clip edge nodes)."""
    from tippecanoe_ray.pipelines.vector_pyramid import VectorConfig

    src = _src("ne_110m_admin_1_states_provinces_lines")
    ref = _ref_tiles(src, 4, ["-pn"])
    cfg = VectorConfig(maxzoom=4, layer_name="in", prevent_shared_nodes=True)
    ours = _our_tiles(src, cfg)
    keys = sorted(set(ref) | set(ours))
    bad = []
    for k in keys:
        a = ours.get(k)
        b = ref.get(k)
        if a is None or b is None:
            bad.append(f"{k}: missing {'ours' if a is None else 'ref'}")
            continue
        ga, gb = sorted(_geoms(a)), sorted(_geoms(b))
        if ga != gb:
            bad.append(f"{k}: geometry differs")
    assert not bad, bad[:10]


def test_shared_nodes_detection_unit():
    """Unit: two polygons sharing an edge produce shared nodes at the
    edge endpoints' distinct-neighbor vertices; a lone ring yields only
    its unconditional nodes (ring start + two DP anchors)."""
    import pyarrow as pa

    from tippecanoe_ray.stages.nodes import emit_vertex_rows, shared_nodes_global

    def feat_table(geoms):
        rows = {"seq": [], "t": [], "ops": [], "xy": []}
        for seq, (t, ops, xy) in enumerate(geoms):
            rows["seq"].append(seq)
            rows["t"].append(t)
            rows["ops"].append(np.asarray(ops, np.uint8).tobytes())
            rows["xy"].append(np.asarray(xy, np.int64).tobytes())
        return pa.table(
            {
                "seq": pa.array(rows["seq"], pa.int64()),
                "t": pa.array(rows["t"], pa.int8()),
                "ops": pa.array(rows["ops"], pa.large_binary()),
                "xy": pa.array(rows["xy"], pa.large_binary()),
            }
        )

    M, L = 1, 2  # MOVETO, LINETO opcodes
    sq1 = (3, [M, L, L, L, L],
           [(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)])
    # shares the right edge of sq1, with a different far side
    sq2 = (3, [M, L, L, L, L],
           [(100, 0), (250, 0), (250, 100), (100, 100), (100, 0)])
    lone = feat_table([sq1])
    both = feat_table([sq1, sq2])

    lone_nodes = set(shared_nodes_global(lone).tolist())
    both_nodes = set(shared_nodes_global(both).tolist())

    def key(x, y):
        return (x << 32) | y

    # lone ring: only unconditional nodes — no vertex appears with two
    # distinct neighbor pairs
    assert lone_nodes <= {key(x, y) for x, y in sq1[2]}
    # shared edge endpoints have distinct neighbor pairs across the two
    # rings -> must be in the global set
    assert key(100, 0) in both_nodes
    assert key(100, 100) in both_nodes
    # a vertex used by only one ring with one neighbor pair is shared
    # only if it is an unconditional (direct) node; (250, 0) is sq2's
    # DP-anchor region but (0, 0) is sq1's ring start (direct)
    assert key(0, 0) in both_nodes

    # vertex rows carry full coordinates and canonicalized neighbors
    rows = emit_vertex_rows(both)
    assert rows.num_rows > 0
    assert set(rows.column_names) >= {"mid", "mx", "my", "p1x", "p1y", "p2x", "p2y", "direct"}
