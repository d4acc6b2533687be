"""CLI entrypoint + mbtiles packaging round trip."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from tippecanoe_ray.sources.mbtiles import read_mbtiles, write_mbtiles


def test_cli_build_and_mbtiles(ray_session, tmp_path, capsys):
    # small input table
    n = 300
    tbl = pa.table({"image_id": [f"img-{i:012d}" for i in range(n)]})
    inp = str(tmp_path / "in.parquet")
    pq.write_table(tbl, inp)
    out = str(tmp_path / "tiles")
    mb = str(tmp_path / "out.mbtiles")

    from tippecanoe_ray.__main__ import main

    rc = main(["--input", inp, "--out", out, "--maxzoom", "4", "--mbtiles", mb])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_tiles"] > 0
    assert res["metrics"]["n_partitions"] >= 1
    assert os.path.exists(os.path.join(out, "raw"))
    # read the mbtiles back; counts agree with the report
    back = read_mbtiles(mb)
    assert back.count() == res["mbtiles_tiles"] == res["n_tiles"]
    row = back.take(1)[0]
    from tippecanoe_ray.stages.mvt import decode_tile

    assert decode_tile(bytes(row["tile"]))[0]["name"] == "points"

    # resume: rerun is a no-op on completed partitions
    rc = main(["--input", inp, "--out", out, "--maxzoom", "4", "--resume"])
    assert rc == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["n_tiles"] == res["n_tiles"]


def test_cli_existing_output_semantics(ray_session, tmp_path, capsys):
    """Existing tileset output: error without -f/-F, -f overwrites,
    -F adds to it (main.cpp -f/-F, tests/allow-existing)."""
    import pytest

    n = 50
    tbl = pa.table({"image_id": [f"img-{i:012d}" for i in range(n)]})
    inp = str(tmp_path / "in.parquet")
    pq.write_table(tbl, inp)
    mb = str(tmp_path / "out.mbtiles")

    from tippecanoe_ray.__main__ import main

    base = ["--input", inp, "--maxzoom", "2", "--mbtiles", mb]
    assert main(base + ["--out", str(tmp_path / "t1")]) == 0
    capsys.readouterr()
    n1 = read_mbtiles(mb).count()
    with pytest.raises(SystemExit):
        main(base + ["--out", str(tmp_path / "t2")])
    assert main(base + ["--out", str(tmp_path / "t3"), "--force"]) == 0
    capsys.readouterr()
    assert read_mbtiles(mb).count() == n1


def test_point_pipeline_strategies_metadata(ray_session, tmp_path, capsys):
    """The parquet point pipeline's mbtiles `strategies` metadata block
    must be string-identical to the reference binary's on the same
    points (mbtiles.cpp:372-460; counters from the rate ladder)."""
    import sqlite3
    import subprocess

    import pytest

    from tests.util_reference import TIPPECANOE, write_geojson

    if not os.path.exists(TIPPECANOE):
        pytest.skip("reference binary not built")
    import numpy as np

    from tippecanoe_ray.stages.geotag import fnv_world

    n = 3000
    ids = [f"img-{i:012d}" for i in range(n)]
    tbl = pa.table({"image_id": ids})
    inp = str(tmp_path / "in.parquet")
    pq.write_table(tbl, inp)
    mb_our = str(tmp_path / "our.mbtiles")

    from tippecanoe_ray.__main__ import main

    rc = main(["--input", inp, "--out", str(tmp_path / "t"),
               "--maxzoom", "6", "--droprate", "2.5", "--mbtiles", mb_our])
    assert rc == 0
    capsys.readouterr()

    wx, wy = fnv_world(ids, hotspot_frac=0.0, n_hotspots=4)
    gj = str(tmp_path / "ref.json")
    mb_ref = str(tmp_path / "ref.mbtiles")
    write_geojson(gj, wx, wy)
    subprocess.run(
        [TIPPECANOE, "-q", "-f", "-o", mb_ref, "-z6", "-Z0", "-b0",
         "--no-tile-size-limit", "-r2.5", gj],
        check=True, capture_output=True)

    def strat(p):
        con = sqlite3.connect(p)
        try:
            return dict(con.execute("SELECT name, value FROM metadata"))[
                "strategies"]
        finally:
            con.close()

    assert strat(mb_our) == strat(mb_ref)
