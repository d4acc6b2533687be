"""tippecanoe-overzoom conformance: the `overzoom` subcommand's output
tiles compared byte-for-byte (compressed bytes included) against the
reference binary across its own overzoom-test matrix (Makefile's
overzoom-test rule)."""

import os
import subprocess

import pytest

REF = "/tmp/refbuild/tippecanoe-overzoom"
TIP = "/tmp/refbuild/tippecanoe"
P = "/root/reference/tests/pbf"


def has_ref():
    return os.path.exists(REF) and os.path.exists(TIP)


def both(tmp_path, name, args):
    ref = str(tmp_path / f"ref_{name}.pbf")
    our = str(tmp_path / f"our_{name}.pbf")
    subprocess.run([REF, "-o", ref, *args], check=True,
                   capture_output=True)
    r = subprocess.run(
        ["python", "-m", "tippecanoe_ray", "overzoom", "-o", our, *args],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()[-500:]
    return open(ref, "rb").read(), open(our, "rb").read()


# the Makefile's overzoom-test invocations, verbatim
CASES = [
    ("basic", [f"{P}/11-327-791.pbf", "11/327/791", "13/1310/3166"]),
    ("order", ["-b20", "--preserve-input-order",
               f"{P}/11-327-791.pbf", "11/327/791", "11/327/791"]),
    ("multi", ["-t", "13/1310/3166", f"{P}/11-327-791.pbf", "11/327/791"]),
    ("nocomp", ["--no-tile-compression", "-t", "13/1310/3166",
                f"{P}/11-327-791.pbf", "11/327/791",
                f"{P}/0-0-0.pbf", "0/0/0"]),
    ("detail", ["-d8", "-b30", "-y", "NAME", "-y", "name",
                "-y", "scalerank",
                f"{P}/11-327-791.pbf", "11/327/791", "13/1310/3166"]),
    ("empty", [f"{P}/11-327-791.pbf", "11/327/791", "14/2616/6331"]),
    ("thin", ["-y", "NAME", "-m", f"{P}/0-0-0-pop.pbf", "0/0/0", "0/0/0"]),
    ("accum", ["-y", "NAME", "-m", "--accumulate-attribute", "NAME:comma",
               f"{P}/0-0-0-pop.pbf", "0/0/0", "0/0/0"]),
    ("filt", ["-y", "NAME", "-j", '{"*":["==","SCALERANK",0]}',
              f"{P}/0-0-0-pop.pbf", "0/0/0", "0/0/0"]),
    ("filtJ", ["-y", "NAME", "-J", f"{P}/scalerank-0-filter.json",
               f"{P}/0-0-0-pop.pbf", "0/0/0", "0/0/0"]),
    ("filtmult", ["-y", "NAME", "-y", "SCALERANK",
                  "-j", '{"*":["==","SCALERANK",0]}', "-m",
                  f"{P}/0-0-0-pop.pbf", "0/0/0", "0/0/0"]),
    ("filtorder", ["-y", "NAME", "-y", "SCALERANK", "-y", "LATITUDE",
                   "-j", '{"*":[">","LATITUDE",40]}', "-m",
                   "--preserve-input-order",
                   f"{P}/0-0-0-pop.pbf", "0/0/0", "0/0/0"]),
    ("tiny", ["--line-simplification=5", "--tiny-polygon-size=50",
              f"{P}/countries-0-0-0.pbf", "0/0/0", "0/0/0"]),
]


@pytest.mark.skipif(not has_ref(), reason="reference binary not built")
@pytest.mark.parametrize("name,args", CASES, ids=[c[0] for c in CASES])
def test_overzoom_byte_identical(tmp_path, name, args):
    ref, our = both(tmp_path, name, args)
    assert our == ref


@pytest.mark.skipif(not has_ref(), reason="reference binary not built")
def test_overzoom_muni_and_dedup(tmp_path):
    """The multiplier-reversal and dedup-by-id blocks of the
    overzoom-test rule: inputs built live by the reference tippecanoe,
    then both overzooms compared byte-for-byte."""
    muni_dir = str(tmp_path / "muni.dir")
    subprocess.run(
        [TIP, "-q", "-z5", "--preserve-point-density-threshold", "8",
         "--retain-points-multiplier", "3", "-f", "-e", muni_dir,
         "/root/reference/tests/muni/muni.json"],
        check=True, capture_output=True)
    ref, our = both(tmp_path, "muni",
                    ["-m", f"{muni_dir}/0/0/0.pbf", "0/0/0", "0/0/0"])
    assert our == ref

    for n in ("1", "2"):
        subprocess.run(
            [TIP, "-q", "-z0", "-f", "-e", str(tmp_path / f"{n}.dir"),
             "-l", "layer", f"{P}/{n}.json"],
            check=True, capture_output=True)
    srcs = [str(tmp_path / "1.dir" / "0" / "0" / "0.pbf"), "0/0/0",
            str(tmp_path / "2.dir" / "0" / "0" / "0.pbf"), "0/0/0"]
    ref, our = both(tmp_path, "nodedup", ["-b0", "-t", "1/1/0", *srcs])
    assert our == ref
    ref, our = both(tmp_path, "dedup",
                    ["-b0", "--deduplicate-by-id", "-t", "1/1/0", *srcs])
    assert our == ref


@pytest.mark.skipif(not has_ref(), reason="reference binary not built")
def test_overzoom_ds_matches_reference(ray_session, tmp_path):
    """Distributed overzoom of a whole tileset (overzoom_ds
    map_batches over the byte-exact kernel): every produced z5 child
    byte-identical to running the reference binary tile by tile."""
    import ray
    import sqlite3

    from tippecanoe_ray.pipelines.overzoom_exact import overzoom_ds

    mb = str(tmp_path / "src.mbtiles")
    subprocess.run(
        [TIP, "-q", "-z4", "-f", "-o", mb,
         "/root/reference/tests/ne_110m_admin_0_countries/in.json.gz"],
        check=True, capture_output=True)
    con = sqlite3.connect(mb)
    rows = [
        {"z": z, "x": x, "y": (1 << z) - 1 - ty, "tile": bytes(d)}
        for z, x, ty, d in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data "
            "FROM tiles WHERE zoom_level=4")
    ]
    con.close()

    out = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in overzoom_ds(ray.data.from_items(rows)).take_all()}
    assert len(out) > 200

    for (pz, px, py), parent in [((r["z"], r["x"], r["y"]),
                                  r["tile"]) for r in rows][:12]:
        src = tmp_path / f"{pz}-{px}-{py}.pbf"
        src.write_bytes(parent)
        for dx in (0, 1):
            for dy in (0, 1):
                cz, cx, cy = pz + 1, 2 * px + dx, 2 * py + dy
                ref = tmp_path / "ref.pbf"
                subprocess.run(
                    [REF, "-o", str(ref), str(src),
                     f"{pz}/{px}/{py}", f"{cz}/{cx}/{cy}"],
                    check=True, capture_output=True)
                refb = ref.read_bytes()
                ourb = out.get((cz, cx, cy), b"")
                assert ourb == refb, (cz, cx, cy)
