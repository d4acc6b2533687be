"""tile-join conformance vs the reference binary: the join-test golden
matrix (reference Makefile:445-485) replayed through `tile-join` and
through our join/merge pipelines, mbtiles `tiles` tables compared
byte-for-byte — CSV join (+ -x exclude, --empty-csv-columns-are-null,
-i semi), -X strip-all, zoom subset, 3-way merge with the extent
rescale and tile-bytes reader ordering, -l/-L layer keep/remove."""

import sqlite3
import subprocess

import pytest

from tests.conftest import has_reference

REFDIR = "/tmp/refbuild"
CORPUS = f"{REFDIR}/tests/join-population"

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference binary not built")


def _run(args):
    subprocess.run(args, cwd=REFDIR, check=True, capture_output=True)


def _ref_tiles(path):
    con = sqlite3.connect(path)
    try:
        return {
            (z, x, (1 << z) - 1 - y): bytes(d)
            for z, x, y, d in con.execute(
                "SELECT zoom_level,tile_column,tile_row,tile_data FROM tiles")
        }
    finally:
        con.close()


def _our_tiles(ds):
    return {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in ds.take_all()}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("tilejoin_ref")
    tab = str(d / "tabblock.mbtiles")
    mac = str(d / "macarthur.mbtiles")
    mac2 = str(d / "macarthur2.mbtiles")
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-z12", "-o", tab,
          "-YALAND10:Land area",
          "-L", '{"file": "%s/tabblock_06001420.json", "description": "population"}' % CORPUS])
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-Z5", "-z10", "-o", mac,
          "-l", "macarthur", f"{CORPUS}/macarthur.json"])
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-d10", "-D10", "-Z9", "-z11",
          "-o", mac2, "-l", "macarthur", f"{CORPUS}/macarthur2.json"])
    return {"dir": d, "tab": tab, "mac": mac, "mac2": mac2}


def _assert_tiles_equal(ours, ref):
    assert set(ours) == set(ref)
    bad = [k for k in ref if ours[k] != ref[k]]
    assert bad == [], f"{len(bad)} tiles differ: {bad[:5]}"


def test_csv_join_variants(ray_session, corpus):
    from tippecanoe_ray.pipelines.tilejoin import join_csv_exact
    from tippecanoe_ray.sources.mbtiles import read_mbtiles

    d, tab = corpus["dir"], corpus["tab"]
    csv = f"{CORPUS}/population.csv"
    cases = [
        ("joined.mbtiles", ["-x", "GEOID10", "-c", csv], {}),
        ("joined-null.mbtiles",
         ["--empty-csv-columns-are-null", "-x", "GEOID10", "-c", csv],
         {"empty_null": True}),
        ("joined-i.mbtiles", ["-i", "-x", "GEOID10", "-c", csv],
         {"semi": True}),
        ("joined-keep-key.mbtiles", ["-c", csv], {"no_exclude": True}),
    ]
    ds = read_mbtiles(tab)
    for out, flags, kw in cases:
        ref_path = str(d / out)
        _run([f"{REFDIR}/tile-join", "-q", "-f", "-o", ref_path, *flags, tab])
        exclude = frozenset() if kw.pop("no_exclude", False) else {"GEOID10"}
        ours = _our_tiles(join_csv_exact(ds, csv, exclude=exclude, **kw))
        _assert_tiles_equal(ours, _ref_tiles(ref_path))


def test_zoom_subset_and_exclude_all(ray_session, corpus):
    from tippecanoe_ray.pipelines.tilejoin import join_csv_exact
    from tippecanoe_ray.sources.mbtiles import read_mbtiles

    d, mac = corpus["dir"], corpus["mac"]
    ref_path = str(d / "m69X.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-Z6", "-z9", "-X",
          "-o", ref_path, mac])
    z69 = read_mbtiles(mac).filter(expr="z >= 6 and z <= 9")
    ours = _our_tiles(join_csv_exact(z69, None, exclude_all=True))
    _assert_tiles_equal(ours, _ref_tiles(ref_path))

    # plain zoom subset is byte pass-through of the in-range tiles
    ref2 = str(d / "m69.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-Z6", "-z9", "-o", ref2, mac])
    ours2 = _our_tiles(read_mbtiles(mac).filter(expr="z >= 6 and z <= 9"))
    _assert_tiles_equal(ours2, _ref_tiles(ref2))


def test_merge_and_layer_ops(ray_session, corpus):
    from tippecanoe_ray.pipelines.tilejoin import merge_tilesets_exact
    from tippecanoe_ray.sources.mbtiles import read_mbtiles

    d = corpus["dir"]
    merged_ref = str(d / "merged.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-o", merged_ref,
          corpus["tab"], corpus["mac"], corpus["mac2"]])
    dss = [read_mbtiles(corpus[k]) for k in ("tab", "mac", "mac2")]
    # exercises the extent rescale (macarthur2 is -d10 over the same
    # layer name) and the tile-bytes reader ordering
    ours = _our_tiles(merge_tilesets_exact(dss))
    _assert_tiles_equal(ours, _ref_tiles(merged_ref))

    just_ref = str(d / "just.mbtiles")
    no_ref = str(d / "no.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-l", "macarthur",
          "-o", just_ref, merged_ref])
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-L", "macarthur",
          "-o", no_ref, merged_ref])
    mds = read_mbtiles(merged_ref)
    _assert_tiles_equal(
        _our_tiles(merge_tilesets_exact([mds], keep_layers={"macarthur"})),
        _ref_tiles(just_ref))
    _assert_tiles_equal(
        _our_tiles(merge_tilesets_exact([mds], remove_layers={"macarthur"})),
        _ref_tiles(no_ref))


def test_tilejoin_cli(corpus):
    """The `tilejoin` CLI subcommand end-to-end vs the reference."""
    import sys

    d, tab = corpus["dir"], corpus["tab"]
    ref_path = str(d / "cli-ref.mbtiles")
    csv = f"{CORPUS}/population.csv"
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-o", ref_path,
          "-x", "GEOID10", "-c", csv, tab])
    out = str(d / "cli-ours.mbtiles")
    subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "tilejoin", "-o", out,
         "-x", "GEOID10", "-c", csv, tab, "--num-cpus", "2"],
        check=True, capture_output=True, cwd="/root/repo")

    def tms(path):
        con = sqlite3.connect(path)
        try:
            return {r[:3]: bytes(r[3]) for r in con.execute(
                "SELECT zoom_level,tile_column,tile_row,tile_data FROM tiles")}
        finally:
            con.close()

    ours, ref = tms(out), tms(ref_path)
    assert set(ours) == set(ref)
    assert all(ours[k] == ref[k] for k in ref)


DECODE_CASES = [
    # (name, reference tile-join flags, our CLI flags)
    ("join", ["-x", "GEOID10", "-c", "{csv}"],
     ["-x", "GEOID10", "-c", "{csv}"]),
    ("join-null",
     ["--empty-csv-columns-are-null", "-x", "GEOID10", "-c", "{csv}"],
     ["--empty-csv-columns-are-null", "-x", "GEOID10", "-c", "{csv}"]),
    ("join-i", ["-i", "-x", "GEOID10", "-c", "{csv}"],
     ["-i", "-x", "GEOID10", "-c", "{csv}"]),
    ("no-tile-stats",
     ["--no-tile-stats", "-x", "GEOID10", "-c", "{csv}"],
     ["--no-tile-stats", "-x", "GEOID10", "-c", "{csv}"]),
    ("attr-limit",
     ["--tile-stats-attributes-limit=1", "-x", "GEOID10", "-c", "{csv}"],
     ["--tile-stats-attributes-limit", "1", "-x", "GEOID10", "-c", "{csv}"]),
    ("sample-limit",
     ["--tile-stats-sample-values-limit=1", "-x", "GEOID10", "-c", "{csv}"],
     ["--tile-stats-sample-values-limit", "1", "-x", "GEOID10", "-c", "{csv}"]),
    ("values-limit",
     ["--tile-stats-values-limit=1", "-x", "GEOID10", "-c", "{csv}"],
     ["--tile-stats-values-limit", "1", "-x", "GEOID10", "-c", "{csv}"]),
    ("zoom-subset", ["-Z6", "-z9"], ["-Z", "6", "-z", "9"]),
    ("include-y",
     ["-y", "NAME10", "-y", "population", "-c", "{csv}"],
     ["-y", "NAME10", "-y", "population", "-c", "{csv}"]),
]


@pytest.mark.parametrize("name,ref_flags,our_flags",
                         DECODE_CASES, ids=[c[0] for c in DECODE_CASES])
def test_cli_decode_parity(corpus, name, ref_flags, our_flags):
    """Full tippecanoe-decode parity — every tile AND the metadata
    (bounds/center from pinned geometry, merged name/description/
    strategies, vector_layers with carried field descriptions,
    tilestats with the reference's caps) — the reference's own
    join-test golden method (Makefile:465-482 cmp of decode output;
    generator/generator_options excluded since our argv differs)."""
    import sys

    d = corpus["dir"]
    csv = f"{CORPUS}/population.csv"
    src = corpus["mac"] if name == "zoom-subset" else corpus["tab"]
    ref_out = str(d / f"dp-{name}-ref.mbtiles")
    our_out = str(d / f"dp-{name}-our.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-o", ref_out,
          *[f.format(csv=csv) for f in ref_flags], src])
    subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "tilejoin", "-o", our_out,
         *[f.format(csv=csv) for f in our_flags], src, "--num-cpus", "2"],
        check=True, capture_output=True, cwd="/root/repo")
    dec_ref = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", ref_out],
        capture_output=True, check=True).stdout
    dec_our = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", our_out],
        capture_output=True, check=True).stdout
    assert dec_ref == dec_our


def test_cli_merge_decode_parity(corpus):
    """3-way merge through the CLI: decode output identical, including
    the ' + '-joined name, summed strategies, extent-rescaled layers."""
    import sys

    d = corpus["dir"]
    ref_out = str(d / "dp-merge-ref.mbtiles")
    our_out = str(d / "dp-merge-our.mbtiles")
    inputs = [corpus["tab"], corpus["mac"], corpus["mac2"]]
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-o", ref_out, *inputs])
    subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "tilejoin", "-o", our_out,
         *inputs, "--num-cpus", "2"],
        check=True, capture_output=True, cwd="/root/repo")
    dec_ref = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", ref_out],
        capture_output=True, check=True).stdout
    dec_our = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", our_out],
        capture_output=True, check=True).stdout
    assert dec_ref == dec_our


def test_cli_feature_filter(corpus):
    """-j feature-filter expressions through tile-join, decode-identical
    (numeric compare, in-list, and a has guard)."""
    import sys

    d, tab = corpus["dir"], corpus["tab"]
    for i, expr in enumerate([
        '{"tabblock_06001420":["all",[">=","ALAND10",10000]]}',
        '{"*":["any",["in","BLOCKCE10","1000","1001","3008"]]}',
        '{"*":["all",["has","UACE10"]]}',
    ]):
        ref_out = str(d / f"jf{i}-ref.mbtiles")
        our_out = str(d / f"jf{i}-our.mbtiles")
        _run([f"{REFDIR}/tile-join", "-q", "-f", "-j", expr,
              "-o", ref_out, tab])
        subprocess.run(
            [sys.executable, "-m", "tippecanoe_ray", "tilejoin",
             "-o", our_out, "-j", expr, tab, "--num-cpus", "2"],
            check=True, capture_output=True, cwd="/root/repo")
        _assert_decode_equal(ref_out, our_out)


def test_cli_dirtiles_in_and_out(corpus):
    """Dirtiles inputs (reference-written folders) merged to mbtiles,
    and -e folder output with -n/-N — decode-identical both ways."""
    import sys

    d = corpus["dir"]
    tabd, macd, mac2d = (str(d / n) for n in ("tabd", "macd", "mac2d"))
    _run([f"{REFDIR}/tippecanoe", "-q", "-z12", "-f", "-e", tabd,
          "-YALAND10:Land area",
          "-L", '{"file": "%s/tabblock_06001420.json", "description": "population"}' % CORPUS])
    _run([f"{REFDIR}/tippecanoe", "-q", "-Z5", "-z10", "-f", "-e", macd,
          "-l", "macarthur", f"{CORPUS}/macarthur.json"])
    _run([f"{REFDIR}/tippecanoe", "-q", "-d10", "-D10", "-Z9", "-z11",
          "-f", "-e", mac2d, "-l", "macarthur", f"{CORPUS}/macarthur2.json"])
    ref_out = str(d / "dirmerge-ref.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-o", ref_out,
          tabd, macd, mac2d])
    our_out = str(d / "dirmerge-our.mbtiles")
    subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "tilejoin", "-o", our_out,
         tabd, macd, mac2d, "--num-cpus", "2"],
        check=True, capture_output=True, cwd="/root/repo")
    _assert_decode_equal(ref_out, our_out)

    ref_dir = str(d / "m2f-ref")
    our_dir = str(d / "m2f-our")
    _run([f"{REFDIR}/tile-join", "-q", "-n", "merged name",
          "-N", "merged description", "-f", "-e", ref_dir,
          corpus["tab"], corpus["mac"], corpus["mac2"]])
    subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "tilejoin", "-e", our_dir,
         "-n", "merged name", "-N", "merged description",
         corpus["tab"], corpus["mac"], corpus["mac2"], "--num-cpus", "2"],
        check=True, capture_output=True, cwd="/root/repo")
    _assert_decode_equal(ref_dir, our_dir)


def test_cli_pmtiles_in_and_out(corpus):
    """pmtiles-test shapes (Makefile:265-282): pmtiles input joined to
    mbtiles and mbtiles joined to pmtiles output (both with -pC
    uncompressed tiles) — decode-identical, including the sixdig
    half-away bounds rounding."""
    import sys

    d = corpus["dir"]
    hackpm = str(d / "hack.pmtiles")
    hackmb = str(d / "hack.mbtiles")
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-o", hackpm, "-r1", "-pC",
          f"{REFDIR}/tests/raw-tiles/hackspots.geojson"])
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-o", hackmb, "-r1", "-pC",
          f"{REFDIR}/tests/raw-tiles/hackspots.geojson"])
    for name, src, ext in [("pm-to-mb", hackpm, "mbtiles"),
                           ("mb-to-pm", hackmb, "pmtiles")]:
        ref_out = str(d / f"{name}-ref.{ext}")
        our_out = str(d / f"{name}-our.{ext}")
        _run([f"{REFDIR}/tile-join", "-q", "-f", "-pC", "-o", ref_out, src])
        subprocess.run(
            [sys.executable, "-m", "tippecanoe_ray", "tilejoin",
             "-o", our_out, "-pC", src, "--num-cpus", "2"],
            check=True, capture_output=True, cwd="/root/repo")
        _assert_decode_equal(ref_out, our_out)


def test_cli_rename_and_name_cap(corpus):
    """-R layer renames and the 255-char name-concatenation cap."""
    import sys

    d = corpus["dir"]
    r1, r2 = str(d / "r1.mbtiles"), str(d / "r2.mbtiles")
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-Z5", "-z10", "-o", r1,
          "-l", "macarthur1", f"{CORPUS}/macarthur.json"])
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-Z5", "-z10", "-o", r2,
          "-l", "macarthur2", f"{CORPUS}/macarthur2.json"])
    ref_out = str(d / "renamed-ref.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-R", "macarthur1:one",
          "--rename-layer=macarthur2:two", "-f", "-o", ref_out, r1, r2])
    our_out = str(d / "renamed-our.mbtiles")
    subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "tilejoin", "-o", our_out,
         "-R", "macarthur1:one", "-R", "macarthur2:two", r1, r2,
         "--num-cpus", "2"],
        check=True, capture_output=True, cwd="/root/repo")
    _assert_decode_equal(ref_out, our_out)

    longname = str(d / "longname.mbtiles")
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-z0",
          "-n", "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
          "-o", longname, f"{CORPUS}/macarthur.json"])
    ref_out = str(d / "concat-ref.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-o", ref_out] + [longname] * 6)
    our_out = str(d / "concat-our.mbtiles")
    subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "tilejoin", "-o", our_out]
        + [longname] * 6 + ["--num-cpus", "2"],
        check=True, capture_output=True, cwd="/root/repo")
    _assert_decode_equal(ref_out, our_out)


def _assert_decode_equal(ref_path, our_path):
    dec_ref = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", ref_path],
        capture_output=True, check=True).stdout
    dec_our = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", our_path],
        capture_output=True, check=True).stdout
    assert dec_ref == dec_our


def test_windows_csv(ray_session, corpus):
    """windows.csv: quoted values with embedded commas/quotes."""
    from tippecanoe_ray.pipelines.tilejoin import join_csv_exact
    from tippecanoe_ray.sources.mbtiles import read_mbtiles

    d, mac = corpus["dir"], corpus["mac"]
    ref_path = str(d / "windows.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-c",
          f"{CORPUS}/windows.csv", "-o", ref_path, mac])
    ours = _our_tiles(join_csv_exact(read_mbtiles(mac),
                                     f"{CORPUS}/windows.csv"))
    _assert_tiles_equal(ours, _ref_tiles(ref_path))


def test_cli_overzoom_merge(ray_session, corpus, tmp_path):
    """-O: the shallower input (macarthur z5-z10) overzooms up to the
    deeper input's maxzoom (macarthur2 z9-z11) during the merge —
    whole tile table byte-identical to the reference tile-join -O,
    and the decoded text (tilestats included) identical too."""
    import subprocess

    mac, mac2 = corpus["mac"], corpus["mac2"]
    ref_path = str(tmp_path / "oz_ref.mbtiles")
    our_path = str(tmp_path / "oz_our.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-O",
          "-o", ref_path, mac, mac2])
    r = subprocess.run(
        ["python", "-m", "tippecanoe_ray", "tilejoin", "-O",
         "-o", our_path, mac, mac2],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()[-500:]

    import sqlite3

    def tiles(p):
        con = sqlite3.connect(p)
        d = {t[:3]: bytes(t[3]) for t in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data "
            "FROM tiles")}
        con.close()
        return d

    ref, ours = tiles(ref_path), tiles(our_path)
    _assert_tiles_equal(ours, ref)
    assert max(z for z, _, _ in ref) == 11  # overzoomed past z10

    dec_ref = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", ref_path],
        capture_output=True, check=True).stdout
    dec_our = subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
         "-x", "generator_options", our_path],
        capture_output=True, check=True).stdout
    assert dec_ref == dec_our


def test_cli_overzoom_buffer_and_exclude_all_attrs(ray_session, corpus,
                                                   tmp_path):
    """-O -b20 (overzoom clip buffer) and
    --exclude-all-tile-attributes (original attributes stripped, joined
    CSV columns kept): decoded output identical to the reference."""
    import subprocess

    def decode(p):
        return subprocess.run(
            [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
             "-x", "generator_options", p],
            capture_output=True, check=True).stdout

    mac, mac2, tab = corpus["mac"], corpus["mac2"], corpus["tab"]

    ref_b = str(tmp_path / "b_ref.mbtiles")
    our_b = str(tmp_path / "b_our.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f", "-O", "-b20",
          "-o", ref_b, mac, mac2])
    r = subprocess.run(
        ["python", "-m", "tippecanoe_ray", "tilejoin", "-O", "-b", "20",
         "-o", our_b, mac, mac2], capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()[-400:]
    assert decode(ref_b) == decode(our_b)

    ref_a = str(tmp_path / "a_ref.mbtiles")
    our_a = str(tmp_path / "a_our.mbtiles")
    _run([f"{REFDIR}/tile-join", "-q", "-f",
          "--exclude-all-tile-attributes", "-i", "-c",
          f"{CORPUS}/population.csv", "-o", ref_a, tab])
    r = subprocess.run(
        ["python", "-m", "tippecanoe_ray", "tilejoin",
         "--exclude-all-tile-attributes", "-i", "-c",
         f"{CORPUS}/population.csv", "-o", our_a, tab],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()[-400:]
    assert decode(ref_a) == decode(our_a)


def test_cli_exclude_all_tile_geometries(ray_session, corpus, tmp_path):
    """--exclude-all-tile-geometries: features serialize with neither
    type nor geometry fields (the writer's handling of type -1),
    tilestats geometry counters still reflect the original types, and
    the never-updated world bbox surfaces as the reference's exact
    INT_MIN/INT_MAX sentinel bounds. Byte-identical decode."""
    import subprocess

    for src in (corpus["mac"], corpus["mac2"]):
        ref_p = str(tmp_path / "g_ref.mbtiles")
        our_p = str(tmp_path / "g_our.mbtiles")
        _run([f"{REFDIR}/tile-join", "-q", "-f",
              "--exclude-all-tile-geometries", "-o", ref_p, src])
        r = subprocess.run(
            ["python", "-m", "tippecanoe_ray", "tilejoin",
             "--exclude-all-tile-geometries", "-o", our_p, src],
            capture_output=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr.decode()[-400:]
        for p in (ref_p, our_p):
            pass
        dec = [subprocess.run(
            [f"{REFDIR}/tippecanoe-decode", "-x", "generator",
             "-x", "generator_options", p],
            capture_output=True, check=True).stdout
            for p in (ref_p, our_p)]
        assert dec[0] == dec[1]
