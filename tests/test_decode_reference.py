"""tippecanoe-decode conformance: our decode_to_text output compared
byte-for-byte against the reference binary across corpora and flag
variants (whole tileset with metadata, zoom range, layer filter,
metadata exclusion, --stats, --integer/--fraction, single tile,
dirtiles input)."""

import subprocess

import pytest

from tests.conftest import has_reference

REFDIR = "/tmp/refbuild"

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference binary not built")


def _run(args):
    subprocess.run(args, cwd=REFDIR, check=True, capture_output=True)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("decode_ref")
    mac = str(d / "macarthur.mbtiles")
    tab = str(d / "tabblock.mbtiles")
    ne = str(d / "ne.mbtiles")
    tabd = str(d / "tabdir")
    cj = "tests/join-population"
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-Z5", "-z10", "-o", mac,
          "-l", "macarthur", f"{REFDIR}/{cj}/macarthur.json"])
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-z12", "-o", tab,
          "-YALAND10:Land area",
          "-L", '{"file": "%s/%s/tabblock_06001420.json", "description": "population"}' % (REFDIR, cj)])
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-z4", "-o", ne,
          f"{REFDIR}/tests/ne_110m_admin_0_countries/in.json.gz"])
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-z12", "-e", tabd,
          "-YALAND10:Land area",
          "-L", '{"file": "%s/%s/tabblock_06001420.json", "description": "population"}' % (REFDIR, cj)])
    return {"mac": mac, "tab": tab, "ne": ne, "tabd": tabd}


def _ref_decode(args):
    return subprocess.run(
        [f"{REFDIR}/tippecanoe-decode", *args],
        capture_output=True, check=True).stdout.decode()


CASES = [
    ("whole", "mac", {}, []),
    ("polygons", "tab", {}, []),
    ("countries", "ne", {}, []),
    ("dirtiles", "tabd", {}, []),
    ("zoom-range", "mac", {"minzoom": 6, "maxzoom": 9},
     ["--minimum-zoom=6", "--maximum-zoom=9"]),
    ("exclude-meta", "tab", {"exclude_meta": {"generator", "json"}},
     ["-x", "generator", "-x", "json"]),
    ("stats", "mac", {"stats": True}, ["--stats"]),
    ("integer", "mac", {"coordinate_mode": 2}, ["--integer"]),
    ("fraction", "mac", {"coordinate_mode": 1}, ["--fraction"]),
    ("pipeline", "mac", {"pipeline": True}, ["-c"]),
    ("pipeline-poly", "tab", {"pipeline": True}, ["-c"]),
]


@pytest.mark.parametrize("name,key,kwargs,ref_args",
                         CASES, ids=[c[0] for c in CASES])
def test_decode_parity(corpus, name, key, kwargs, ref_args):
    from tippecanoe_ray.stages.decode_json import decode_to_text

    path = corpus[key]
    assert decode_to_text(path, **kwargs) == _ref_decode([*ref_args, path])


def test_decode_pmtiles(corpus, tmp_path):
    from tippecanoe_ray.stages.decode_json import decode_to_text

    pm = str(tmp_path / "mac.pmtiles")
    _run([f"{REFDIR}/tippecanoe", "-q", "-f", "-Z5", "-z10", "-o", pm,
          "-l", "macarthur",
          f"{REFDIR}/tests/join-population/macarthur.json"])
    assert decode_to_text(pm) == _ref_decode([pm])


def test_decode_single_tile(corpus):
    from tippecanoe_ray.stages.decode_json import decode_to_text

    path = corpus["mac"]
    assert (decode_to_text(path, one_tile=(6, 10, 24))
            == _ref_decode([path, "6", "10", "24"]))


def test_decode_single_tile_parent_fallback(corpus):
    """A missing z/x/y falls back up the pyramid (decode.cpp:496-543)."""
    from tippecanoe_ray.stages.decode_json import decode_to_text

    path = corpus["mac"]
    assert (decode_to_text(path, one_tile=(12, 655, 1582))
            == _ref_decode([path, "12", "655", "1582"]))


def test_enumerate_cli(corpus):
    import os
    import sys

    if not os.path.exists(f"{REFDIR}/tippecanoe-enumerate"):
        pytest.skip("tippecanoe-enumerate not built")
    path = corpus["mac"]
    out = subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "enumerate", path],
        capture_output=True, check=True, cwd="/root/repo").stdout.decode()
    ref = subprocess.run(
        [f"{REFDIR}/tippecanoe-enumerate", path],
        capture_output=True, check=True).stdout.decode()
    assert out == ref


def test_decode_golden_matrix():
    """The reference's own decode-test golden matrix (Makefile:302-317):
    our decoder's text over the muni tileset vs the checked-in golden
    .json files — every flag variant byte-identical."""
    import os

    from tippecanoe_ray.stages.decode_json import decode_to_text

    os.makedirs(f"{REFDIR}/tests/muni/decode", exist_ok=True)
    tileset = f"{REFDIR}/tests/muni/decode/multi.mbtiles"
    # argv[0] must be ./tippecanoe — the golden embeds the command line
    _run(["./tippecanoe", "-q", "-z11", "-Z11", "-f",
          "-o", "tests/muni/decode/multi.mbtiles", "tests/muni/muni.json"])
    golden_dir = "/root/reference/tests/muni/decode"
    cases = [
        ("multi.mbtiles.json",
         {"to_decode": {"subway"}, "exclude_meta": {"generator"}}),
        ("multi.mbtiles.integer.json",
         {"to_decode": {"subway"}, "exclude_meta": {"generator"},
          "coordinate_mode": 2}),
        ("multi.mbtiles.fraction.json",
         {"to_decode": {"subway"}, "exclude_meta": {"generator"},
          "coordinate_mode": 1}),
        ("multi.mbtiles.pipeline.json",
         {"pipeline": True, "exclude_meta": {"generator"}}),
        ("multi.mbtiles.onetile.json",
         {"one_tile": (11, 327, 791), "exclude_meta": {"generator"}}),
        ("multi.mbtiles.stats.json",
         {"stats": True, "exclude_meta": {"generator"}}),
    ]
    # the golden was produced with the reference's relative output path
    # baked into name/description metadata — the tileset here matches
    # because it is built at the same relative path
    for fname, kwargs in cases:
        with open(os.path.join(golden_dir, fname)) as f:
            golden = f.read()
        assert decode_to_text(tileset, **kwargs) == golden, fname

    # decode-pmtiles-test (Makefile:319-335): same matrix over the
    # pmtiles container, output sed 's/pmtiles/mbtiles/g' like the
    # reference's own check
    _run(["./tippecanoe", "-q", "-z11", "-Z11", "-f",
          "-o", "tests/muni/decode/multi.pmtiles", "tests/muni/muni.json"])
    pmset = f"{REFDIR}/tests/muni/decode/multi.pmtiles"
    for fname, kwargs in cases:
        with open(os.path.join(golden_dir, fname)) as f:
            golden = f.read()
        ours = decode_to_text(pmset, **kwargs).replace("pmtiles", "mbtiles")
        assert ours == golden, f"pmtiles {fname}"


def test_decode_raw_tiles_golden():
    """raw-tiles-test goldens (Makefile:247-253): an UNCOMPRESSED
    dirtiles tree (-e -pC) decoded whole and zoom-filtered — our text
    vs the checked-in golden files."""
    from tippecanoe_ray.stages.decode_json import decode_to_text

    _run(["./tippecanoe", "-q", "-f", "-e", "tests/raw-tiles/raw-tiles",
          "-r1", "-pC", "tests/raw-tiles/hackspots.geojson"])
    tree = f"{REFDIR}/tests/raw-tiles/raw-tiles"
    with open("/root/reference/tests/raw-tiles/raw-tiles.json") as f:
        golden = f.read()
    assert decode_to_text(tree, exclude_meta={"generator"}) == golden
    with open("/root/reference/tests/raw-tiles/raw-tiles-z67.json") as f:
        golden67 = f.read()
    assert decode_to_text(tree, exclude_meta={"generator"},
                          minzoom=6, maxzoom=7) == golden67


def test_decode_cli(corpus):
    import sys

    path = corpus["mac"]
    out = subprocess.run(
        [sys.executable, "-m", "tippecanoe_ray", "decode",
         "-x", "generator", path],
        capture_output=True, check=True, cwd="/root/repo").stdout.decode()
    assert out == _ref_decode(["-x", "generator", path])


def test_decode_bare_pbf_goldens():
    """The Makefile's pbf-test: decoding a bare single-tile .pbf file
    (neither SQLite nor PMTiles magic), in EPSG:4326 and with
    -s EPSG:3857 (tiletoepsg3857 unproject + per-tile crs block),
    byte-identical to the checked-in goldens."""

    src = "/root/reference/tests/pbf/11-328-791.vector.pbf"
    out = subprocess.run(
        ["python", "-m", "tippecanoe_ray", "decode", "-x", "generator",
         src, "11", "328", "791"],
        capture_output=True, cwd="/root/repo", check=True).stdout
    golden = open("/root/reference/tests/pbf/11-328-791.json", "rb").read()
    assert out == golden

    out = subprocess.run(
        ["python", "-m", "tippecanoe_ray", "decode", "-x", "generator",
         "-s", "EPSG:3857", src, "11", "328", "791"],
        capture_output=True, cwd="/root/repo", check=True).stdout
    golden = open(
        "/root/reference/tests/pbf/11-328-791.3857.json", "rb").read()
    assert out == golden
