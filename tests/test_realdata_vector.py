"""Real-corpus exact-match for the vector pyramid: Natural Earth
countries (multipolygons + dateline), ocean (world-covering polygon
with continent holes), admin-1 boundary lines — reference's own test
data (tests/ listing, SURVEY.md §5), run through the reference binary
as the oracle."""

import os
import subprocess
import tempfile

import pytest

from tests.conftest import has_reference

CORPORA = [
    ("ne_110m_admin_0_countries", 4),
    ("ne_110m_ocean", 4),
    ("ne_110m_admin_1_states_provinces_lines", 5),
]


def _src(name):
    p = f"/root/reference/tests/{name}/in.json"
    return p if os.path.exists(p) else p + ".gz"


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("name,maxzoom", CORPORA)
def test_real_corpus_exact(ray_session, name, maxzoom):
    from tests.util_reference import TIPPECANOE, read_mbtiles_counts
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.sources.geojson import read_geojson_vector

    src = _src(name)
    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "out.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, f"-z{maxzoom}", "--no-tile-size-limit", "-q", src],
            check=True, capture_output=True,
        )
        ref = read_mbtiles_counts(mb)
    cfg = VectorConfig(maxzoom=maxzoom, layer_name="in")
    tiles = build_vector_pyramid(ingest_features(read_geojson_vector(src), cfg), cfg)
    ours = {
        (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
        for r in tiles.take_all()
        if r["n_features"] > 0
    }
    bad = [
        f"{k}: ours={ours.get(k)} ref={ref.get(k)}"
        for k in sorted(set(ours) | set(ref))
        if ours.get(k) != ref.get(k)
    ]
    assert not bad, bad[:10]


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_label_points_countries(ray_session):
    """-aP: polygons become checkerboard label anchor points
    (tile.cpp:1919-1937, polygon_to_anchor geometry.cpp:766,
    checkerboard_anchors geometry.cpp:947) — exact-match on NE
    countries."""
    from tests.util_reference import TIPPECANOE, read_mbtiles_counts
    from tippecanoe_ray.pipelines.vector_pyramid import (
        VectorConfig, build_vector_pyramid, ingest_features,
    )
    from tippecanoe_ray.sources.geojson import read_geojson_vector

    src = _src("ne_110m_admin_0_countries")
    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "out.mbtiles")
        subprocess.run(
            [TIPPECANOE, "-o", mb, "-z3", "-aP", "--no-tile-size-limit", "-q", src],
            check=True, capture_output=True,
        )
        ref = read_mbtiles_counts(mb)
    cfg = VectorConfig(maxzoom=3, layer_name="in", generate_label_points=True)
    tiles = build_vector_pyramid(ingest_features(read_geojson_vector(src), cfg), cfg)
    ours = {
        (int(r["z"]), int(r["x"]), int(r["y"])): int(r["n_features"])
        for r in tiles.take_all()
        if r["n_features"] > 0
    }
    bad = [
        f"{k}: ours={ours.get(k)} ref={ref.get(k)}"
        for k in sorted(set(ours) | set(ref))
        if ours.get(k) != ref.get(k)
    ]
    assert not bad, bad[:10]


GEOM_EXACT_CORPORA = [
    # full GEOMETRY byte-parity (vertex order, ring order, start
    # vertices — through the wagyu-port polygon cleaner) vs the
    # reference binary, on its own test corpora
    ("ne_110m_admin_0_countries", 4, []),
    ("ne_110m_ocean", 4, []),
    ("loop", 5, []),        # 1000 coincident points: rate ladder
    ("dateline", 5, []),    # ±360° lines + per-feature minzoom/maxzoom
    ("islands", 6, []),     # tiny-polygon accumulation across features
]


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("name,maxzoom,extra", GEOM_EXACT_CORPORA)
def test_real_corpus_geometry_exact(ray_session, name, maxzoom, extra):
    """Every tile's decoded feature geometry matches the reference
    EXACTLY (types, vertex order, ring structure), not just counts."""
    from tests.test_pn_shared_nodes import _geoms, _our_tiles, _ref_tiles
    from tippecanoe_ray.pipelines.vector_pyramid import VectorConfig

    src = _src(name)
    ref = _ref_tiles(src, maxzoom, extra)
    cfg = VectorConfig(maxzoom=maxzoom, layer_name="in")
    ours = _our_tiles(src, cfg)
    bad = []
    for k in sorted(set(ref) | set(ours)):
        a, b = ours.get(k), ref.get(k)
        if a is None or b is None:
            bad.append(f"{k}: missing {'ours' if a is None else 'ref'}")
        elif sorted(_geoms(a)) != sorted(_geoms(b)):
            bad.append(f"{k}: geometry differs")
    assert not bad, bad[:10]


BYTE_EXACT_CORPORA = [
    # (corpus, maxzoom, reference extra flags, our extra CLI flags)
    ("ne_110m_admin_0_countries", 4, [], []),
    ("ne_110m_ocean", 4, [], []),
    ("dateline", 5, [], []),   # attributes: bools, nested stringify,
    ("loop", 5, [], []),       # escapes, per-feature zooms, rate drops
    ("islands", 6, [], []),
    ("ne_110m_admin_0_countries", 3, ["-pn"], ["--prevent-shared-nodes"]),
    ("ne_110m_admin_0_countries", 4, ["-M", "20000"],
     ["--max-tile-bytes", "20000"]),
    # real points with rich attributes (names in many scripts, floats,
    # ints, nulls) through the rate ladder
    ("ne_110m_populated_places", 5, [], []),
    # pure-lines corpus (admin-1 boundaries) through clip + simplify
    ("ne_110m_admin_1_states_provinces_lines", 5, [], []),
    # --visvalingam effective-area simplification (the reference's own
    # golden flag combination, visvalingam.cpp:147-230)
    ("ne_110m_admin_0_countries", 4,
     ["-yname", "-S4", "--visvalingam"],
     ["--include", "name", "--simplification", "4", "--visvalingam"]),
    # -R z/x/y one-tile mode (main.cpp:3402-3414): the whole ingest
    # stream clips once, directly to the root tile
    ("ne_110m_admin_0_countries", 5,
     ["-R5/17/11"], ["--one-tile", "5/17/11"]),
    # -ab shared-border arc pass (shared_borders.cpp:86): the
    # reference's own golden flag combination on its border corpus,
    # plus the full NE countries matrix for ring rotation / arc dedup
    # coverage at real scale
    ("border", 1,
     ["--detect-shared-borders"], ["--detect-shared-borders"]),
    ("ne_110m_admin_0_countries", 4,
     ["--detect-shared-borders"], ["--detect-shared-borders"]),
    # -ab composed with the flags that alter the shared simplification
    # inputs: -S4 (arc epsilon), -pn (the global flag reaches the arc
    # DP's retain accounting even with empty node lists,
    # geometry.cpp:298), and ocean for multipolygon-heavy rings
    ("ne_110m_admin_0_countries", 3,
     ["--detect-shared-borders", "-S4"],
     ["--detect-shared-borders", "--simplification", "4"]),
    ("ne_110m_admin_0_countries", 3,
     ["--detect-shared-borders", "-pn"],
     ["--detect-shared-borders", "--prevent-shared-nodes"]),
    ("ne_110m_ocean", 4,
     ["--detect-shared-borders"], ["--detect-shared-borders"]),
    # -aX: each feature's bbox_index appended as a tippecanoe:index
    # attribute (serial.cpp:725-732) — polygons (vertex-hash index)
    # and points (low-bit quadkey rule) both
    ("ne_110m_admin_0_countries", 3,
     ["-aX"], ["--calculate-feature-index"]),
    ("ne_110m_populated_places", 4,
     ["-aX"], ["--calculate-feature-index"]),
    # -y runs AFTER the -aX append (serial.cpp:850-860), so the index
    # attribute is filtered out in include mode
    ("ne_110m_populated_places", 5,
     ["-aX", "-yNAME"],
     ["--calculate-feature-index", "--include", "NAME"]),
]

# the reference's own edge-case corpora (tests/<name>/), byte-exact:
# (corpus, input file, maxzoom, reference extra flags, our extra flags)
EDGE_CORPORA = [
    # self-intersecting polygon through the wagyu cleaner
    ("invalid-polygon", "in.json", 0, [], []),
    # layer name from a filename with no selector-safe characters
    # (main.cpp:1360-1408 -> "unknown0")
    ("nonascii", "@@@.json", 0, [], []),
    # polygons/lines/points crossing null island with zero buffer;
    # full-precision point bbox indexes vs snapped vertex-hash ones
    ("nullisland", "in.json", 4, ["-b0"], ["--buffer", "0"]),
    ("multilinestring", "in.json", 1, [], []),
    ("invalid-linestring", "too-few.json", 0, [], []),
    ("high-longitude", "in.json", 1, [], []),
    # feature ids/values overflowing uint64/double (dtoa round-trip id
    # rule, strtoull clamp)
    ("overflow", "in.json", 0, [], []),
    ("stringid", "in.json", 0, [], []),
    ("polygon-winding", "in.json", 0, [], []),
    ("curve", "in.json", 2, [], []),
    # 4303 SF transit stops in one z11 tile + 19 features with a
    # per-feature tippecanoe layer -> a second MVT layer per tile
    ("muni", "muni.json", 11, ["-Z11"], ["--minzoom", "11"]),
    # truncated JSON container with a complete geometry inside
    ("onefeature", "in.json", 0, [], []),
    ("onefeature-point", "in.json", 0, [], []),
    ("empty-linestring", "in.json", 0, [], []),
    ("nested", "in.json", 0, [], []),
    ("minzoom", "in.json", 6, [], []),
    # bare geometries nested in arbitrary containers (jsonpull walk)
    ("geometry", "bare.json", 3, [], []),
    ("geometry", "geometrycollection.json", 3, [], []),
    ("longlayer", "in.json", 0, [], []),
    ("longjson", "sherlock.json", 0, [], []),
    ("longattr", "sherlock.json", 0, [], []),
    ("overture-235", "in.json", 0, [], []),
    ("overlap", "in.json", 0, [], []),
    # z20 pyramid (detail clamp 32-z) and explicit basezoom 0
    ("stable", "in.json", 20, ["-Z20"], ["--minzoom", "20"]),
    ("stable", "in.json", 3, ["-B0"], ["--basezoom", "0"]),
    # -z30 clamps to MAX_ZOOM 24 with full detail 8 / low detail 9
    ("highzoom", "in.json", 30, [], []),
    ("wyalkatchem", "in.json", 12, ["-pk", "-pf", "-Z9", "-ldata"],
     ["--minzoom", "9", "--layer-name", "data"]),
    # -C prefilter / -c postfilter shell pipes (the reference's GeoJSON
    # pipe protocol, round-tripped byte-exact incl. attrs and layers)
    ("ne_110m_populated_places", "in.json", 4,
     ["-yNAME", "-Ccat"], ["-y", "NAME", "--prefilter", "cat"]),
    ("ne_110m_populated_places", "in.json", 4,
     ["-yNAME", "-ccat"], ["-y", "NAME", "--postfilter", "cat"]),
    ("ne_110m_admin_0_countries", "in.json.gz", 2,
     ["--coalesce", "-Ccat"], ["--coalesce", "--prefilter", "cat"]),
    # -aw longitude wraparound repair
    ("wraparound", "in.json", 5, ["--detect-longitude-wraparound"],
     ["--detect-longitude-wraparound"]),
    ("wraparound2", "in.json", 0, ["--detect-longitude-wraparound"],
     ["--detect-longitude-wraparound"]),
    ("bathymetry-6000", "in.json", 0, ["--detect-longitude-wraparound"],
     ["--detect-longitude-wraparound"]),
    # -y attribute include filter
    ("ne_110m_populated_places-minzoom", "in.json", 5,
     ["-yNAME", "-ySCALERANK"], ["-y", "NAME", "-y", "SCALERANK"]),
    # --accumulate-attribute: rate-dropped features fold onto the kept
    # one (mean with the count rider; comma concat with set-attribute)
    ("mean-accumulation", "in.json", 1,
     ["--accumulate-attribute", "value:mean"],
     ["--accumulate-attribute", "value:mean"]),
    ("ne_110m_populated_places_nulls", "in.json", 1,
     ["--accumulate-attribute", "POP2000:mean", "-yNAME", "-yPOP2000"],
     ["--accumulate-attribute", "POP2000:mean", "-y", "NAME", "-y", "POP2000"]),
    ("accumulate", "in.json", 14,
     ["--set-attribute", "thecomma:NEWVALUE",
      "--accumulate-attribute", "thecomma:comma"],
     ["--set-attribute", "thecomma:NEWVALUE",
      "--accumulate-attribute", "thecomma:comma"]),
    ("accumulate", "in.json", 0,
     ["--set-attribute", '{"num":5,"str":"abc"}'],
     ["--set-attribute", '{"num":5,"str":"abc"}']),
    # real TIGER roads (lines) with shared-node preservation
    ("tl_2018_51685_roads", "in.json", 11,
     ["-Z11", "--no-simplification-of-shared-nodes"],
     ["--minzoom", "11", "--prevent-shared-nodes"]),
    # web-mercator-meters input (-s)
    ("epsg-3857", "in.json", 5, ["-yNAME", "-sEPSG:3857"],
     ["-y", "NAME", "-s", "EPSG:3857"]),
    # clip_to_tile prevent modes (also switch off the simplifier's
    # tile-boundary node imposition)
    ("curve", "in.json", 2, ["--no-clipping"], ["--no-clipping"]),
    ("curve", "in.json", 2, ["--no-duplication"], ["--no-duplication"]),
    # -ag density tags (incl. the exp(log(x)) manage_gap round trip)
    # and hilbert indexing over the 4303-stop tile
    ("muni", "muni.json", 11,
     ["-Z11", "--calculate-feature-density"],
     ["--minzoom", "11", "--calculate-feature-density"]),
    ("muni", "muni.json", 11, ["-Z11", "--hilbert"],
     ["--minzoom", "11", "--hilbert"]),
    # -ao/-ac: attribute-sorted features and adjacent-identical merge
    # into multigeometries (coalcmp; the order-dependent wagyu union
    # of 112 id-less country polygons is the hard case)
    ("coalesce-id", "in.json", 1, ["--reorder"], ["--reorder"]),
    ("coalesce-id", "in.json", 1, ["--coalesce", "--reorder"],
     ["--coalesce", "--reorder"]),
    ("overlap", "in.json", 0, ["--coalesce"], ["--coalesce"]),
    ("empty-linestring", "in.json", 14, ["-ac"], ["--coalesce"]),
    # -zg maxzoom guess (Welford over sorted-index log-gaps + the
    # within-feature vertex-spacing branch for lines), -rp fitted
    # droprate with the integer-division duplicate bump, and the
    # exact repeated-subtraction rate-ladder thresholds it exposed
    ("knox", "in.json", "g", [], []),
    ("wineries", "in.json", "g", ["-rp"], ["--droprate", "p"]),
    ("single-polygons", "in.json", "g", ["-Z21", "-D10", "-d10"],
     ["--minzoom", "21", "-D", "10", "-d", "10"]),
    # --grid-low-zooms Bresenham stairstep rasterization below maxzoom
    ("grid-aligned", "in.json", 11, ["-D7", "--grid-low-zooms"],
     ["-D", "7", "--grid-low-zooms"]),
    ("grid-unaligned", "in.json", 11, ["-D7", "--grid-low-zooms"],
     ["-D", "7", "--grid-low-zooms"]),
    # --extra-detail: deeper encode grid at maxzoom, normal simplify
    ("intersection", "in.json", 11,
     ["-Z11", "--extra-detail", "13", "--no-simplification-of-shared-nodes"],
     ["--minzoom", "11", "--extra-detail", "13", "--prevent-shared-nodes"]),
    # -T attribute coercion truthiness/rounding table (its own corpus)
    # and -pN float32 re-rounding of float attributes
    ("attribute-type", "in.json", 0,
     ["-Tinttype:int", "-Tfloattype:float", "-Tbooltype:bool",
      "-Tstringtype:string"],
     ["-T", "inttype:int", "-T", "floattype:float", "-T", "booltype:bool",
      "-T", "stringtype:string"]),
    ("attribute-type", "in.json", 0, ["-pN"], ["--single-precision"]),
    # feature ids incl. overflow/fraction/string cases
    ("id", "in.json", 14, ["-Z11"], ["--minzoom", "11"]),
    # -at variable-depth pyramid on the reference's own -at corpus
    ("minzoom-variable-depth", "in.json", 11,
     ["-Z10", "--generate-variable-depth-tile-pyramid"],
     ["--minzoom", "10", "--generate-variable-depth-tile-pyramid"]),
    # real TIGER census tracts: coalesce + reorder + include set at a
    # single zoom (the reference's own golden flags)
    ("coalesce-tract", "tl_2010_06001_tract10.json", 11,
     ["-Z11", "--coalesce", "--reorder", "-ySTATEFP10", "-yCOUNTYFP10",
      "-lmerged"],
     ["--minzoom", "11", "--coalesce", "--reorder", "-y", "STATEFP10",
      "-y", "COUNTYFP10", "--layer-name", "merged"]),
    # 7k Indiana point landmarks (gz) through the default rate ladder
    ("pointlm", "tl_2021_18_pointlm.shp.json.gz", 9, [], []),
    # MULTIPLE input files: merged into one layer (-l) and as separate
    # per-file layers (filename-derived names, interleaved seq order)
    ("multilayer", ("lines.json", "places.json"), 3,
     ["-ltogether"], ["--layer-name", "together"]),
    ("multilayer", ("lines.json", "places.json"), 3, [], []),
    # two TIGER county files, default separate layers
    ("tl_2015_us_county", ("piscataquis.json", "somerset.json"), 8, [], []),
    # -L name:file named layers over extensionless geojson inputs,
    # separate and merged (-l overrides the -L names)
    ("named", (), 0,
     ["-Lalgeria:/root/reference/tests/named/alg",
      "-Lalbania:/root/reference/tests/named/alb"],
     ["-L", "algeria:/root/reference/tests/named/alg",
      "-L", "albania:/root/reference/tests/named/alb"]),
    ("named", (), 0,
     ["-Lalgeria:/root/reference/tests/named/alg",
      "-Lalbania:/root/reference/tests/named/alb", "-lunified"],
     ["-L", "algeria:/root/reference/tests/named/alg",
      "-L", "albania:/root/reference/tests/named/alb",
      "--layer-name", "unified"]),
    # -J per-layer feature-filter conformance table (every operator ×
    # layer/notlayer "none" inversions, the reference's own corpus)
    ("feature-filter", "in.json", 0,
     ["-J/root/reference/tests/feature-filter/filter"],
     ["-J", "/root/reference/tests/feature-filter/filter"]),
    # ---- gamma/-K/as-needed strategies through the zoom-consensus
    # driver (tile.cpp:1981-2144 gates + traverse_zooms retry passes
    # 3382-3572 + the choose_first_zoom/zoom-jump schedule below
    # minzoom, main.cpp:1147-1206 / tile.cpp:1686-1697)
    ("loop", "in.json", 0, ["-O200", "--drop-densest-as-needed"],
     ["--max-tile-features", "200", "--drop-densest-as-needed"]),
    ("loop", "in.json", 0, ["-O200", "--cluster-densest-as-needed"],
     ["--max-tile-features", "200", "--cluster-densest-as-needed"]),
    ("loop", "in.json", 0, ["-O200", "--drop-fraction-as-needed"],
     ["--max-tile-features", "200", "--drop-fraction-as-needed"]),
    ("ne_110m_populated_places", "in.json", 1,
     ["-M10000", "--drop-smallest-as-needed"],
     ["--max-tile-bytes", "10000", "--drop-smallest-as-needed"]),
    ("ne_110m_populated_places", "in.json", 1,
     ["-M10000", "--coalesce-smallest-as-needed"],
     ["--max-tile-bytes", "10000", "--coalesce-smallest-as-needed"]),
    ("ne_110m_populated_places", "in.json", 5,
     ["-yNAME", "--drop-by-attribute-as-needed=SCALERANK",
      "--drop-by-attribute-order=desc"],
     ["-y", "NAME", "--drop-by-attribute-as-needed", "SCALERANK",
      "--drop-by-attribute-order", "desc"]),
    ("ne_110m_populated_places", "in.json", 5,
     ["-yNAME", "--drop-smallest-as-needed"],
     ["-y", "NAME", "--drop-smallest-as-needed"]),
    # polygons through coalesce-fraction (wagyu-unioned merges)
    ("ne_110m_admin_0_countries", "in.json.gz", 5,
     ["-M5000", "--coalesce-fraction-as-needed"],
     ["--max-tile-bytes", "5000", "--coalesce-fraction-as-needed"]),
    # -K clustering + -g gamma with the -Z11 zoom-jump ladder
    ("muni", "muni.json", 13,
     ["-Z11", "-O100", "--cluster-densest-as-needed"],
     ["--minzoom", "11", "--max-tile-features", "100",
      "--cluster-densest-as-needed"]),
    ("muni", "muni.json", 11, ["-Z11", "-g2"],
     ["--minzoom", "11", "--gamma", "2"]),
    ("muni", "muni.json", 11, ["-Z11", "-K50"],
     ["--minzoom", "11", "--cluster-distance", "50"]),
    # hard per-layer truncation after ordering (tile.cpp:2595-2611)
    ("ne_110m_populated_places", "in.json", 3,
     ["-r1", "--limit-tile-feature-count", "3"],
     ["--droprate", "1", "--limit-tile-feature-count", "3"]),
    ("ne_110m_populated_places", "in.json", 3,
     ["-r1", "--limit-tile-feature-count", "3",
      "--limit-tile-feature-count-at-maximum-zoom", "10"],
     ["--droprate", "1", "--limit-tile-feature-count", "3",
      "--limit-tile-feature-count-at-maximum-zoom", "10"]),
    ("ne_110m_populated_places", "in.json", 3,
     ["-r1", "--limit-tile-feature-count", "3",
      "--maximum-tile-features", "10", "--drop-densest-as-needed"],
     ["--droprate", "1", "--limit-tile-feature-count", "3",
      "--max-tile-features", "10", "--drop-densest-as-needed"]),
    # -ae extend-zooms (gscale 0, per-pass maxzoom growth,
    # traverse_zooms tile.cpp:3544-3556)
    ("ne_110m_populated_places", "in.json", 0,
     ["-M10000", "--drop-densest-as-needed",
      "--extend-zooms-if-still-dropping-maximum", "2"],
     ["--max-tile-bytes", "10000", "--drop-densest-as-needed",
      "--extend-zooms-if-still-dropping-maximum", "2"]),
    ("ne_110m_admin_0_countries", "in.json.gz", "g",
     ["-ae", "-M5000", "--drop-densest-as-needed"],
     ["--extend-zooms-if-still-dropping", "--max-tile-bytes", "5000",
      "--drop-densest-as-needed"]),
    ("ne_110m_admin_0_countries", "in.json.gz", "g",
     ["-ae", "-M5000", "--drop-smallest-as-needed"],
     ["--extend-zooms-if-still-dropping", "--max-tile-bytes", "5000",
      "--drop-smallest-as-needed"]),
    ("ne_110m_admin_0_countries", "in.json.gz", "g",
     ["-ae", "-M5000", "--force-feature-limit"],
     ["--extend-zooms-if-still-dropping", "--max-tile-bytes", "5000",
      "--force-feature-limit"]),
    # --retain-points-multiplier: secondary cluster members with
    # first/sequence tags (tile.cpp:1290-1319, 2237-2250, 2395-2415)
    ("muni", "muni.json", 11,
     ["--retain-points-multiplier", "2", "--extend-zooms-if-still-dropping"],
     ["--retain-points-multiplier", "2", "--extend-zooms-if-still-dropping"]),
    ("muni", "muni.json", 11,
     ["--retain-points-multiplier", "2",
      "--preserve-multiplier-density-threshold", "512"],
     ["--retain-points-multiplier", "2",
      "--preserve-multiplier-density-threshold", "512"]),
    ("muni", "muni.json", 10,
     ["--retain-points-multiplier", "10", "-M10000",
      "--drop-smallest-as-needed"],
     ["--retain-points-multiplier", "10", "--max-tile-bytes", "10000",
      "--drop-smallest-as-needed"]),
    ("muni", "muni.json", "g", ["--retain-points-multiplier", "2"],
     ["--retain-points-multiplier", "2"]),
    ("muni", "muni.json", 11,
     ["-ycount", "--set-attribute", "count:1",
      "--accumulate-attribute", "count:sum",
      "--retain-points-multiplier", "5"],
     ["-y", "count", "--set-attribute", "count:1",
      "--accumulate-attribute", "count:sum",
      "--retain-points-multiplier", "5"]),
    ("ne_110m_admin_0_countries", "in.json.gz", 0,
     ["-B10", "--retain-points-multiplier", "10", "-d8", "-yNAME"],
     ["--basezoom", "10", "--retain-points-multiplier", "10",
      "--full-detail", "8", "-y", "NAME"]),
    # whole-cluster per-tile orderings (tile.cpp:2583-2593)
    ("ne_110m_populated_places", "in.json", 0,
     ["-r2", "-B3", "-yNAME", "--retain-points-multiplier", "3",
      "--order-by", "NAME"],
     ["--droprate", "2", "--basezoom", "3", "-y", "NAME",
      "--retain-points-multiplier", "3", "--order-by", "NAME"]),
    ("ne_110m_populated_places", "in.json", 0,
     ["-r2", "-B3", "-yNAME", "--retain-points-multiplier", "3",
      "--preserve-input-order"],
     ["--droprate", "2", "--basezoom", "3", "-y", "NAME",
      "--retain-points-multiplier", "3", "--preserve-input-order"]),
    # -at variable depth combined with as-needed strategies on real
    # TIGER tracts (leaf revival on the first dropping pass,
    # tile.cpp:3186-3195); the -z17 -Z10/-Z12 coalesce variants were
    # verified byte-exact manually and are omitted for suite runtime
    ("tl_2022_11_tract", "in.json.gz", 14,
     ["-Z12", "--coalesce-densest-as-needed",
      "--generate-variable-depth-tile-pyramid", "-M25000"],
     ["--minzoom", "12", "--coalesce-densest-as-needed",
      "--generate-variable-depth-tile-pyramid", "--max-tile-bytes",
      "25000"]),
    ("tl_2022_11_tract", "in.json.gz", 17,
     ["-Z10", "--generate-variable-depth-tile-pyramid",
      "--drop-by-attribute-as-needed=ALAND", "-M15000"],
     ["--minzoom", "10", "--generate-variable-depth-tile-pyramid",
      "--drop-by-attribute-as-needed", "ALAND", "--max-tile-bytes",
      "15000"]),
]


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("name,infile,maxzoom,extra,ours_extra", EDGE_CORPORA)
def test_edge_corpus_mbtiles_byte_exact(ray_session, name, infile, maxzoom,
                                        extra, ours_extra, tmp_path):
    import sqlite3

    from tippecanoe_ray import __main__ as cli

    files = infile if isinstance(infile, (list, tuple)) else [infile]
    srcs = [f"/root/reference/tests/{name}/{f}" for f in files]
    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "ref.mbtiles")
        subprocess.run(
            ["/tmp/refbuild/tippecanoe", "-o", mb, f"-z{maxzoom}", "-f",
             "-q", *extra, *srcs],
            check=True, capture_output=True,
        )
        con = sqlite3.connect(mb)
        ref = {
            (z, x, y): bytes(d)
            for z, x, y, d in con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")
        }
        con.close()
        ours_mb = str(tmp_path / "ours.mbtiles")
        ins = [a for s in srcs for a in ("--input", s)]
        cli.main([
            *ins, "--out", str(tmp_path / "out"),
            "--maxzoom", str(maxzoom), "--mbtiles", ours_mb, *ours_extra,
        ])
        con = sqlite3.connect(ours_mb)
        ours = {
            (z, x, y): bytes(d)
            for z, x, y, d in con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")
        }
        con.close()
    bad = [k for k in sorted(set(ref) | set(ours)) if ours.get(k) != ref.get(k)]
    assert not bad, f"{len(bad)} tiles differ: {bad[:8]}"


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
@pytest.mark.parametrize("name,maxzoom,extra,ours_extra", BYTE_EXACT_CORPORA)
def test_real_corpus_mbtiles_byte_exact(ray_session, name, maxzoom, extra,
                                        ours_extra, tmp_path):
    """Every tile's COMPRESSED bytes match the reference binary's
    mbtiles exactly: geometry, attributes (key order, value typing,
    pooled+sorted value tables), layer/feature field layout, and the
    deflate stream (mvt.cpp:87-95 parameters). The strategies metadata
    string must match too."""
    import sqlite3

    from tests.test_pn_shared_nodes import _ref_tiles
    from tippecanoe_ray import __main__ as cli

    src = _src(name)
    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "ref.mbtiles")
        subprocess.run(
            [*(["/tmp/refbuild/tippecanoe"]), "-o", mb, f"-z{maxzoom}", "-f",
             "-q", *extra, src],
            check=True, capture_output=True,
        )
        con = sqlite3.connect(mb)
        ref = {
            (z, x, y): bytes(d)
            for z, x, y, d in con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")
        }
        ref_meta = dict(con.execute("SELECT name, value FROM metadata"))
        con.close()

        ours_mb = str(tmp_path / "ours.mbtiles")
        cli.main([
            "--input", src, "--out", str(tmp_path / "out"),
            "--maxzoom", str(maxzoom), "--mbtiles", ours_mb, *ours_extra,
        ])
        con = sqlite3.connect(ours_mb)
        ours = {
            (z, x, y): bytes(d)
            for z, x, y, d in con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")
        }
        our_meta = dict(con.execute("SELECT name, value FROM metadata"))
        con.close()
    bad = [k for k in sorted(set(ref) | set(ours)) if ours.get(k) != ref.get(k)]
    assert not bad, f"{len(bad)} tiles differ: {bad[:8]}"
    assert our_meta.get("strategies") == ref_meta.get("strategies")


@pytest.mark.skipif(not has_reference(), reason="reference binary not built")
def test_clip_bounding_box_byte_exact(ray_session, tmp_path):
    """--clip-bounding-box clips at ingest (serial.cpp:466-500 with the
    rounding SHIFT_RIGHT, tile.cpp:62) — byte-identical tiles vs the
    reference on NE countries."""
    import sqlite3

    from tippecanoe_ray import __main__ as cli

    src = _src("ne_110m_admin_0_countries")
    mb = str(tmp_path / "ref.mbtiles")
    subprocess.run(
        ["/tmp/refbuild/tippecanoe", "-o", mb, "-z4", "-f", "-q",
         "--clip-bounding-box=-20,20,40,60", src],
        check=True, capture_output=True,
    )
    ours_mb = str(tmp_path / "ours.mbtiles")
    cli.main([
        "--input", src, "--out", str(tmp_path / "out"), "--maxzoom", "4",
        "--clip-bounding-box=-20,20,40,60", "--mbtiles", ours_mb,
    ])

    def tiles(p):
        con = sqlite3.connect(p)
        out = {
            (z, x, y): bytes(d)
            for z, x, y, d in con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")
        }
        con.close()
        return out

    a, b = tiles(ours_mb), tiles(mb)
    bad = [k for k in sorted(set(a) | set(b)) if a.get(k) != b.get(k)]
    assert not bad, bad[:8]

