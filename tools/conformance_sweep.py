"""Conformance sweep over the reference's ENTIRE golden-output matrix.

For every `tests/<corpus>/out/<flags>.json` golden file under
/root/reference/tests, reconstruct the reference's flag list from the
filename (the Makefile's testargs decoding, Makefile:141-160), run the
reference binary (/tmp/refbuild/tippecanoe) AND our CLI on the same
corpus inputs (all *.json / *.json.gz in the corpus dir, sorted — the
Makefile's wildcard rule, Makefile:672-676), and compare the mbtiles
`tiles` tables byte-for-byte.

Usage:
    python tools/conformance_sweep.py            # all cases
    python tools/conformance_sweep.py populated  # substring filter
    python tools/conformance_sweep.py --list-unsupported

Prints one line per case: OK / DIFF / UNSUPPORTED(<token>) / REF-FAIL /
CLI-FAIL, then a summary. UNSUPPORTED means the translator has no
mapping for a reference flag yet — the explicit to-do list.
"""

from __future__ import annotations

import glob
import os
import sqlite3
import subprocess
import sys
import tempfile

REF = "/tmp/refbuild/tippecanoe"
DECODE = "/tmp/refbuild/tippecanoe-decode"
TESTS = "/root/reference/tests"


class Unsupported(Exception):
    pass


def decode_name(name: str) -> list[str]:
    """Makefile testargs decoding: _ splits arguments; %XX escapes
    decode within each argument (Makefile:141-160)."""
    toks = name.split("_")
    out = []
    for t in toks:
        for a, b in (("%20", " "), ("%22", '"'), ("%3a", ":"), ("%3d", "="),
                     ("%2f", "/"), ("%7b", "{"), ("%5f", "_")):
            t = t.replace(a, b)
        out.append(t)
    return out


# reference -a<letter> -> our long flag (options.hpp:4-32); None = no
# support yet
A_LETTERS = {
    "@": "",  # debug polygon output (stderr only)
    "C": "--cluster-densest-as-needed",
    "D": "--coalesce-fraction-as-needed",
    "G": "--increase-gamma-as-needed",
    "I": "--convert-stringified-ids-to-numbers",
    "L": "--grid-low-zooms",
    "N": "--coalesce-smallest-as-needed",
    "P": "--convert-polygons-to-label-points",
    "R": "",  # prefer-radix-sort: no output effect
    "S": "--coalesce-densest-as-needed",
    "X": "--calculate-feature-index",
    "b": "--detect-shared-borders",
    "c": "--coalesce",
    "d": "--drop-fraction-as-needed",
    "e": "--extend-zooms-if-still-dropping",
    "g": "--calculate-feature-density",
    "h": "--hilbert",
    "i": "--generate-ids",
    "l": "--drop-lines",
    "n": "--drop-smallest-as-needed",
    "o": "--reorder",
    "p": "--drop-polygons",
    "r": "--reverse",
    "s": "--drop-densest-as-needed",
    "t": "--generate-variable-depth-tile-pyramid",
    "v": "--visvalingam",
    "w": "--detect-longitude-wraparound",
    "a": "--keep-point-cluster-position",
}

# reference -p<letter> -> our long flag (options.hpp:34-52)
P_LETTERS = {
    "C": "--no-tile-compression",
    "D": "--no-duplication",
    "N": "--single-precision",
    "S": "--simplify-only-low-zooms",
    "T": "--no-tiny-polygon-reduction-at-maximum-zoom",
    "W": "--reverse-source-polygon-winding",
    "b": "--limit-base-zoom-to-maximum-zoom",
    "c": "--no-clipping",
    "d": "--force-feature-limit",
    "e": "--empty-csv-columns-are-null",
    "f": "--no-feature-limit",
    "g": "",  # no-tilestats: metadata only; tiles unaffected
    "i": "--preserve-input-order",
    "k": "--no-tile-size-limit",
    "n": "--prevent-shared-nodes",
    "p": "",  # no-polygon-splitting: defined but never read upstream
    "s": "--no-line-simplification",
    "t": "--no-tiny-polygon-reduction",
    "w": "--use-source-polygon-winding",
}

# short flags with attached argument -> (our flag, takes_value)
SHORT = {
    "z": "--maxzoom", "Z": "--minzoom", "d": "--full-detail",
    "D": "--low-detail", "m": "--minimum-detail", "y": "-y",
    "x": "-x", "r": "--droprate", "B": "--basezoom",
    "M": "--max-tile-bytes", "O": "--max-tile-features",
    "K": "--cluster-distance", "k": "--cluster-maxzoom",
    "g": "--gamma", "S": "--simplification", "b": "--buffer",
    "l": "--layer-name", "L": "-L", "T": "-T",
    "E": "--accumulate-attribute", "j": "-j", "J": "-J",
    "s": "--projection", "C": "--prefilter", "c": "--postfilter",
    "R": "--one-tile",
}
SHORT_NOARG = {"X": "--exclude-all"}
SHORT_UNSUPPORTED: set = set()
# flags that change no tile bytes (ignored)
SHORT_IGNORE = {"q", "f", "P", "Q", "U"}
# metadata-only short flags WITH an argument: consume, emit nothing
# (-Y attribute-description only feeds the tilestats json block)
SHORT_METADATA = {"A", "N", "n", "Y"}

LONG = {
    "--maximum-zoom": ("--maxzoom", True),
    "--minimum-zoom": ("--minzoom", True),
    "--maximum-tile-bytes": ("--max-tile-bytes", True),
    "--maximum-tile-features": ("--max-tile-features", True),
    "--maximum-string-attribute-length":
        ("--maximum-string-attribute-length", True),
    "--full-detail": ("--full-detail", True),
    "--low-detail": ("--low-detail", True),
    "--minimum-detail": ("--minimum-detail", True),
    "--drop-rate": ("--droprate", True),
    "--base-zoom": ("--basezoom", True),
    "--layer": ("--layer-name", True),
    "--named-layer": ("-L", True),
    "--include": ("-y", True),
    "--exclude": ("-x", True),
    "--exclude-all": ("-X", False),
    "--buffer": ("--buffer", True),
    "--gamma": ("--gamma", True),
    "--simplification": ("--simplification", True),
    "--simplification-at-maximum-zoom":
        ("--simplification-at-maximum-zoom", True),
    "--cluster-distance": ("--cluster-distance", True),
    "--cluster-maxzoom": ("--cluster-maxzoom", True),
    "--preserve-point-density-threshold":
        ("--preserve-point-density-threshold", True),
    "--preserve-multiplier-density-threshold":
        ("--preserve-multiplier-density-threshold", True),
    "--retain-points-multiplier": ("--retain-points-multiplier", True),
    "--smallest-maximum-zoom-guess":
        ("--smallest-maximum-zoom-guess", True),
    "--extend-zooms-if-still-dropping":
        ("--extend-zooms-if-still-dropping", False),
    "--extend-zooms-if-still-dropping-maximum":
        ("--extend-zooms-if-still-dropping-maximum", True),
    "--generate-variable-depth-tile-pyramid":
        ("--generate-variable-depth-tile-pyramid", False),
    "--drop-densest-as-needed": ("--drop-densest-as-needed", False),
    "--drop-denser": ("--drop-denser", True),
    "--drop-fraction-as-needed": ("--drop-fraction-as-needed", False),
    "--drop-smallest-as-needed": ("--drop-smallest-as-needed", False),
    "--drop-by-attribute-as-needed": ("--drop-by-attribute-as-needed", True),
    "--drop-by-attribute-order": ("--drop-by-attribute-order", True),
    "--coalesce-densest-as-needed": ("--coalesce-densest-as-needed", False),
    "--coalesce-fraction-as-needed": ("--coalesce-fraction-as-needed", False),
    "--coalesce-smallest-as-needed": ("--coalesce-smallest-as-needed", False),
    "--cluster-densest-as-needed": ("--cluster-densest-as-needed", False),
    "--force-feature-limit": ("--force-feature-limit", False),
    "--keep-point-cluster-position": ("--keep-point-cluster-position", False),
    "--increase-gamma-as-needed": ("--increase-gamma-as-needed", False),
    "--limit-tile-feature-count": ("--limit-tile-feature-count", True),
    "--limit-tile-feature-count-at-maximum-zoom":
        ("--limit-tile-feature-count-at-maximum-zoom", True),
    "--no-feature-limit": ("--no-feature-limit", False),
    "--no-tile-size-limit": ("--no-tile-size-limit", False),
    "--order-by": ("--order-by", True),
    "--order-descending-by": ("--order-descending-by", True),
    "--order-smallest-first": ("--order-smallest-first", False),
    "--order-largest-first": ("--order-largest-first", False),
    "--preserve-input-order": ("--preserve-input-order", False),
    "--reorder": ("--reorder", False),
    "--coalesce": ("--coalesce", False),
    "--hilbert": ("--hilbert", False),
    "--reverse": ("--reverse", False),
    "--calculate-feature-density": ("--calculate-feature-density", False),
    "--grid-low-zooms": ("--grid-low-zooms", False),
    "--extra-detail": ("--extra-detail", True),
    "--detect-longitude-wraparound":
        ("--detect-longitude-wraparound", False),
    "--clip-bounding-box": ("--clip-bounding-box", True),
    "--no-clipping": ("--no-clipping", False),
    "--no-duplication": ("--no-duplication", False),
    "--no-simplification-of-shared-nodes": ("--prevent-shared-nodes", False),
    "--convert-polygons-to-label-points":
        ("--convert-polygons-to-label-points", False),
    "--drop-lines": ("--drop-lines", False),
    "--drop-polygons": ("--drop-polygons", False),
    "--tiny-polygon-size": ("--tiny-polygon-size", True),
    "--no-tiny-polygon-reduction": ("--no-tiny-polygon-reduction", False),
    "--no-tiny-polygon-reduction-at-maximum-zoom":
        ("--no-tiny-polygon-reduction-at-maximum-zoom", False),
    "--set-attribute": ("--set-attribute", True),
    "--accumulate-attribute": ("--accumulate-attribute", True),
    "--attribute-type": ("-T", True),
    "--single-precision": ("--single-precision", False),
    "--feature-filter": ("-j", True),
    "--feature-filter-file": ("-J", True),
    "--prefilter": ("--prefilter", True),
    "--postfilter": ("--postfilter", True),
    "--use-attribute-for-id": ("--use-attribute-for-id", True),
    "--convert-stringified-ids-to-numbers":
        ("--convert-stringified-ids-to-numbers", False),
    "--generate-ids": ("--generate-ids", False),
    "--visvalingam": ("--visvalingam", False),
    "--detect-shared-borders": ("--detect-shared-borders", False),
    "--projection": ("--projection", True),
    "--one-tile": ("--one-tile", True),
    "--read-parallel": ("", False),
    "--name": ("--name", True),
    "--description": ("--description", True),
    "--attribution": ("--attribution", True),
    "--no-tile-stats": ("--no-tile-stats", False),
    "--prefer-radix-sort": ("", False),
    "--tile-stats-attributes-limit": ("--tile-stats-attributes-limit", True),
    "--tile-stats-sample-values-limit": ("--tile-stats-sample-values-limit", True),
    "--tile-stats-values-limit": ("--tile-stats-values-limit", True),
    "--attribute-description": ("", True),
    "--use-source-polygon-winding": ("--use-source-polygon-winding", False),
    "--reverse-source-polygon-winding": ("--reverse-source-polygon-winding", False),
    "--empty-csv-columns-are-null": ("--empty-csv-columns-are-null", False),
    "--no-line-simplification": ("--no-line-simplification", False),
    "--simplify-only-low-zooms": ("--simplify-only-low-zooms", False),

    "--no-polygon-splitting": ("", False),
    "--no-tile-compression": ("--no-tile-compression", False),
    "--limit-base-zoom-to-maximum-zoom":
        ("--limit-base-zoom-to-maximum-zoom", False),
}


def translate(tokens: list[str]) -> list[str]:
    """Reference argv -> our CLI argv; raises Unsupported."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        i += 1
        if t.startswith("--"):
            name, eq, val = t.partition("=")
            if name not in LONG:
                raise Unsupported(name)
            ours, takes = LONG[name]
            if ours is None:
                raise Unsupported(name)
            if takes and not eq:
                val = tokens[i]
                i += 1
            if ours == "":
                continue
            if takes and val.startswith("-"):
                out.append(f"{ours}={val}")  # argparse-safe
            else:
                out.append(ours)
                if takes:
                    out.append(val)
            continue
        if t.startswith("-") and len(t) >= 2:
            c = t[1]
            rest = t[2:]
            if c == "a":
                for ch in rest:
                    mapped = A_LETTERS.get(ch)
                    if mapped is None:
                        raise Unsupported(f"-a{ch}")
                    if mapped:
                        out.append(mapped)
                continue
            if c == "p":
                # -pi etc: every char must map
                for ch in rest:
                    mapped = P_LETTERS.get(ch)
                    if mapped is None:
                        raise Unsupported(f"-p{ch}")
                    if mapped:
                        out.append(mapped)
                continue
            if c in SHORT_NOARG and not rest:
                out.append(SHORT_NOARG[c])
                continue
            if c in SHORT_IGNORE:
                continue
            if c in SHORT_METADATA:
                if not rest:
                    i += 1
                continue
            if c in SHORT_UNSUPPORTED:
                raise Unsupported(t)
            if c not in SHORT:
                raise Unsupported(t)
            if not rest:
                rest = tokens[i]
                i += 1
            out.append(SHORT[c])
            out.append(rest)
            continue
        raise Unsupported(t)
    return out


def tiles(p):
    con = sqlite3.connect(p)
    d = {(z, x, y): bytes(b) for z, x, y, b in con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")}
    con.close()
    return d


def corpus_inputs(corpus_dir: str) -> list[str]:
    # the Makefile rule: sorted *.json then sorted *.json.gz
    return (sorted(glob.glob(os.path.join(corpus_dir, "*.json")))
            + sorted(glob.glob(os.path.join(corpus_dir, "*.json.gz"))))


def run_case(corpus_dir: str, name: str, timeout=600):
    ref_args = decode_name(name)
    try:
        our_args = translate(ref_args)
    except Unsupported as e:
        return ("UNSUPPORTED", str(e))
    inputs = corpus_inputs(corpus_dir)
    if not inputs:
        return ("NO-INPUT", corpus_dir)
    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "ref.mbtiles")
        # run from the reference root: -J/-L/-C test args use relative
        # paths like tests/feature-filter/filter
        p0 = subprocess.run(
            [REF, "-q", "-a@", "-f", "-o", mb, *ref_args, *inputs],
            capture_output=True, text=True, timeout=timeout,
            cwd="/root/reference")
        if p0.returncode != 0:
            return ("REF-FAIL", f"{p0.returncode} {p0.stderr[-120:]}")
        ours = os.path.join(td, "ours.mbtiles")
        ins = [a for s in inputs for a in ("--input", s)]
        env = dict(os.environ, PYTHONPATH="/root/repo")
        p = subprocess.run(
            [sys.executable, "-m", "tippecanoe_ray", *ins,
             "--num-cpus", "2",
             "--out", os.path.join(td, "o"), "--mbtiles", ours, *our_args],
            capture_output=True, text=True, cwd="/root/reference",
            timeout=timeout, env=env)
        if p.returncode != 0:
            return ("CLI-FAIL", p.stderr[-400:])
        r, o = tiles(mb), tiles(ours)
        bad = [k for k in sorted(set(r) | set(o)) if r.get(k) != o.get(k)]
        if bad:
            return ("DIFF", f"{len(bad)}/{len(set(r) | set(o))} {bad[:3]}")
        if "--decode" in sys.argv:
            # whole-file decode comparison: metadata (bounds/center/
            # vector_layers/tilestats/strategies/decisions) + tiles via
            # the reference's own tippecanoe-decode; name/description
            # and the generator fields are run-specific paths/argv
            exc = []
            for k in ("name", "description", "generator",
                      "generator_options"):
                exc += ["-x", k]
            da = subprocess.run([DECODE, *exc, mb], capture_output=True,
                                text=True, timeout=timeout)
            db = subprocess.run([DECODE, *exc, ours], capture_output=True,
                                text=True, timeout=timeout)
            if da.stdout != db.stdout:
                for la, lb in zip(da.stdout.split("\n"),
                                  db.stdout.split("\n")):
                    if la != lb:
                        return ("META-DIFF", f"{la[:90]!r} vs {lb[:90]!r}")
                return ("META-DIFF", "length mismatch")
        return ("OK", f"{len(r)} tiles")


def main():
    from concurrent.futures import ThreadPoolExecutor

    filt = [a for a in sys.argv[1:] if not a.startswith("--")]
    golden = sorted(glob.glob(os.path.join(TESTS, "*", "out", "*.json")))
    stats: dict[str, int] = {}
    unsupported: dict[str, int] = {}
    cases = []
    for g in golden:
        corpus_dir = os.path.dirname(os.path.dirname(g))
        name = os.path.basename(g)[:-5]
        case = f"{os.path.basename(corpus_dir)}/{name}"
        if filt and not any(f in case for f in filt):
            continue
        cases.append((corpus_dir, name, case))

    def one(item):
        corpus_dir, name, case = item
        try:
            return case, *run_case(corpus_dir, name)
        except subprocess.TimeoutExpired:
            return case, "TIMEOUT", ""

    workers = int(os.environ.get("SWEEP_WORKERS", "10"))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for case, status, detail in pool.map(one, cases):
            stats[status] = stats.get(status, 0) + 1
            if status == "UNSUPPORTED":
                unsupported[detail] = unsupported.get(detail, 0) + 1
            print(f"{status:12s} {case}"
                  + (f"  [{detail}]" if status != "OK" else ""), flush=True)
    print("\n== summary:", dict(sorted(stats.items())))
    if unsupported:
        print("== unsupported flags:",
              dict(sorted(unsupported.items(), key=lambda kv: -kv[1])))


if __name__ == "__main__":
    main()
