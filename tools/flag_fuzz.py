"""Randomized differential flag fuzz vs the reference binary.

The conformance sweep replays the 184 golden flag combinations; this
harness composes NEW combinations from a pool of orthogonal flags,
runs the reference tippecanoe and our CLI on the same corpus, and
byte-compares the mbtiles `tiles` tables. Seeded and reproducible:

    python tools/flag_fuzz.py [N] [seed]

Combos the reference itself rejects (exit != 0) or that translate()
marks unsupported are skipped and counted; any DIFF is a real parity
bug. Uses tools/conformance_sweep.py's argv translation and tile
reader so the mapping under test is the production one.
"""

from __future__ import annotations

import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import conformance_sweep as cs  # noqa: E402

CORPORA = [
    "ne_110m_admin_0_countries",
    "ne_110m_admin_1_states_provinces_lines",
    "dateline",
    "islands",
]

# orthogonal option groups: at most one entry per group joins a combo
GROUPS: list[list[list[str]]] = [
    # zoom range
    [["-z4"], ["-z5"], ["-Z2", "-z4"], ["-Z1", "-z3"]],
    # rate / base zoom
    [["-B3"], ["-r2"], ["-r1.5"], ["-B2", "-r3"]],
    # gamma / cluster
    [["-g2"], ["-K50"], ["-K200"]],
    # as-needed strategies
    [["--drop-densest-as-needed"], ["--drop-smallest-as-needed"],
     ["--drop-fraction-as-needed"], ["--coalesce-smallest-as-needed"],
     ["--coalesce-densest-as-needed"], ["--coalesce-fraction-as-needed"]],
    # size/count limits + detail
    [["-M2000"], ["-O150"], ["-d9"], ["-M3000", "-d10"]],
    # -a additionals
    [["-ac"], ["-ao"], ["-ar"], ["-aL"], ["-ab"], ["-aw"], ["-ap"],
     ["-aP"], ["-ag"], ["-ac", "-ao"]],
    # -p preventions
    [["-pn"], ["-pc"], ["-pD"], ["-pt"], ["-pi"], ["-pf", "-pk"],
     ["-ps"], ["-pS"]],
    # attribute handling
    [["-x", "scalerank"], ["-y", "name"], ["-T", "scalerank:string"],
     ["-l", "mylayer"], ["-X"]],
    # misc
    [["--visvalingam"], ["--hilbert"], ["--generate-ids"],
     ["--detect-shared-borders"]],
]


def one(corpus: str, tokens: list[str], timeout=600):
    corpus_dir = os.path.join("/root/reference/tests", corpus)
    inputs = cs.corpus_inputs(corpus_dir)
    if not inputs:
        return ("NO-INPUT", corpus)
    try:
        ours_args = cs.translate(tokens)
    except cs.Unsupported as e:
        return ("UNSUPPORTED", str(e))
    with tempfile.TemporaryDirectory() as td:
        mb = os.path.join(td, "ref.mbtiles")
        p0 = subprocess.run(
            [cs.REF, "-q", "-a@", "-f", "-o", mb, *tokens, *inputs],
            capture_output=True, text=True, timeout=timeout,
            cwd="/root/reference")
        if p0.returncode != 0:
            return ("REF-REJECT", p0.stderr.strip()[-90:])
        ours = os.path.join(td, "ours.mbtiles")
        ins = [a for s in inputs for a in ("--input", s)]
        env = dict(os.environ, PYTHONPATH="/root/repo")
        p = subprocess.run(
            [sys.executable, "-m", "tippecanoe_ray", *ins, "--num-cpus", "2",
             "--out", os.path.join(td, "o"), "--mbtiles", ours, *ours_args],
            capture_output=True, text=True, cwd="/root/reference",
            timeout=timeout, env=env)
        if p.returncode != 0:
            return ("CLI-FAIL", p.stderr.strip()[-400:])
        r, o = cs.tiles(mb), cs.tiles(ours)
        bad = [k for k in sorted(set(r) | set(o)) if r.get(k) != o.get(k)]
        if bad:
            return ("DIFF", f"{len(bad)}/{len(set(r) | set(o))} {bad[:3]}")
        return ("OK", f"{len(r)} tiles")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = random.Random(seed)
    stats: dict[str, int] = {}
    fails = []
    for t in range(n):
        corpus = rng.choice(CORPORA)
        k = rng.randint(2, 4)
        groups = rng.sample(range(len(GROUPS)), k)
        tokens: list[str] = []
        if 0 not in groups:
            tokens += ["-z4"]  # keep runs fast
        for gi in sorted(groups):
            tokens += rng.choice(GROUPS[gi])
        status, detail = one(corpus, tokens)
        stats[status] = stats.get(status, 0) + 1
        line = f"{status:<12} {corpus} {' '.join(tokens)}"
        print(line if status in ("OK", "REF-REJECT", "UNSUPPORTED")
              else f"{line}\n    {detail}", flush=True)
        if status in ("DIFF", "CLI-FAIL"):
            fails.append((corpus, tokens, detail))
    print(f"\n== summary: {stats}")
    if fails:
        print("== FAILURES:")
        for c, tk, d in fails:
            print(f"  {c} {' '.join(tk)} -> {d}")
        sys.exit(1)


if __name__ == "__main__":
    main()
