"""Vatti union port (functions/wagyu.py) — parity with the reference's
polygon cleaner (clean_or_clip_poly clip.cpp:260-388, mapbox wagyu
union with positive fill).

The pinned cases' expected outputs were captured from an instrumented
probe of the reference build (tools/wagyu_probe.cpp); when that probe
binary is present, a live fuzz compares the port against it directly.
"""

import os
import random
import subprocess

import pytest

from tippecanoe_ray.functions import wagyu

PROBE = "/tmp/wagyu_probe"


def u(rings, scale=False):
    return wagyu.union_multi(rings, try_scaling=scale)


def test_square_canonicalization():
    # start vertex moves to the sweep's list head; ring closed
    assert u([[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]]) == [
        [[(10, 0), (10, 10), (0, 10), (0, 0), (10, 0)]]
    ]


def test_bowtie_positive_fill():
    # self-intersecting bowtie: positive-winding half survives,
    # intersection point inserted
    assert u([[(0, 0), (10, 10), (10, 0), (0, 10), (0, 0)]]) == [
        [[(0, 0), (5, 5), (0, 10), (0, 0)]]
    ]


def test_hole_preserved():
    out = u([
        [(0, 0), (40, 0), (40, 40), (0, 40), (0, 0)],
        [(10, 10), (10, 20), (20, 20), (20, 10), (10, 10)],
    ])
    assert len(out) == 1 and len(out[0]) == 2
    # hole winding is opposite the outer ring's
    outer, hole = out[0]
    assert outer[0] == outer[-1] and hole[0] == hole[-1]


def test_shared_edge_merge():
    # two squares sharing an edge union into one ring
    out = u([
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        [(10, 0), (20, 0), (20, 10), (10, 10), (10, 0)],
    ])
    assert len(out) == 1 and len(out[0]) == 1
    xs = [p[0] for p in out[0][0]]
    assert min(xs) == 0 and max(xs) == 20


def test_negative_only_ring_vanishes():
    # a hole with no outer unions to nothing (positive fill)
    assert u([[(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]]) == []


def test_duplicate_stacked_rings():
    # identical stacked rings collapse to one
    r = [(0, 0), (15, 0), (15, 15), (0, 15), (0, 0)]
    out = u([r, list(r)])
    assert len(out) == 1 and len(out[0]) == 1


def test_collinear_points_removed():
    out = u([[(0, 0), (5, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])
    assert out == [[[(10, 0), (10, 10), (0, 10), (0, 0), (10, 0)]]]


def test_scale_retry_mode():
    # x16 scale keeps grid-aligned output identical for clean input
    r = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    assert u([r], scale=True) == u([r])


@pytest.mark.skipif(not os.path.exists(PROBE), reason="probe not built")
def test_fuzz_vs_reference_probe():
    import math

    def run_probe(polys):
        lines = []
        for ring in polys:
            lines.append("ring " + " ".join(f"{x} {y}" for x, y in ring))
        lines.append("END")
        out = subprocess.run([PROBE], input="\n".join(lines) + "\n",
                             capture_output=True, text=True, timeout=30)
        res = []
        for ln in out.stdout.splitlines():
            if ln.startswith("RESULT") or ln == "DONE":
                continue
            op, x, y = ln.split()
            res.append((int(op), int(x), int(y)))
        return res

    def run_port(polys):
        res = []
        for poly in wagyu.union_multi(polys):
            for ring in poly:
                for k, (x, y) in enumerate(ring):
                    res.append((1 if k == 0 else 2, x, y))
        return res

    for seed in range(60):
        rng = random.Random(777 + seed)
        kind = seed % 3
        if kind == 0:
            pts = [(rng.randint(0, 30), rng.randint(0, 30))
                   for _ in range(rng.randint(3, 9))]
            pts.append(pts[0])
            polys = [pts]
        elif kind == 1:
            polys = []
            for _ in range(rng.randint(2, 3)):
                pts = [(rng.randint(0, 40), rng.randint(0, 40))
                       for _ in range(rng.randint(3, 7))]
                pts.append(pts[0])
                polys.append(pts)
        else:
            n = rng.randint(5, 20)
            pts = []
            for i in range(n):
                a = 2 * math.pi * i / n
                r = rng.randint(5, 30)
                pts.append((50 + int(r * math.cos(a)), 50 + int(r * math.sin(a))))
            pts.append(pts[0])
            polys = [pts]
        assert run_port(polys) == run_probe(polys), (seed, polys)
