"""The reference's csv-test golden comparison (Makefile:632-644):
run OUR CLI over tests/csv/ne_110m_populated_places_simple.csv, decode
the mbtiles with the REFERENCE's tippecanoe-decode, and compare
byte-for-byte against the reference's checked-in golden JSON — tiles
AND the full metadata (bounds/center from the file bbox incl. the
nan/inf coordinate rows, vector_layers field types, tilestats).
"""

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

from tests.conftest import has_reference

CSV = "/root/reference/tests/csv/ne_110m_populated_places_simple.csv"
DECODE = "/tmp/refbuild/tippecanoe-decode"


def _run_case(flags: list[str], out_name: str, exclude_cmdline: bool):
    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "tests", "csv"))
        shutil.copy(CSV, os.path.join(td, "tests", "csv"))
        rel = os.path.join("tests", "csv", out_name)
        env = dict(os.environ, PYTHONPATH="/root/repo")
        p = subprocess.run(
            [sys.executable, "-m", "tippecanoe_ray",
             "--input", os.path.join("tests", "csv",
                                     os.path.basename(CSV)),
             "--out", os.path.join(td, "o"), "--mbtiles", rel,
             "--maxzoom", "g", "--num-cpus", "2", *flags],
            cwd=td, env=env, capture_output=True, text=True, timeout=600,
        )
        assert p.returncode == 0, p.stderr[-800:]
        dec = subprocess.run(
            [DECODE, "-x", "generator", "-x", "generator_options", rel],
            cwd=td, capture_output=True, text=True, timeout=120,
        )
        assert dec.returncode == 0, dec.stderr[-400:]
        golden = open(
            os.path.join("/root/reference/tests/csv", out_name + ".json")
        ).read()
        got = dec.stdout
        if exclude_cmdline:
            golden = "\n".join(
                ln for ln in golden.split("\n")
                if '"generator_options"' not in ln)
        assert got == golden


@pytest.mark.skipif(not os.path.exists(DECODE),
                    reason="reference binary not built")
def test_csv_golden_byte_exact(ray_session):
    _run_case([], "out.mbtiles", exclude_cmdline=False)


@pytest.mark.skipif(not os.path.exists(DECODE),
                    reason="reference binary not built")
def test_csv_null_golden_byte_exact(ray_session):
    # the reference's golden for this case embeds its own argv as
    # generator_options, which no other binary can reproduce; compare
    # everything else byte-for-byte
    _run_case(["--empty-csv-columns-are-null"], "out-null.mbtiles",
              exclude_cmdline=True)


def test_atof_c_semantics():
    from tippecanoe_ray.functions.attributes import _atof
    import math

    assert math.isnan(_atof("nan"))
    assert _atof("inf") == float("inf")
    assert _atof("-Infinity") == float("-inf")
    assert _atof("Infotext") == float("inf")  # longest valid prefix
    assert _atof("12.5abc") == 12.5
    assert _atof("abc") == 0.0
