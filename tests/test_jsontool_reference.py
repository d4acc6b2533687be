"""tippecanoe-json-tool conformance: the `jsontool` subcommand's
stdout compared byte-for-byte against the reference binary and against
the reference's own json-tool-test goldens (Makefile:163-170)."""

import os
import subprocess

import pytest

REF = "/tmp/refbuild/tippecanoe-json-tool"
POP = "/root/reference/tests/join-population"


def has_ref():
    return os.path.exists(REF)


def ours(args, stdin: bytes = b"") -> bytes:
    r = subprocess.run(
        ["python", "-m", "tippecanoe_ray", "jsontool", *args],
        input=stdin, capture_output=True, cwd="/root/repo",
    )
    return r.stdout


def refout(args, stdin: bytes = b"") -> bytes:
    r = subprocess.run([REF, *args], input=stdin, capture_output=True)
    return r.stdout


@pytest.mark.skipif(not has_ref(), reason="reference binary not built")
def test_json_tool_golden_matrix(tmp_path):
    """The reference's json-tool-test replayed verbatim through OUR
    tool: -e extraction, bytewise sort, -c CSV sorted-merge join, and
    --empty-csv-columns-are-null, each cmp'd against the checked-in
    .standard goldens (Makefile:163-170)."""
    extracted = ours(["-e", "GEOID10", f"{POP}/tabblock_06001420.json"])
    srt = b"".join(
        ln + b"\n" for ln in sorted(extracted.splitlines()))
    sort_file = tmp_path / "sorted.json"
    sort_file.write_bytes(srt)

    joined = ours(["-c", f"{POP}/population.csv", str(sort_file)])
    golden = open(
        f"{POP}/tabblock_06001420.json.sort.joined.standard", "rb").read()
    assert joined == golden

    joined_null = ours(["--empty-csv-columns-are-null",
                        "-c", f"{POP}/population.csv", str(sort_file)])
    golden_null = open(
        f"{POP}/tabblock_06001420-null.json.sort.joined.standard",
        "rb").read()
    assert joined_null == golden_null


@pytest.mark.skipif(not has_ref(), reason="reference binary not built")
@pytest.mark.parametrize("corpus", [
    "ne_110m_admin_0_countries",  # polygons, rich attrs, gz sibling
    "dateline",                   # per-feature tippecanoe objects
    "islands",                    # UTF-8 BOM prefix
    "onefeature",                 # truncated JSON: stream-then-error
    "geometry",                   # bare geometries
    "highzoom",
    "stringid",
])
@pytest.mark.parametrize("mode", [[], ["-w"], ["-e", "name"]])
def test_json_tool_byte_identical(corpus, mode):
    """Plain, -w wrapped, and -e extracted output matches the
    reference binary byte-for-byte (incl. jsonpull's raw-byte string
    model, dtoa_milo numbers, decimal \\u sort quoting, and the
    emit-before-parse-error streaming order)."""
    src = f"/root/reference/tests/{corpus}/in.json"
    if not os.path.exists(src):
        # gz-only corpora (ne countries) and the bare-geometry corpus
        # carry their json under other names — exercise them all
        import glob
        import gzip
        import tempfile

        alts = sorted(
            p for p in glob.glob(f"/root/reference/tests/{corpus}/*.json")
            if "/out" not in p
        )
        if not alts and os.path.exists(src + ".gz"):
            with tempfile.NamedTemporaryFile(
                    suffix=".json", delete=False) as tf:
                tf.write(gzip.open(src + ".gz").read())
                alts = [tf.name]
        assert alts, f"no json input for {corpus}"
        for a in alts:
            assert ours([*mode, a]) == refout([*mode, a])
        return
    assert ours([*mode, src]) == refout([*mode, src])


@pytest.mark.skipif(not has_ref(), reason="reference binary not built")
def test_json_tool_quirks():
    """Parser/stringifier quirk cases compared live: large ints beyond
    2^53 keep exact digits, \\uFFFF takes jsonpull's 4-byte encoding,
    lone surrogates flush as 3-byte sequences, control characters
    re-escape as lowercase hex, duplicate keys survive, and sort_quote
    uses DECIMAL code points."""
    cases = [
        b'{"type":"Feature","properties":{"a":18014398509481985,'
        b'"b":-18014398509481985,"c":1.5e5,"d":"\\uffff",'
        b'"e":"\\ud83d\\ude00","f":"\\ud800x","g":"a\\u0007b",'
        b'"a":"dup"},"geometry":{"type":"Point","coordinates":[0,0]}}',
        b'{"type":"Point","coordinates":[1e2,0.30000000000000004]}',
    ]
    for case in cases:
        assert ours([], stdin=case) == refout([], stdin=case)
        # extract a STRING key; extracting a NUMBER is undefined
        # behavior upstream (jsontool.cpp:153 type-puns the double) —
        # the reference binary crashes on it, we print dtoa_milo
        assert (ours(["-e", "d"], stdin=case)
                == refout(["-e", "d"], stdin=case))
