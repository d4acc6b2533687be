#!/bin/sh
# Build the instrumented reference probes the gated tests diff against.
# Requires the reference build tree at /tmp/refbuild (see SURVEY.md /
# memory: cp -r /root/reference /tmp/refbuild && make -C /tmp/refbuild
# -j32 tippecanoe tippecanoe-decode tile-join tippecanoe-json-tool
# tippecanoe-overzoom tippecanoe-enumerate). Tests skip when the
# probes are absent; this script makes them exercise.
set -e
REF=${REFBUILD:-/tmp/refbuild}
HERE=$(dirname "$0")

g++ -O2 -I "$REF" -o /tmp/dtoa_probe "$HERE/dtoa_probe.cpp"

g++ -O2 -std=c++17 -I "$REF" -o /tmp/wagyu_probe "$HERE/wagyu_probe.cpp" \
    "$REF"/geometry.o "$REF"/projection.o "$REF"/memfile.o "$REF"/mvt.o \
    "$REF"/text.o "$REF"/clip.o "$REF"/clipper2/src/clipper.engine.o \
    "$REF"/evaluator.o "$REF"/jsonpull/jsonpull.o "$REF"/read_json.o \
    "$REF"/attribute.o "$REF"/write_json.o "$REF"/platform.o \
    "$REF"/visvalingam.o -lz -lsqlite3 -lpthread -lm

echo "built /tmp/dtoa_probe /tmp/wagyu_probe"
