"""tippecanoe-json-tool: sort-key extraction (-e), FeatureCollection
wrapping (-w), and Unix-join-style sorted-merge CSV joining (-c,
--empty-csv-columns-are-null) over streamed GeoJSON.

Behavioral re-implementation of jsontool.cpp (and the jsonpull parser
/ stringifier semantics it depends on), byte-identical to the
reference binary on its json-tool-test goldens.  Everything operates
on BYTES so the parser's raw-byte string model survives round trips:

- the jsonpull string reader (jsonpull.c:630-730) decodes escapes to
  raw UTF-8 bytes, emits lone high surrogates as 3-byte sequences, and
  (quirk kept) encodes U+FFFF as a 4-byte sequence because its 3-byte
  branch tests ``ch < 0xFFFF`` strictly;
- numbers (jsonpull.c:540-625) carry atof(token), plus the exact
  integer when the token has no '.'/'e' and exceeds ±(2^53 − 1)
  (strtoull/strtoll, kept only if in range);
- json_stringify (jsonpull.c:875-996) escapes only ``\\``, ``"`` and
  bytes < 0x20 (as ``\\u%04x``; bytes ≥ 0x80 are "negative chars" in C
  and pass through raw), prints numbers as %lld / %llu for the large
  forms and dtoa_milo otherwise, and joins hash/array members with
  bare ':' / ',';
- json_hash_get returns the FIRST key match (jsonpull.c:1020-1035);
- the feature walk replays geojson-loop.cpp:39-190: every completed
  hash is offered in completion (post-) order, features are detached
  once emitted, bare geometries are only recognized before the first
  feature and only when not inside a GeometryCollection / a Feature's
  "geometry" / any ancestor's "properties"; parent-key lookups are
  bounded to the pairs parsed so far (streaming sees partial parents);
- sort_quote (jsontool.cpp:111-142) re-encodes each code point < U+D800
  as ``\\u%04lu`` — DECIMAL, the reference's actual format string —
  so quoting survives a bytewise `sort`(1);
- join_csv (jsontool.cpp:209-377) is the streaming sorted merge: CSV
  rows advance while key < joinkey, matched non-key fields append to
  properties (dequoted values re-dequoted when still quoted, numeric
  per is_number -> atof -> dtoa_milo, empty values kept as "" unless
  --empty-csv-columns-are-null DROPS them — JSON_NULL attrs are
  skipped by the append loop, jsontool.cpp:333), and out-of-sort
  inputs abort exactly like the reference.

Known deviation: extracting (-e) a NUMERIC attribute reads
``o->value.string.string`` off a JSON_NUMBER in the reference
(jsontool.cpp:153) — a union type-pun of the double's bits as a
char*, i.e. undefined behavior upstream; we print dtoa_milo(number)
instead.
"""

from __future__ import annotations

import sys

from ..functions.attributes import _atof
from ..functions.text import check_utf8, dtoa_milo
from .tilejoin import csv_dequote, csv_split, is_number_json

GEOMETRY_NAMES = (b"Point", b"MultiPoint", b"LineString",
                  b"MultiLineString", b"Polygon", b"MultiPolygon")

MAX_SAFE_INTEGER = 9007199254740991.0

# node types: ("hash", [(knode, vnode), ...]), ("array", [nodes]),
# ("str", bytes), ("num", double, large_signed, large_unsigned),
# ("true",), ("false",), ("null",)


class JsonToolError(RuntimeError):
    """Fatal tool error (out-of-sort inputs, mixed wrap types):
    non-zero exit, like the reference's exit(EXIT_*)."""


class JsonParseError(RuntimeError):
    """Per-file parse error: the reference prints it to stderr and
    moves on WITHOUT setting a failure code (parse_json breaks, main
    still returns EXIT_SUCCESS); features already emitted stay."""


# --------------------------------------------------------------- parser


class _Parser:
    """Just enough of jsonpull: ',' and ':' are structural separators
    that valid JSON always places where this parser expects them.
    ``on_hash(node, ancestry)`` fires as each hash COMPLETES — the
    jsonpull json_read stream order — so truncated inputs still emit
    every feature completed before the error, and parent hashes seen
    by the callback hold only the pairs parsed so far."""

    def __init__(self, buf: bytes, on_hash=None):
        self.buf = buf
        self.i = 0
        self.n = len(buf)
        self.on_hash = on_hash

    def _ws(self):
        while self.i < self.n:
            c = self.buf[self.i]
            if c in b" \t\r\n,:\x1e":  # incl. RFC 8142 RS
                self.i += 1
            elif c == 0xEF:  # byte-order mark (jsonpull.c:320-333)
                if self.buf[self.i + 1:self.i + 3] == b"\xbb\xbf":
                    self.i += 3
                else:
                    raise JsonParseError("Corrupt byte-order mark found")
            else:
                break

    def next_value(self):
        """Parse (and stream-offer) the next top-level value; None at
        EOF."""
        self._ws()
        if self.i >= self.n:
            return None
        return self._value(())

    def _value(self, ancestry):
        self._ws()
        if self.i >= self.n:
            raise JsonParseError(
                "Reached EOF without all containers being closed")
        c = self.buf[self.i]
        if c == 0x7B:  # {
            return self._hash(ancestry)
        if c == 0x5B:  # [
            return self._array(ancestry)
        if c == 0x22:  # "
            return ("str", self._string())
        if c == 0x2D or 0x30 <= c <= 0x39:  # - or digit
            return self._number()
        if self.buf.startswith(b"true", self.i):
            self.i += 4
            return ("true",)
        if self.buf.startswith(b"false", self.i):
            self.i += 5
            return ("false",)
        if self.buf.startswith(b"null", self.i):
            self.i += 4
            return ("null",)
        raise JsonParseError(
            f"unexpected byte {self.buf[self.i:self.i+1]!r} at {self.i}")

    def _hash(self, ancestry):
        self.i += 1  # {
        pairs = []
        node = ("hash", pairs)
        while True:
            self._ws()
            if self.i >= self.n:
                raise JsonParseError(
                    "Reached EOF without all containers being closed")
            if self.buf[self.i] == 0x7D:  # }
                self.i += 1
                break
            k = self._value(())  # keys are scalars; no ancestry
            v = self._value(ancestry + ((node, len(pairs), k),))
            pairs.append((k, v))
        if self.on_hash is not None:
            self.on_hash(node, ancestry)
        return node

    def _array(self, ancestry):
        self.i += 1  # [
        items = []
        node = ("array", items)
        while True:
            self._ws()
            if self.i >= self.n:
                raise JsonParseError(
                    "Reached EOF without all containers being closed")
            if self.buf[self.i] == 0x5D:  # ]
                self.i += 1
                return node
            items.append(self._value(ancestry + ((node, len(items), None),)))

    def _number(self):
        start = self.i
        buf, n = self.buf, self.n
        i = self.i
        decimal = False
        if buf[i] == 0x2D:
            i += 1
        while i < n and 0x30 <= buf[i] <= 0x39:
            i += 1
        if i < n and buf[i] == 0x2E:
            decimal = True
            i += 1
            while i < n and 0x30 <= buf[i] <= 0x39:
                i += 1
        if i < n and buf[i] in b"eE":
            decimal = True
            i += 1
            if i < n and buf[i] in b"+-":
                i += 1
            while i < n and 0x30 <= buf[i] <= 0x39:
                i += 1
        self.i = i
        tok = buf[start:i].decode("ascii")
        num = _atof(tok)
        large_s = 0
        large_u = 0
        # jsonpull.c:608-625: exact integers beyond the float53 range
        if not decimal and num > MAX_SAFE_INTEGER:
            v = int(tok)
            if 0 <= v <= (1 << 64) - 1:
                large_u = v
        if not decimal and num < -MAX_SAFE_INTEGER:
            v = int(tok)
            if -(1 << 63) <= v <= (1 << 63) - 1:
                large_s = v
        return ("num", num, large_s, large_u)

    def _string(self) -> bytes:
        """jsonpull.c:630-760 — escapes decode to raw bytes; lone high
        surrogates flush as 3-byte sequences; \\uFFFF encodes 4-byte
        (the `ch < 0xFFFF` strict test)."""
        self.i += 1  # opening quote
        out = bytearray()
        surrogate = -1

        def _flush():
            nonlocal surrogate
            if surrogate >= 0:
                out.append(0xE0 | (surrogate >> 12))
                out.append(0x80 | ((surrogate >> 6) & 0x3F))
                out.append(0x80 | (surrogate & 0x3F))
                surrogate = -1

        buf, n = self.buf, self.n
        while self.i < n:
            c = buf[self.i]
            self.i += 1
            if c == 0x22:  # closing quote
                _flush()
                return bytes(out)
            if c != 0x5C:  # not backslash
                if c < 0x20:
                    raise JsonParseError(
                        "Found control character in string")
                _flush()  # plain chars flush a pending surrogate too
                out.append(c)
                continue
            if self.i >= n:
                break
            c = buf[self.i]
            self.i += 1
            if c == 0x75:  # u
                hex_ = buf[self.i:self.i + 4]
                if len(hex_) < 4:
                    raise JsonParseError("Invalid \\u hex character")
                try:
                    ch = int(hex_, 16)
                except ValueError:
                    raise JsonParseError("Invalid \\u hex character")
                self.i += 4
                if 0xD800 <= ch <= 0xDBFF:
                    if surrogate < 0:
                        surrogate = ch
                    else:
                        _flush()
                        surrogate = ch
                    continue
                if 0xDC00 <= ch <= 0xDFFF and surrogate >= 0:
                    ch = (((surrogate - 0xD800) << 10)
                          | (ch - 0xDC00)) + 0x10000
                    surrogate = -1
                _flush()
                if ch <= 0x7F:
                    out.append(ch)
                elif ch <= 0x7FF:
                    out.append(0xC0 | (ch >> 6))
                    out.append(0x80 | (ch & 0x3F))
                elif ch < 0xFFFF:  # strict: U+FFFF falls to 4-byte
                    out.append(0xE0 | (ch >> 12))
                    out.append(0x80 | ((ch >> 6) & 0x3F))
                    out.append(0x80 | (ch & 0x3F))
                else:
                    out.append(0xF0 | (ch >> 18))
                    out.append(0x80 | ((ch >> 12) & 0x3F))
                    out.append(0x80 | ((ch >> 6) & 0x3F))
                    out.append(0x80 | (ch & 0x3F))
            else:
                _flush()
                if c == 0x22:
                    out.append(0x22)
                elif c == 0x5C:
                    out.append(0x5C)
                elif c == 0x2F:
                    out.append(0x2F)
                elif c == 0x62:
                    out.append(0x08)
                elif c == 0x66:
                    out.append(0x0C)
                elif c == 0x6E:
                    out.append(0x0A)
                elif c == 0x72:
                    out.append(0x0D)
                elif c == 0x74:
                    out.append(0x09)
                else:
                    raise JsonParseError(
                        f"unknown escape \\{chr(c)}")
        raise JsonParseError("unterminated string")


# ---------------------------------------------------------- stringify


def hash_get(node, key: bytes):
    """json_hash_get: FIRST matching string key (jsonpull.c:1020)."""
    if node is None or node[0] != "hash":
        return None
    for k, v in node[1]:
        if k[0] == "str" and k[1] == key:
            return v
    return None


def json_stringify(node) -> bytes:
    out = bytearray()
    _print(out, node)
    return bytes(out)


def _print(out: bytearray, node):
    t = node[0]
    if t == "hash":
        out.append(0x7B)
        pairs = node[1]
        live = [(k, v) for k, v in pairs if v[0] != "removed"]
        for i, (k, v) in enumerate(live):
            _print(out, k)
            out.append(0x3A)
            _print(out, v)
            if i + 1 < len(live):
                out.append(0x2C)
        out.append(0x7D)
    elif t == "array":
        items = [v for v in node[1] if v[0] != "removed"]
        out.append(0x5B)
        for i, v in enumerate(items):
            _print(out, v)
            if i + 1 < len(items):
                out.append(0x2C)
        out.append(0x5D)
    elif t == "str":
        out.append(0x22)
        for b in node[1]:
            if b in (0x5C, 0x22):
                out.append(0x5C)
                out.append(b)
            elif b < 0x20:
                out += b"\\u%04x" % b
            else:
                out.append(b)
        out.append(0x22)
    elif t == "num":
        _, num, large_s, large_u = node
        if large_s != 0:
            out += b"%d" % large_s
        elif large_u != 0:
            out += b"%d" % large_u
        else:
            out += dtoa_milo(num).encode("ascii")
    elif t == "null":
        out += b"null"
    elif t == "true":
        out += b"true"
    elif t == "false":
        out += b"false"


# --------------------------------------------------------- sort_quote


def decode32(s: bytes):
    """jsontool.cpp:34-106 — UTF-8 decode with the reference's exact
    invalid-sequence resync (back up, emit one U+FFFD per bad lead)."""
    utf32 = []
    i, n = 0, len(s)
    while i < n:
        b = s[i]
        i += 1
        if b < 0x80:
            utf32.append(b)
        elif (b & 0xE0) == 0xC0:
            b1 = s[i] if i < n else 0
            i += 1
            if (b1 & 0xC0) == 0x80:
                utf32.append(((b & 0x1F) << 6) | (b1 & 0x3F))
            else:
                i -= 1
                utf32.append(0xFFFD)
        elif (b & 0xF0) == 0xE0:
            b1 = s[i] if i < n else 0
            i += 1
            if (b1 & 0xC0) == 0x80:
                b2 = s[i] if i < n else 0
                i += 1
                if (b2 & 0xC0) == 0x80:
                    utf32.append(((b & 0x0F) << 12)
                                 | ((b1 & 0x3F) << 6) | (b2 & 0x3F))
                else:
                    i -= 2
                    utf32.append(0xFFFD)
            else:
                i -= 1
                utf32.append(0xFFFD)
        elif (b & 0xF8) == 0xF0:
            b1 = s[i] if i < n else 0
            i += 1
            if (b1 & 0xC0) == 0x80:
                b2 = s[i] if i < n else 0
                i += 1
                if (b2 & 0xC0) == 0x80:
                    b3 = s[i] if i < n else 0
                    i += 1
                    if (b3 & 0xC0) == 0x80:
                        utf32.append(((b & 0x07) << 18)
                                     | ((b1 & 0x3F) << 12)
                                     | ((b2 & 0x3F) << 6) | (b3 & 0x3F))
                    else:
                        i -= 3
                        utf32.append(0xFFFD)
                else:
                    i -= 2
                    utf32.append(0xFFFD)
            else:
                i -= 1
                utf32.append(0xFFFD)
        else:
            utf32.append(0xFFFD)
    return utf32


def sort_quote(s: bytes) -> bytes:
    """jsontool.cpp:111-142 — \\u%04lu is DECIMAL in the reference."""
    out = bytearray()
    for c in decode32(s):
        if c < 0xD800:
            out += b"\\u%04d" % c
        elif c <= 0x7FF:  # unreachable (>= 0xD800) but kept for shape
            out.append(0xC0 | (c >> 6))
            out.append(0x80 | (c & 0x3F))
        elif c <= 0xFFFF:
            out.append(0xE0 | (c >> 12))
            out.append(0x80 | ((c >> 6) & 0x3F))
            out.append(0x80 | (c & 0x3F))
        else:
            out.append(0xF0 | (c >> 18))
            out.append(0x80 | ((c >> 12) & 0x3F))
            out.append(0x80 | ((c >> 6) & 0x3F))
            out.append(0x80 | (c & 0x3F))
    return bytes(out)


# ---------------------------------------------------------------- tool


class JsonTool:
    def __init__(self, wrap=False, extract: str | None = None,
                 csvfile: str | None = None, empty_is_null=False,
                 out_stream=None):
        if extract is not None and wrap:
            raise JsonToolError(
                "--wrap and --extract not supported together")
        self.wrap = wrap
        self.extract = (extract.encode("utf-8")
                        if isinstance(extract, str) else extract)
        self.pe = empty_is_null
        self.out_stream = out_stream or sys.stdout.buffer
        self.buffered = b""
        self.buffered_type = -1
        self.buffer_state = 0
        self.header: list[str] = []
        self.fields: list[str] = []
        self.prev_joinkey = ""
        self._csv = open(csvfile, "rb") if csvfile else None

    # -- csv (jsontool.cpp:209-377) -----------------------------------

    def _csv_getline(self) -> str:
        line = bytearray()
        while True:
            c = self._csv.read(1)
            if not c:
                break
            line += c
            if c == b"\n":
                break
        return bytes(line).decode("latin-1")

    def _join_csv(self, feature):
        if not self.header:
            s = self._csv_getline()
            if not s:
                raise JsonToolError(
                    "Couldn't get column header from CSV file")
            err = check_utf8(s.encode("latin-1"))
            if err:
                raise JsonToolError(err)
            self.header = [csv_dequote(h) for h in csv_split(s)]
            if not self.header:
                raise JsonToolError(f'No columns in CSV header "{s}"')

        properties = hash_get(feature, b"properties")
        key = None
        if properties is not None:
            key = hash_get(properties,
                           self.header[0].encode("latin-1"))
        if key is None:
            return  # warning-once in the reference

        if key[0] == "str":
            joinkey = key[1].decode("latin-1")
        elif key[0] == "num":
            joinkey = dtoa_milo(key[1])
        else:
            joinkey = json_stringify(key).decode("latin-1")

        if joinkey < self.prev_joinkey:
            raise JsonToolError(
                f'GeoJSON file is out of sort: "{joinkey}" follows '
                f'"{self.prev_joinkey}"')
        self.prev_joinkey = joinkey

        if not self.fields or joinkey > self.fields[0]:
            prevkey = self.fields[0] if self.fields else ""
            while True:
                s = self._csv_getline()
                if not s:
                    self.fields = []
                    break
                err = check_utf8(s.encode("latin-1"))
                if err:
                    raise JsonToolError(err)
                self.fields = [csv_dequote(f) for f in csv_split(s)]
                if self.fields and self.fields[0] < prevkey:
                    raise JsonToolError(
                        f'CSV file is out of sort: "{self.fields[0]}" '
                        f'follows "{prevkey}"')
                if self.fields and self.fields[0] >= joinkey:
                    break
                if self.fields:
                    prevkey = self.fields[0]

        if self.fields and joinkey == self.fields[0]:
            for i in range(1, len(self.fields)):
                k = self.header[i]
                v = self.fields[i]
                attr_type = "str"
                if v:
                    if v[0] == '"':
                        v = csv_dequote(v)
                    elif is_number_json(v):
                        attr_type = "num"
                elif self.pe:
                    attr_type = "null"
                if attr_type == "null":
                    continue  # JSON_NULL attrs are never appended
                knode = ("str", k.encode("latin-1"))
                if attr_type == "str":
                    vnode = ("str", v.encode("latin-1"))
                else:
                    vnode = ("num", _atof(v), 0, 0)
                properties[1].append((knode, vnode))

    # -- output (jsontool.cpp:144-205) ---------------------------------

    def _out(self, s: bytes, typ: int, properties):
        w = self.out_stream
        if self.extract is not None:
            extracted = sort_quote(b"null")
            o = hash_get(properties, self.extract)
            if o is not None:
                if o[0] == "str":
                    extracted = sort_quote(o[1])
                elif o[0] == "num":
                    # reference reads value.string.string off a number
                    # here (union pun, UB); we print the number
                    extracted = sort_quote(
                        dtoa_milo(o[1]).encode("ascii"))
                else:
                    extracted = sort_quote(json_stringify(o))
            w.write(b'{"' + extracted + b'":' + s + b"}\n")
            return
        if not self.wrap:
            w.write(s + b"\n")
            return
        if self.buffer_state == 0:
            self.buffered = s
            self.buffered_type = typ
            self.buffer_state = 1
            return
        if self.buffer_state == 1:
            if self.buffered_type == 1:
                w.write(b'{"type":"FeatureCollection","features":[\n')
            else:
                w.write(b'{"type":"GeometryCollection","geometries":[\n')
            w.write(self.buffered + b"\n")
            self.buffer_state = 2
        w.write(b",\n" + s + b"\n")
        if typ != self.buffered_type:
            raise JsonToolError(
                "Error: mix of bare geometries and features")

    def _add_feature(self, feature, is_feature: bool):
        if is_feature:
            if self._csv is not None:
                self._join_csv(feature)
            self._out(json_stringify(feature), 1,
                      hash_get(feature, b"properties"))
        else:
            self._out(json_stringify(feature), 2, None)

    # -- feature walk (geojson-loop.cpp:39-190) ------------------------

    def process(self, data: bytes, fname="standard input"):
        """One input file: fresh found_features/found_geometries
        counters (parse_json locals), shared output/join state.
        A parse error prints to stderr and stops THIS file only,
        keeping the features already emitted (parse_json breaks
        without setting a failure code, geojson-loop.cpp:45-57)."""
        self._ff = 0
        self._fg = 0
        self._detached: list = []
        parser = _Parser(data, on_hash=self._offer)
        try:
            while parser.next_value() is not None:
                pass
        except JsonParseError as e:
            print(f"{fname}: {e}", file=sys.stderr)

    @staticmethod
    def _hash_get_upto(hnode, key: bytes, upto: int, cur_key):
        """Partial-parent lookup: at child completion time the parent
        holds the pairs before the child's, plus the child's own key
        (jsonpull attaches objects to parents at creation)."""
        for k, v in hnode[1][:upto]:
            if k[0] == "str" and k[1] == key:
                return v
        if cur_key is not None and cur_key[0] == "str" \
                and cur_key[1] == key:
            return cur_key
        return None

    def _offer(self, j, ancestry):
        # settle pending detaches first: parents append an emitted
        # child right after its completion callback returns, so by the
        # next completion the slot exists and can be voided
        if self._detached:
            self._apply_detached()
        typ = hash_get(j, b"type")
        if typ is None or typ[0] != "str":
            return
        tname = typ[1]

        if self._ff == 0 and tname in GEOMETRY_NAMES:
            is_geometry = True
            if ancestry:
                parent, idx, _key = ancestry[-1]
                if parent[0] == "array" and len(ancestry) >= 2:
                    gp, gidx, gkey = ancestry[-2]
                    if gp[0] == "hash" and self._hash_get_upto(
                            gp, b"geometries", gidx, gkey) is not None:
                        is_geometry = False  # GeometryCollection
                elif parent[0] == "hash":
                    if self._hash_get_upto(
                            parent, b"geometry", idx,
                            ancestry[-1][2]) is not None:
                        is_geometry = False  # Feature's geometry
            if is_geometry and self._under_properties(ancestry):
                is_geometry = False
            if is_geometry:
                self._fg += 1
                self._add_feature(j, False)
                self._detach(j, ancestry)
                return

        if tname != b"Feature":
            return  # FeatureCollection completion is a no-op here

        self._ff += 1
        geometry = hash_get(j, b"geometry")
        if geometry is None:
            return  # "feature with no geometry" warning upstream
        properties = hash_get(j, b"properties")
        if properties is None or properties[0] not in ("hash", "null"):
            return  # "feature without properties hash"
        if self._under_properties(ancestry):
            return
        self._add_feature(j, True)
        self._detach(j, ancestry)

    @staticmethod
    def _under_properties(ancestry):
        """Any ancestor is the value of a "properties" key
        (geojson-loop.cpp:104-117,160-176)."""
        for parent, _idx, key in ancestry:
            if parent[0] == "hash" and key is not None \
                    and key[0] == "str" and key[1] == b"properties":
                return True
        return False

    def _detach(self, j, ancestry):
        """json_free removes the emitted feature from its parent.  The
        slot is not appended yet at completion time, so record the
        (parent, child) and void the slot to a "removed" marker (which
        _print filters) at the next completion."""
        if not ancestry:
            return
        self._detached.append((ancestry[-1][0], j))

    def _apply_detached(self):
        still = []
        for parent, j in self._detached:
            done = False
            if parent[0] == "hash":
                pairs = parent[1]
                for i in range(len(pairs) - 1, -1, -1):
                    if pairs[i][1] is j:
                        pairs[i] = (pairs[i][0], ("removed",))
                        done = True
                        break
            else:
                items = parent[1]
                for i in range(len(items) - 1, -1, -1):
                    if items[i] is j:
                        items[i] = ("removed",)
                        done = True
                        break
            if not done:
                still.append((parent, j))
        self._detached = still

    def finish(self):
        if self.buffer_state == 1:
            self.out_stream.write(self.buffered + b"\n")
        elif self.buffer_state == 2:
            self.out_stream.write(b"]}\n")
        if self._csv is not None:
            self._csv.close()


def jsontool_main(argv) -> int:
    """`python -m tippecanoe_ray jsontool` — tippecanoe-json-tool."""
    import argparse

    ap = argparse.ArgumentParser(prog="tippecanoe_ray jsontool")
    ap.add_argument("-w", "--wrap", action="store_true")
    ap.add_argument("-e", "--extract", default=None, metavar="KEY")
    ap.add_argument("-c", "--csv", default=None, metavar="FILE")
    ap.add_argument("--empty-csv-columns-are-null", "-pe",
                    action="store_true")
    ap.add_argument("files", nargs="*")
    args = ap.parse_args(argv)

    tool = JsonTool(wrap=args.wrap, extract=args.extract,
                    csvfile=args.csv,
                    empty_is_null=args.empty_csv_columns_are_null)
    try:
        if not args.files:
            tool.process(sys.stdin.buffer.read(), "standard input")
        else:
            for fname in args.files:
                with open(fname, "rb") as f:
                    tool.process(f.read(), fname)
        tool.finish()
    except JsonToolError as e:
        print(str(e), file=sys.stderr)
        return 1
    return 0
