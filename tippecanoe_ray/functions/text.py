"""Text/number scalar parity helpers.

- dtoa_milo: shortest-ish double→string formatting with the exact
  Grisu2 digit generation + prettify rules the reference uses for
  every double attribute it stringifies (milo/dtoa_milo.h, used from
  attribute.cpp, geobuf.cpp:60, flatgeobuf.cpp:227-233). Ported from
  the published Grisu2 algorithm (Loitsch, PLDI'10) with milo's
  parameters; the cached power-of-ten table is recomputed exactly with
  integer arithmetic instead of being transcribed.
- read_unidecode / unidecode_smash: the --unidecode-data machinery
  (text.cpp:191-257). NOTE: in the reference at this version the
  evaluator threads unidecode_data through but never applies the
  smash (no call sites) — the functions exist for CLI/API parity.
"""

from __future__ import annotations

import math
import struct

_PACK = struct.Struct("<d")
_UNPACK = struct.Struct("<Q")

_DP_SIGNIFICAND_SIZE = 52
_DP_EXPONENT_BIAS = 0x3FF + _DP_SIGNIFICAND_SIZE
_DP_MIN_EXPONENT = -_DP_EXPONENT_BIAS
_DP_EXPONENT_MASK = 0x7FF0000000000000
_DP_SIGNIFICAND_MASK = 0x000FFFFFFFFFFFFF
_DP_HIDDEN_BIT = 0x0010000000000000
_M64 = (1 << 64) - 1


def _diy_from_double(d: float) -> tuple[int, int]:
    u = _UNPACK.unpack(_PACK.pack(d))[0]
    biased_e = (u & _DP_EXPONENT_MASK) >> _DP_SIGNIFICAND_SIZE
    significand = u & _DP_SIGNIFICAND_MASK
    if biased_e != 0:
        return significand + _DP_HIDDEN_BIT, biased_e - _DP_EXPONENT_BIAS
    return significand, _DP_MIN_EXPONENT + 1


def _diy_mul(f1: int, e1: int, f2: int, e2: int) -> tuple[int, int]:
    # 128-bit product, keep high 64 with round-half-up on the low half
    p = f1 * f2
    h = p >> 64
    if (p >> 63) & 1:
        h += 1
    return h & _M64, e1 + e2 + 64


def _normalize(f: int, e: int) -> tuple[int, int]:
    s = 64 - f.bit_length()
    return (f << s) & _M64, e - s


def _normalize_boundary(f: int, e: int) -> tuple[int, int]:
    while not (f & (_DP_HIDDEN_BIT << 1)):
        f <<= 1
        e -= 1
    shift = 64 - _DP_SIGNIFICAND_SIZE - 2
    return (f << shift) & _M64, e - shift


def _normalized_boundaries(f: int, e: int) -> tuple[tuple[int, int], tuple[int, int]]:
    pl = _normalize_boundary((f << 1) + 1, e - 1)
    if f == _DP_HIDDEN_BIT:
        mi_f, mi_e = (f << 2) - 1, e - 2
    else:
        mi_f, mi_e = (f << 1) - 1, e - 1
    mi_f = (mi_f << (mi_e - pl[1])) & _M64
    return (mi_f, pl[1]), pl


def _compute_cached_power(dk: int) -> tuple[int, int]:
    """Normalized 64-bit significand + binary exponent of 10^dk,
    rounded half-up — reproduces the reference table exactly (verified
    entry-by-entry in tests)."""
    if dk >= 0:
        n = 10 ** dk
        b = n.bit_length()
        e = b - 64
        if e <= 0:
            f = n << -e
        else:
            f = (n + (1 << (e - 1))) >> e
            if f >> 64:
                f >>= 1
                e += 1
        return f & _M64, e
    d = 10 ** (-dk)
    t = d.bit_length()
    e = -(t + 63)
    f = ((1 << (t + 63)) + d // 2) // d
    if f >> 63 == 0:  # quotient fell below 2^63
        f = ((1 << (t + 64)) + d // 2) // d
        e -= 1
    if f >> 64:
        f >>= 1
        e += 1
    return f & _M64, e


_CACHED: dict[int, tuple[int, int]] = {}


def _get_cached_power(e: int) -> tuple[int, int, int]:
    # milo GetCachedPower: dk = (-61 - e) * log10(2) + 347, ceil
    dk = (-61 - e) * 0.30102999566398114 + 347
    k = int(dk)
    if k != dk:
        k += 1
    index = (k >> 3) + 1
    K = -(-348 + (index << 3))
    dec = -348 + index * 8
    if dec not in _CACHED:
        _CACHED[dec] = _compute_cached_power(dec)
    f, ce = _CACHED[dec]
    return f, ce, K


_POW10 = (1, 10, 100, 1000, 10000, 100000, 1000000, 10000000, 100000000, 1000000000)


def _grisu_round(buf: list, delta: int, rest: int, ten_kappa: int, wp_w: int):
    while (rest < wp_w and delta - rest >= ten_kappa
           and (rest + ten_kappa < wp_w or wp_w - rest > rest + ten_kappa - wp_w)):
        buf[-1] = chr(ord(buf[-1]) - 1)
        rest += ten_kappa


def _digit_gen(w: tuple[int, int], mp: tuple[int, int], delta: int) -> tuple[str, int]:
    one_f = 1 << -mp[1]
    wp_w = (mp[0] - w[0]) & _M64
    p1 = mp[0] >> -mp[1]
    p2 = mp[0] & (one_f - 1)
    kappa = len(str(p1)) if p1 else 1
    buf: list = []
    K = 0
    while kappa > 0:
        div = _POW10[kappa - 1]
        d = p1 // div
        p1 %= div
        if d or buf:
            buf.append(chr(ord("0") + d))
        kappa -= 1
        tmp = (p1 << -mp[1]) + p2
        if tmp <= delta:
            K += kappa
            _grisu_round(buf, delta, tmp, _POW10[kappa] << -mp[1], wp_w)
            return "".join(buf), K
    while True:
        p2 *= 10
        delta *= 10
        d = p2 >> -mp[1]
        if d or buf:
            buf.append(chr(ord("0") + d))
        p2 &= one_f - 1
        kappa -= 1
        if p2 < delta:
            K += kappa
            idx = -kappa
            _grisu_round(buf, delta, p2, one_f,
                         wp_w * (_POW10[idx] if idx < 9 else 0))
            return "".join(buf), K


def _grisu2(value: float) -> tuple[str, int]:
    f, e = _diy_from_double(value)
    (wm_f, wm_e), (wp_f, wp_e) = _normalized_boundaries(f, e)
    c_f, c_e, K = _get_cached_power(wp_e)
    nf, ne = _normalize(f, e)
    w = _diy_mul(nf, ne, c_f, c_e)
    wp = _diy_mul(wp_f, wp_e, c_f, c_e)
    wm = _diy_mul(wm_f, wm_e, c_f, c_e)
    wm_f2 = wm[0] + 1
    wp_f2 = wp[0] - 1
    digits, dK = _digit_gen(w, (wp_f2, wp[1]), wp_f2 - wm_f2)
    return digits, K + dK


def _write_exponent(k: int) -> str:
    # milo WriteExponent (always signed)
    return ("-" if k < 0 else "+") + str(abs(k))


def dtoa_milo(value: float) -> str:
    """milo::dtoa_milo (dtoa_milo.h:381-413): Grisu2 digits + prettify.
    Integer-valued doubles print without a decimal point; |exponent|
    outside [1e-6, 1e21) switches to e-notation with a signed
    exponent."""
    if math.isnan(value):
        return "nan"
    if math.isinf(value):
        return "-inf" if value < 0 else "inf"
    if value == 0:
        return "0"
    minus = value < 0
    if minus:
        value = -value
    digits, k = _grisu2(value)
    # Prettify (dtoa_milo.h:348-379)
    length = len(digits)
    kk = length + k
    if length <= kk <= 21:
        out = digits + "0" * (kk - length)
    elif 0 < kk <= 21:
        out = digits[:kk] + "." + digits[kk:]
    elif -6 < kk <= 0:
        out = "0." + "0" * (-kk) + digits
    elif length == 1:
        out = digits + "e" + _write_exponent(kk - 1)
    else:
        out = digits[0] + "." + digits[1:] + "e" + _write_exponent(kk - 1)
    return ("-" + out) if minus else out


# --------------------------------------------------------- unidecode


def read_unidecode(path: str) -> list[str]:
    """text.cpp:191-229 — NUL-separated replacement table
    (text-unidecode data format), 1-indexed with two empty prefix
    entries; ASCII bytes lowercased."""
    with open(path, "rb") as f:
        data = f.read()
    out = ["", ""]
    cur: list = []
    for b in data:
        if b == 0:
            out.append("".join(cur))
            cur = []
        else:
            if b <= 0x7E:
                cur.append(chr(b).lower())
            else:
                cur.append(chr(b))
    out.append("".join(cur))
    # the C++ version appends bytes to out.back() and starts a new
    # entry per NUL — a trailing NUL thus leaves a final empty entry,
    # which the loop above reproduces
    return out


def unidecode_smash(unidecode_data: list[str], s: str) -> str:
    """text.cpp:231-257 — map each codepoint through the table;
    out-of-range codepoints pass through literally."""
    if not unidecode_data:
        return s
    out = []
    for ch in s:
        c = ord(ch)
        if 0 <= c < len(unidecode_data):
            out.append(unidecode_data[c])
        else:
            out.append(ch)
    return "".join(out)


def check_utf8(b: bytes | str) -> str:
    """text.cpp:16-60 — structural UTF-8 validation over bytes; returns
    an error string ('"…" is not valid UTF-8 (0xXX …)') or '' when
    valid. Python str input is already-decoded and therefore valid."""
    if isinstance(b, str):
        try:
            b = b.encode("utf-8")
        except UnicodeEncodeError:
            return f'"{b!r}" is not valid UTF-8 (unencodable)'
    i = 0
    n = len(b)
    while i < n:
        fail = 0
        c = b[i]
        if c & 0x80:
            if (c & 0xE0) == 0xC0:
                if i + 1 >= n or (b[i + 1] & 0xC0) != 0x80:
                    fail = 2
                else:
                    i += 1
            elif (c & 0xF0) == 0xE0:
                if i + 2 >= n or (b[i + 1] & 0xC0) != 0x80 or (b[i + 2] & 0xC0) != 0x80:
                    fail = 3
                else:
                    i += 2
            elif (c & 0xF8) == 0xF0:
                if (i + 3 >= n or (b[i + 1] & 0xC0) != 0x80
                        or (b[i + 2] & 0xC0) != 0x80 or (b[i + 3] & 0xC0) != 0x80):
                    fail = 4
                else:
                    i += 3
            else:
                fail = 1
        if fail:
            shown = " ".join(
                "0x%02X" % b[i + j] for j in range(fail) if i + j < n
            )
            try:
                txt = b.decode("utf-8", "replace")
            except Exception:
                txt = repr(b)
            return f'"{txt}" is not valid UTF-8 ({shown})'
        i += 1
    return ""
