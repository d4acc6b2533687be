"""Vectorized hashing kernels.

FNV-1a 64-bit matches the reference's attribute-pool hash family
(/root/reference/pool.cpp:25, mvt.hpp:180-210); here it is the
deterministic geotagging hash of FIXTURES.md §1 and the basis of
document fingerprints / minhash permutations.

All kernels operate on numpy arrays and are loop-free over rows where
the input width allows (variable-length strings are grouped by length so
the inner loop is over *byte positions*, vectorized over rows — O(max_len)
numpy passes regardless of row count).
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)
U64 = np.uint64
_M64 = (1 << 64) - 1


def fnv1a64(data: bytes | str) -> int:
    """Scalar FNV-1a 64 of bytes/str (reference: pool.cpp:25 fnv1a)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 14695981039346656037
    for b in data:
        h = ((h ^ b) * 1099511628211) & _M64
    return h


def _fnv1a64_matrix(mat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """FNV-1a over rows of a (n, L) uint8 matrix with per-row lengths.

    Vectorized over rows; iterates byte positions (L small). Positions
    beyond a row's length leave its hash untouched.
    """
    n, width = mat.shape
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):
            active = lengths > j
            col = mat[:, j].astype(np.uint64)
            nh = (h ^ col) * FNV_PRIME
            h = np.where(active, nh, h)
    return h


def fnv1a64_strings(arr) -> np.ndarray:
    """Vectorized FNV-1a 64 over an array of strings (utf-8 bytes).

    Accepts a numpy object array, list of str, or pyarrow StringArray.
    """
    strs = np.asarray(arr, dtype=object)
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    enc = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strs]
    lengths = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    width = int(lengths.max()) if n else 0
    mat = np.zeros((n, width), dtype=np.uint8)
    # Single pass to fill the matrix; joining then reshaping avoids
    # a per-row numpy call when all rows share one width.
    if width > 0 and bool((lengths == width).all()):
        mat = np.frombuffer(b"".join(enc), dtype=np.uint8).reshape(n, width)
    else:
        for i, b in enumerate(enc):
            if b:
                mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return _fnv1a64_matrix(mat, lengths)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — cheap high-quality mixing of
    integer keys (public-domain constant set; used for salting and
    minhash permutations)."""
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z + U64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
        z = z ^ (z >> U64(31))
    return z


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR bit tricks) — replaces per-row
    Python bin(x).count('1') loops in Hamming-distance verifies."""
    v = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        v = v - ((v >> U64(1)) & U64(0x5555555555555555))
        v = (v & U64(0x3333333333333333)) + ((v >> U64(2)) & U64(0x3333333333333333))
        v = (v + (v >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
        v = (v * U64(0x0101010101010101)) >> U64(56)
    return v.astype(np.int64)
