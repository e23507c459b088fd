"""Lossy 1-byte field-length quantization, bit-compatible with Whoosh.

Whoosh stores each document's per-field token count as a single byte on a
logarithmic scale and scores BM25 against the *dequantized* value, so we
must reproduce the exact rounding or scores diverge
(reference behavior: /root/reference/src/whoosh/util/numeric.py:289-317,
codified by tests/test_quality.py:10-24).

The 256-entry table is regenerated here from the documented generating
formula ``round((1.033**n - 1) * 27)`` (numeric.py:251-270 comments); we
verified it reproduces the reference table exactly. ``length_to_byte`` is
``bisect_left`` into the table (rounds down), clamped to 255 at >=106374.
"""

from __future__ import annotations

import math

import numpy as np


def _py2_round(x: float) -> int:
    # round-half-away-from-zero (the rounding used to generate the table)
    f = math.floor(x)
    return int(f if x - f < 0.5 else f + 1)


#: byte -> representative length
BYTE_TO_LENGTH = np.array(
    [_py2_round((math.pow(1.033, n) - 1) * 27) for n in range(256)], dtype=np.int64
)

_MAX_LEN = int(BYTE_TO_LENGTH[-1])  # 106374


def length_to_byte(length: int | None) -> int:
    if length is None:
        return 0
    if length >= _MAX_LEN:
        return 255
    return int(np.searchsorted(BYTE_TO_LENGTH, length, side="left"))


def byte_to_length(b: int) -> int:
    return int(BYTE_TO_LENGTH[b])


def length_to_byte_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized length -> byte for a whole Arrow batch."""
    out = np.searchsorted(BYTE_TO_LENGTH, lengths, side="left")
    return np.where(lengths >= _MAX_LEN, 255, out).astype(np.uint8)


def byte_to_length_np(bs: np.ndarray) -> np.ndarray:
    return BYTE_TO_LENGTH[bs.astype(np.int64)]


def quantize_length(length: int) -> int:
    """byte_to_length(length_to_byte(n)) — the value BM25 actually sees."""
    return byte_to_length(length_to_byte(length))


def sql_quantize_cases() -> str:
    """A DuckDB/ANSI-SQL scalar expression template for quantize_length.

    Returns a SQL snippet ``(SELECT max(q) FROM lenq WHERE lo <= {col})``-free
    inline VALUES table definition usable as
    ``JOIN lenq ON col BETWEEN lenq.lo AND lenq.hi`` — see callers in
    __spark_entry__.py. Emits the 256 (lo, hi, q) rows.
    """
    rows = []
    for b in range(256):
        lo = 0 if b == 0 else int(BYTE_TO_LENGTH[b - 1]) + 1
        hi = int(BYTE_TO_LENGTH[b]) if b < 255 else 2147483647
        q = int(BYTE_TO_LENGTH[b])
        rows.append(f"({lo},{hi},{q})")
    return ",".join(rows)
