"""Lossy doc-length (norm) quantization — Lucene SmallFloat semantics.

Reimplements, from public knowledge of Apache Lucene 8.x
(``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java``), the
4-bit-mantissa lossy integer encoding Lucene uses for per-document field
lengths ("norms"):

  - ``intToByte4`` maps a token count (field length) to one byte.
  - ``byte4ToInt`` decodes it back; BM25 consumes the *decoded quantized*
    length, never the true length (SURVEY.md §4.3.1).

Encoding: values 0..7 are stored verbatim ("subnormal"); larger values keep
their top 4 significant bits: ``encoded = ((bitlen-3) << 3) | ((i >> (bitlen-4)) & 7)``.
Decoding byte b: ``bits=b&7; shift=(b>>3)-1; value = bits if shift<0 else (bits|8)<<shift``.

Everything is vectorized numpy; a 256-entry LENGTH_TABLE is precomputed so
scoring is a table lookup, mirroring Lucene's per-scorer 256-float cache.
"""

from __future__ import annotations

import numpy as np


def _int4_to_long(b: int) -> int:
    bits = b & 0x07
    shift = (b >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


#: LENGTH_TABLE[b] = decoded quantized length for norm byte b (0..255).
LENGTH_TABLE: np.ndarray = np.array([_int4_to_long(b) for b in range(256)], dtype=np.int64)

#: float32 view used by the BM25 per-norm cache (Lucene keeps float[]).
LENGTH_TABLE_F32: np.ndarray = LENGTH_TABLE.astype(np.float32)


def int_to_byte4(values: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.intToByte4 over an int array (>=0).

    Returns uint8 norm bytes. Quantization keeps the top 4 significant
    bits of the length.
    """
    v = np.asarray(values, dtype=np.int64)
    if v.size and v.min() < 0:
        raise ValueError("lengths must be non-negative")
    if v.size and v.max() >= (1 << 31):
        # Lucene's intToByte4 takes a Java int; larger lengths cannot occur
        # (a single doc with >2^31 tokens) and would overflow the byte.
        raise ValueError("lengths must fit in int32 (Lucene intToByte4 domain)")
    out = np.empty(v.shape, dtype=np.uint8)
    small = v < 8
    out[small] = v[small].astype(np.uint8)
    big = ~small
    if big.any():
        vb = v[big]
        # bit_length via log2 on int64 is unsafe at boundaries; use frexp-free route:
        # np.int64 -> bit length using np.floor(np.log2) is exact only for < 2^52;
        # instead compute with bit tricks on uint64.
        bl = np.zeros(vb.shape, dtype=np.int64)
        tmp = vb.copy()
        for sh in (32, 16, 8, 4, 2, 1):
            mask = tmp >= (1 << sh)
            bl[mask] += sh
            tmp[mask] >>= sh
        bl += 1  # bit_length
        shift = bl - 4
        mant = (vb >> shift) & 0x07
        out[big] = (((shift + 1) << 3) | mant).astype(np.uint8)
    return out


def byte4_to_int(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte4ToInt: norm byte -> quantized length."""
    b = np.asarray(norm_bytes, dtype=np.uint8)
    return LENGTH_TABLE[b]


def quantize_length(values: np.ndarray) -> np.ndarray:
    """Round-trip quantization (what BM25 sees as the doc length)."""
    return byte4_to_int(int_to_byte4(values))


def quantize_length_sql(col: str) -> str:
    """ANSI/DuckDB SQL expression computing quantize_length(col).

    Keeps the top 4 significant bits: for x >= 8,
    ``(x >> s) << s`` with ``s = bit_length(x) - 4``. Used by the driver
    oracle so Spark and DuckDB see identical quantized lengths.
    """
    # DuckDB: bit_length() is for strings; emulate with floor(log2()).
    # Exact for x < 2^47 because log2 of an int is computed on an exactly
    # represented double and floor(log2(x)) only errs when log2(x) is within
    # 1ulp of an integer, i.e. x within rounding of 2^k; log2(2^k) is exact
    # in IEEE double, and for non-powers the gap is >= 2^-47 at our scales.
    s = f"(cast(floor(log2({col})) as bigint) - 3)"
    return f"(case when {col} < 8 then {col} else (({col} >> {s}) << {s}) end)"
