"""SmallFloat micro-oracle (SURVEY.md §5.2.1) — hand-derived properties."""

import numpy as np

from sparklucene.norms import (LENGTH_TABLE, byte4_to_int, int_to_byte4,
                               quantize_length, quantize_length_sql)


def _py_encode(i: int) -> int:
    if i < 8:
        return i
    bl = i.bit_length()
    shift = bl - 4
    return ((shift + 1) << 3) | ((i >> shift) & 7)


def test_small_values_identity():
    v = np.arange(0, 8)
    assert (int_to_byte4(v) == v).all()
    assert (quantize_length(v) == v).all()


def test_hand_derived_cases():
    # 9 = 0b1001 -> bitlen 4, shift 0 -> byte (1<<3)|1 = 9 -> decode 9
    # 100 = 0b1100100 -> bitlen 7, shift 3 -> mant 1100=12 -> byte (4<<3)|4=36
    #   decode: (4|8)<<3 = 96
    assert int_to_byte4(np.array([9]))[0] == 9
    assert quantize_length(np.array([9]))[0] == 9
    assert int_to_byte4(np.array([100]))[0] == 36
    assert quantize_length(np.array([100]))[0] == 96


def test_roundtrip_properties_exhaustive():
    v = np.arange(0, 300_000, dtype=np.int64)
    q = quantize_length(v)
    assert (q <= v).all()                      # lossy floor
    assert (np.diff(q) >= 0).all()             # monotone
    # keeps top 4 bits exactly
    ref = np.array([x if x < 8 else (x >> (x.bit_length() - 4)) << (x.bit_length() - 4)
                    for x in v.tolist()])
    assert (q == ref).all()
    # re-encoding a quantized value is stable
    assert (quantize_length(q) == q).all()
    # matches scalar reference encoder
    some = v[np.random.default_rng(7).integers(0, v.size, 500)]
    assert (int_to_byte4(some) == np.array([_py_encode(int(x)) for x in some])).all()


def test_length_table_monotone():
    assert (np.diff(LENGTH_TABLE) >= 0).all()
    assert LENGTH_TABLE[0] == 0
    assert byte4_to_int(np.array([255], dtype=np.uint8))[0] == LENGTH_TABLE[255]


def test_sql_expression_matches_duckdb():
    import duckdb

    expr = quantize_length_sql("x")
    vals = list(range(0, 5000)) + [2 ** k + d for k in range(4, 31) for d in (-1, 0, 1)]
    con = duckdb.connect()
    con.execute("create table t(x bigint)")
    con.executemany("insert into t values (?)", [(v,) for v in vals])
    got = np.array([r[0] for r in con.execute(
        f"select {expr} from t order by rowid").fetchall()])
    want = quantize_length(np.array(vals, dtype=np.int64))
    assert (got == want).all()
