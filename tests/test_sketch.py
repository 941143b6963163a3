"""HyperLogLog sketch: exact bit-length kernel, merge semantics, error
bound vs known cardinalities, and the distinct_token_stats query vs the
DuckDB exact distinct count."""

import duckdb
import numpy as np
import pytest

from destor_ray.functions.sketch import HyperLogLog, bit_length_u64

SF = "/root/testdata/sf0.001"


def test_bit_length_exact():
    rng = np.random.default_rng(7)
    xs = np.concatenate([
        np.array([0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 52, (1 << 52) + 1,
                  (1 << 63), np.iinfo(np.uint64).max], dtype=np.uint64),
        rng.integers(0, 1 << 63, size=2000, dtype=np.uint64),
    ])
    got = bit_length_u64(xs)
    want = np.array([int(x).bit_length() for x in xs], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_estimate_error_bound(n):
    rng = np.random.default_rng(42)
    keys = rng.integers(0, np.iinfo(np.uint64).max, size=n, dtype=np.uint64)
    keys = np.unique(keys)  # true cardinality
    h = HyperLogLog(p=14)
    h.add_hashes(keys)
    est = h.estimate()
    # 1.04/sqrt(2^14) ~ 0.8% std error; allow 4 sigma
    assert abs(est - len(keys)) / len(keys) < 0.033


def test_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, np.iinfo(np.uint64).max, size=50_000, dtype=np.uint64)
    whole = HyperLogLog(p=12)
    whole.add_hashes(keys)
    parts = HyperLogLog(p=12)
    for chunk in np.array_split(keys, 7):
        h = HyperLogLog(p=12)
        h.add_hashes(chunk)
        parts.merge(HyperLogLog.from_bytes(h.to_bytes()))
    np.testing.assert_array_equal(whole.registers, parts.registers)


def test_distinct_token_stats_query(ray_session):
    import __ray_entry__ as em
    out = em.queries()["distinct_token_stats"](SF)
    con = duckdb.connect()
    exact = con.sql(f"""
        SELECT count(DISTINCT tok) AS d, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM read_parquet('{SF}/documents.parquet'))
    """).fetchone()
    assert int(out["n_tokens"][0]) == exact[1]
    rel = abs(int(out["hll_distinct_tokens"][0]) - exact[0]) / exact[0]
    assert rel < 0.05
