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


# --- QuantileSketch (MRL/KLL compactor ladder) ---

from destor_ray.functions.sketch import QuantileSketch

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _exact_lower_quantiles(vals, qs):
    """Ground truth under the sketch's own definition: smallest item
    whose cumulative weight reaches ceil(q*n)."""
    v = np.sort(np.asarray(vals, dtype=np.float64))
    return np.array([v[max(1, int(np.ceil(q * len(v)))) - 1] for q in qs])


def test_quantile_exact_below_k():
    rng = np.random.default_rng(0)
    vals = rng.normal(size=200)
    s = QuantileSketch(k=256)
    s.add(vals)
    # never compacted: lower quantiles are exact
    np.testing.assert_array_equal(s.quantiles(QS),
                                  _exact_lower_quantiles(vals, QS))
    assert s.n_items() == 200


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "zipf_heavy"])
def test_quantile_rank_error_bound(dist):
    rng = np.random.default_rng(17)
    n = 300_000
    if dist == "uniform":
        vals = rng.uniform(0, 1e6, size=n)
    elif dist == "lognormal":
        vals = rng.lognormal(3, 2, size=n)
    else:  # heavy-tailed discrete (skewed duplicates)
        vals = rng.zipf(1.3, size=n).astype(np.float64)
    s = QuantileSketch(k=256)
    for chunk in np.array_split(vals, 37):
        s.add(chunk)
    assert s.n_items() == n  # weight preserved through compaction
    got = s.quantiles(QS)
    srt = np.sort(vals)
    for q, g in zip(QS, got):
        # verify by RANK error (value error is unbounded for skewed data);
        # a tied value occupies a rank INTERVAL [lo, hi) — correct iff q
        # falls within 2% of that interval
        lo = np.searchsorted(srt, g, side="left") / n
        hi = np.searchsorted(srt, g, side="right") / n
        assert lo - 0.02 < q < hi + 0.02, (dist, q, lo, hi)


def test_quantile_merge_matches_and_roundtrips():
    rng = np.random.default_rng(5)
    vals = rng.exponential(10, size=120_000)
    merged = QuantileSketch(k=128)
    for chunk in np.array_split(vals, 9):
        part = QuantileSketch(k=128)
        part.add(chunk)
        # serialize/deserialize each partial as the pipeline does
        merged.merge(QuantileSketch.from_bytes(part.to_bytes()))
    assert merged.n_items() == len(vals)
    srt = np.sort(vals)
    for q, g in zip(QS, merged.quantiles(QS)):
        rank = np.searchsorted(srt, g, side="right") / len(vals)
        assert abs(rank - q) < 0.03, (q, rank)
    # byte round-trip of the merged sketch is lossless
    back = QuantileSketch.from_bytes(merged.to_bytes())
    np.testing.assert_array_equal(back.quantiles(QS), merged.quantiles(QS))
    assert back.n_items() == merged.n_items()


def test_quantile_deterministic():
    rng = np.random.default_rng(9)
    vals = rng.normal(size=50_000)
    a, b = QuantileSketch(k=64), QuantileSketch(k=64)
    for chunk in np.array_split(vals, 11):
        a.add(chunk)
        b.add(chunk)
    assert a.to_bytes() == b.to_bytes()  # no RNG anywhere


def test_quantile_nan_and_empty():
    s = QuantileSketch(k=8)
    s.add(np.array([np.nan, np.nan]))
    assert s.n_items() == 0
    assert np.all(np.isnan(s.quantiles([0.5])))
    s.add(np.array([1.0, np.nan, 3.0]))
    assert s.n_items() == 2
    np.testing.assert_array_equal(s.quantiles([0.5, 1.0]), [1.0, 3.0])


def test_mg_compress_exact_when_under_capacity():
    from destor_ray.functions.sketch import mg_compress
    toks = np.array(["a", "b", "c"])
    cnts = np.array([5, 3, 1], np.int64)
    t, c, d = mg_compress(toks, cnts, 8)
    assert d == 0
    np.testing.assert_array_equal(t, toks)
    np.testing.assert_array_equal(c, cnts)


def test_mg_merge_error_bound():
    """Merged MG partials: true - Σdeltas <= est <= true, and every
    token with true count > Σdeltas survives (heavy hitters are never
    lost)."""
    from destor_ray.functions.sketch import mg_compress
    rng = np.random.RandomState(7)
    vocab = np.array([f"t{i:03d}" for i in range(120)])
    # zipf-ish stream split into 10 batches
    stream = vocab[np.minimum(rng.zipf(1.3, 20000) - 1, 119)]
    true = {t: int(n) for t, n in zip(*np.unique(stream, return_counts=True))}
    est: dict[str, int] = {}
    deltas = 0
    for chunk in np.array_split(stream, 10):
        u, c = np.unique(chunk, return_counts=True)
        u, c, d = mg_compress(u, c.astype(np.int64), 16)  # < 120 vocab
        deltas += d
        for t, n in zip(u, c):
            est[t] = est.get(t, 0) + int(n)
    assert deltas > 0  # sketch regime actually exercised
    for t, n in true.items():
        e = est.get(t, 0)
        assert e <= n
        assert e >= n - deltas
        if n > deltas:
            assert t in est


def test_heavy_hitter_tokens_sketch_regime_matches_exact_topk(ray_session):
    """With capacity >= per-batch distinct the query is exact (oracle
    pins that); with tiny capacity the top-1 heavy hitter must still
    surface with est within max_err of truth."""
    import duckdb

    import __ray_entry__ as em
    sf = "/root/testdata/sf0.001"
    out = em.queries()["heavy_hitter_tokens"](sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exact = con.sql(em.oracle_sql()["heavy_hitter_tokens"]).df()
    assert (out["max_err"] == 0).all()
    assert list(out["token"]) == list(exact["token"])

    from destor_ray.pipelines.stats import heavy_hitter_tokens
    sk = heavy_hitter_tokens(sf, k=5, capacity=4)  # vocab 31 > 4
    truth = {t: n for t, n in zip(exact["token"], exact["est_count"])}
    err = int(sk["max_err"].iloc[0])
    assert err > 0  # sketch regime exercised
    # MG guarantee: every estimate is in [true - err, true]; ordering
    # is only preserved for gaps > err, so assert the bound, not rank
    for _, r in sk.iterrows():
        if r["token"] in truth:
            assert r["est_count"] <= truth[r["token"]]
            assert r["est_count"] >= truth[r["token"]] - err


def test_count_min_sketch_bounds_and_merge():
    """One-sided error (est >= true, exact when no collision), merge ==
    single-shot build, and the exact regime: width >> distinct keys
    means every estimate is exact on a small vocabulary."""
    import numpy as np
    from destor_ray.functions.sketch import CountMinSketch

    keys = [f"k{i:03d}" for i in range(200)]
    counts = np.arange(1, 201, dtype=np.int64)
    a = CountMinSketch(width=4096, depth=4)
    a.add(keys[:100], counts[:100])
    b = CountMinSketch(width=4096, depth=4)
    b.add(keys[100:], counts[100:])
    a.merge(b)
    full = CountMinSketch(width=4096, depth=4)
    full.add(keys, counts)
    assert (a.table == full.table).all()
    est = a.estimate(keys)
    assert (est >= counts).all()
    # 200 keys into 4096*4 counters: collisions possible in one row but
    # the min over 4 independent rows is exact with overwhelming
    # probability — and deterministically so for this fixed key set
    assert (est == counts).all()
    # a key never inserted estimates >= 0 and is bounded by eps*N
    ghost = a.estimate(["never-seen"])
    assert ghost[0] >= 0
    # serialization round trip
    c = CountMinSketch.from_bytes(a.to_bytes(), 4096, 4)
    assert (c.estimate(keys) == est).all()


def test_cms_token_counts_query(ray_session):
    import __ray_entry__ as em
    out = em.queries()["cms_token_counts"]("/root/testdata/sf0.001")
    assert (out["overestimate"] >= 0).all()
    # 31-token vocabulary vs 2048x4 counters: exact regime
    assert (out["cms_est"] == out["true_count"]).all()


def test_events_type_hll_users_accuracy(ray_session):
    """Grouped HLL distinct-user estimates stay within the sketch's
    theoretical band of the exact per-group counts (rel err
    ~1.04/sqrt(2^12) ≈ 1.6%; assert a loose 6% with small-group
    slack)."""
    import __ray_entry__ as em
    out = em.queries()["events_type_hll_users"](
        "/root/testdata/sf0.01").to_pandas()
    assert len(out) >= 3
    for _, r in out.iterrows():
        exact = int(r["exact_users"])
        est = int(r["hll_users"])
        assert exact > 0
        assert abs(est - exact) <= max(2, 0.06 * exact), \
            (r["event_type"], est, exact)
