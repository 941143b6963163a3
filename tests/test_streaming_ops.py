

def test_hll_md5_estimate_accuracy(ray_session):
    """The oracle-verified md5 HLL's estimates stay within the
    1.04/sqrt(2^p) error band of the exact per-type distinct counts
    (p=12 -> ~1.6%; generous 6% bound for the small-population linear-
    counting regime)."""
    import duckdb

    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    out = em.queries()["events_type_hll_users_md5"](sf)
    exact = duckdb.connect().execute(
        f"SELECT event_type, count(DISTINCT user_id) AS u "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1").df()
    ex = dict(zip(exact["event_type"], exact["u"]))
    for r in out.itertuples():
        e = ex[r.event_type]
        assert abs(r.hll_users - e) <= max(2, 0.06 * e), \
            (r.event_type, r.hll_users, e)
