import sys

sys.path.insert(0, "/root/repo")


def test_entry_contract(ray_session):
    import __ray_entry__ as em
    out = em.entry()
    import pandas as pd
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(df) >= 0
    assert set(df.columns) == {"image_id", "cluster_id"}


def test_every_oracle_key_has_query():
    import __ray_entry__ as em
    qs = em.queries()
    for k in em.oracle_sql():
        assert k in qs, k
