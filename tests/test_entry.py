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


def test_corpus_gate_sweep_curve(ray_session):
    """the verify-gate operating curve: pair volume is monotone
    non-increasing in the gate, recall is 1.0 with zero distractor and
    zero false-merge pairs at the production 25 dB row (the measured
    justification for the default), and the loose 18 dB end admits the
    planted near-miss distractors the default rejects."""
    import __ray_entry__ as em
    t = em.queries()["corpus_gate_sweep"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("gate_centi_db")
    assert list(t["n_pairs"]) == sorted(t["n_pairs"], reverse=True)
    prod = t.loc[2500]
    assert prod["recall_ppm"] == 1_000_000
    assert prod["n_distractor_pairs"] == 0
    assert prod["n_other_pairs"] == 0
    assert t.loc[1800, "n_distractor_pairs"] > 0
