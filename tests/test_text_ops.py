"""DuckDB-oracle parity for the documents/embeddings operators at
sf0.001 (the same comparison the driver runs at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem", "orders", "customer",
              "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.select_dtypes("floating").columns:
        df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(name, con, ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em
    mine = em.queries()[name](SF)
    mine = mine.to_pandas() if not isinstance(mine, pd.DataFrame) else mine
    ref = con.sql(em.oracle_sql()[name]).df()
    a, b = _norm(mine), _norm(ref)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("name", [
    "exact_dedup_docs", "token_count", "quality_score",
    "container_refs", "cap_top_containers", "docs_stats_by_lang",
    "ann_topk", "embedding_dedup_pairs",
    "lineitem_pricing_summary", "customer_order_stats",
    "top_parts_by_quantity",
])
def test_oracle_parity(name, con, ray_session):
    _check(name, con, ray_session)


def test_lang_id_runs(ray_session):
    import __ray_entry__ as em
    out = em.queries()["lang_id"](SF).to_pandas()
    assert set(out.columns) == {"doc_id", "pred_lang"}
    assert len(out) > 0


def test_minhash_lsh_docs_assigns_every_doc(ray_session):
    import __ray_entry__ as em
    out = em.queries()["minhash_lsh_docs"](SF).to_pandas()
    import pyarrow.parquet as pq
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(out) == n
    assert out.doc_id.is_unique


def test_lsh_bucket_topk_recall(ray_session):
    """bucketed ANN finds most of the brute-force top-k."""
    import __ray_entry__ as em
    brute = em.queries()["ann_topk"](SF).to_pandas()
    fast = em.queries()["lsh_bucket_topk"](SF).to_pandas()
    overlap = len(set(brute.vec_id) & set(fast.vec_id))
    assert overlap >= 4, overlap


def test_segment_routing_champions(ray_session):
    """D3 champion routing: every champion shares >= 1 sampled feature
    with its query doc; ranks are contiguous from 0."""
    import numpy as np
    import __ray_entry__ as em
    from destor_ray.functions import hashing, sampling
    out = em.queries()["segment_routing"](SF).to_pandas()
    assert set(out.columns) == {"doc_id", "champion_rank", "champion_doc_id"}
    assert len(out) > 0
    assert (out.groupby("doc_id").champion_rank.min() == 0).all()
    # spot-check feature overlap for a few routed docs
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(docs.doc_id, docs.text))
    feats = {d: set(sampling.sample_min(
        hashing.char_shingles_u64(texts[d], 5), 16).tolist())
        for d in out.doc_id.head(5).tolist() + out.champion_doc_id.head(5).tolist()}
    for _, row in out.head(5).iterrows():
        assert feats[row.doc_id] & feats[row.champion_doc_id]
