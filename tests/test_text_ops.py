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
              "events", "part", "supplier", "nation", "region"]:
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
    "top_parts_by_quantity", "part_type_revenue", "supplier_region_stats",
    "events_sessionize", "lang_id", "jaccard_join_exact",
    "token_count_bpe", "events_user_daily_topk", "jaccard_join_ppjoin",
    "common_substring_pairs", "stopword_scrub", "dataset_split",
    "decontaminate", "ann_topk_multi", "embedding_clusters",
    "events_asof_join", "events_range_join",
    "top_ngrams", "repetition_scores", "events_funnel",
    "column_quantiles", "curation_pipeline",
    "tfidf_top_terms", "bm25_scores",
    "segment_dedup", "pii_scrub",
    "customers_without_urgent_orders", "orders_running_total",
    "events_grouped_sample", "events_sliding_window",
    "events_type_percentiles", "user_event_pivot", "filtered_ann_topk",
    "incremental_dedup", "label_centroids", "kmeans_assign",
    "events_value_histogram", "minhash_lsh_oph", "simhash_md5_pairs",
    "pagerank_tokens", "semantic_dedup", "lineitem_rollup",
    "distinct_tokens_exact", "unigram_logprob", "training_mix_sample",
    "events_type_mad", "events_user_mode", "bigram_pmi",
    "user_retention_cohorts", "events_upsert_latest",
    "lineitem_corr_stats", "triangle_count",
    "events_zscore_outliers", "bloom_semi_join", "orders_decile_stats",
    "q3_shipping_priority", "events_value_rank",
    "orders_lineitem_left_join", "events_value_delta", "docs_jsonl_stats",
    "lineitem_cube", "source_token_entropy",
    "events_props_stats", "cust_orders_full_join",
    "events_weighted_sample", "events_version_diff", "user_event_paths",
    "q5_local_supplier_volume", "events_user_hour_ohlc",
    "keep_best_dedup", "heavy_hitter_tokens", "events_ewma",
    "quality_percentile_filter", "degree_distribution", "docs_csv_stats",
    "edit_distance_pairs", "token_communities", "sequence_pack",
    "events_time_weighted_avg", "events_type_top_values",
    "tokenize_to_ids", "event_type_cooccurrence",
    "source_length_gini", "orders_monthly_stats",
    "docs_embedding_join_stats", "embedding_model_scores",
    "events_recent_stats", "q6_forecast_revenue",
    "q10_returned_revenue", "q13_order_count_distribution",
    "q4_order_priority_check", "q14_promo_revenue_share",
    "q18_large_volume_orders", "q22_global_sales_opportunity",
    "events_hourly_active_users", "kmeans_iter_assign",
    "event_transitions", "zorder_layout_stats",
    "events_incremental_stats", "pretraining_pipeline",
    "doc_feature_hashing", "partitioned_write_readback",
    "q17_small_quantity_revenue", "q15_top_supplier",
    "q9_product_profit", "q19_disjunctive_revenue", "q7_nation_volume",
    "q8_market_share", "q12_priority_by_linestatus",
    "q21_waiting_suppliers", "bfs_token_distances",
    "part_pareto_frontier", "table_profile",
    "containment_join_exact", "normalize_text",
    "events_dedup_window", "orders_customer_set_ops",
    "lineitem_unpivot", "table_digest", "exact_global_quantiles",
    "dedup_ratio_estimate", "events_global_rank",
    "events_cumulative_users", "events_hourly_gapfill",
    "table_constraints_audit", "events_rolling_active_users",
    "events_type_trend",
    "docs_ngram_novelty", "docs_vocab_growth", "docs_char_class_profile",
    "doc_fingerprint_md5", "events_inter_arrival_stats",
    "lineitem_moment_stats", "part_type_supplier_hhi",
    "events_user_daily_streaks", "events_session_count_sweep",
    "events_value_benford", "orders_repeat_latency_histogram",
    "lineitem_ship_latency_histogram", "lineitem_returns_rate_by_month",
    "supplier_part_bipartite_degree", "lineitem_price_qty_ols",
    "events_weekend_contrast", "docs_hapax_ratio",
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


def test_ngram_jaccard_matches_local_ground_truth(ray_session):
    """The rendezvous-by-pair impl reproduces the candidates-with-true-
    Jaccard semantics: every emitted pair has exact shingle-set Jaccard
    >= threshold, and every pair that collides in >= 1 MinHash band AND
    has true Jaccard >= threshold is emitted exactly once."""
    import numpy as np
    import pyarrow.parquet as pq
    import __ray_entry__ as em
    from destor_ray.config import EngineConfig
    from destor_ray.functions import hashing, minhash

    out = em.queries()["ngram_jaccard_pairs"](SF).to_pandas()
    # uniqueness: global pair dedup (the old impl double-counted pairs
    # colliding in bands that hashed to different buckets)
    assert not out.duplicated(["left_id", "right_id"]).any()

    cfg = EngineConfig()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    sh = {d: hashing.char_shingles_u64(t, 5) for d, t in zip(docs.doc_id, docs.text)}
    ids = docs.doc_id.to_numpy()
    # replicate band keys
    parts = [sh[d] for d in ids]
    offs = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum([len(p) for p in parts], out=offs[1:])
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    sig = minhash.minhash_signatures_flat(flat, offs, cfg.lsh.num_perms, cfg.seed)
    bands = minhash.band_keys(sig, cfg.lsh.num_bands, cfg.lsh.rows_per_band, cfg.seed)
    from collections import defaultdict
    buckets = defaultdict(set)
    for i, did in enumerate(ids):
        for b in range(cfg.lsh.num_bands):
            buckets[(b, int(bands[i, b]))].add(int(did))
    expect = {}
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                l, r = ms[i], ms[j]
                if (l, r) in expect:
                    continue
                jac = minhash.jaccard(sh[l], sh[r])
                if jac >= 0.5:
                    expect[(l, r)] = round(jac, 6)
    got = {(int(a), int(b)): round(float(j), 6)
           for a, b, j in zip(out.left_id, out.right_id, out.jaccard)}
    assert got == expect


def test_simhash_dup_pairs_vs_bruteforce(ray_session):
    """Banded SimHash pairs == brute-force O(n²) Hamming<=3 pairs
    (pigeonhole: 8 bands guarantee collision for Hamming <= 7)."""
    import numpy as np
    import pyarrow.parquet as pq
    import __ray_entry__ as em
    from destor_ray import codec
    from destor_ray.functions import hashing, minhash

    out = em.queries()["simhash_dup_pairs"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    sims = {}
    for d, t in zip(docs.doc_id, docs.text):
        sh = hashing.char_shingles_u64(t, 5)
        sims[int(d)] = np.uint64(minhash.simhash64(sh)) if len(sh) else np.uint64(0)
    ids = sorted(sims)
    arr = np.asarray([sims[i] for i in ids], dtype=np.uint64).view(np.int64)
    iu, ju = np.triu_indices(len(ids), k=1)
    ham = codec.hamming64(arr[iu], arr[ju])
    ok = ham <= 3
    expect = {(ids[a], ids[b]): int(h)
              for a, b, h in zip(iu[ok], ju[ok], ham[ok])}
    got = {(int(a), int(b)): int(h)
           for a, b, h in zip(out.left_id, out.right_id, out.hamming)}
    assert got == expect


def test_embedding_lsh_pairs_recall(ray_session):
    """Approximate hyperplane-band path recovers >= 90% of the exact
    grid-join pairs at its default threshold."""
    import __ray_entry__ as em
    from destor_ray.pipelines import ann
    exact = ann.embedding_dedup_pairs(SF, threshold=0.4).to_pandas()
    approx = em.queries()["embedding_lsh_pairs"](SF).to_pandas()
    e = set(zip(exact.left_vec, exact.right_vec))
    a = set(zip(approx.left_vec, approx.right_vec)) if len(approx) else set()
    assert a <= e  # exact re-rank ⇒ no false positives
    if e:
        assert len(a & e) / len(e) >= 0.9, (len(a & e), len(e))


def test_ivf_topk_recall(ray_session):
    """IVF (k-means coarse quantizer, n_probe cells) recovers most of
    the brute-force top-k; raising n_probe to all cells makes it exact."""
    import __ray_entry__ as em
    from destor_ray.pipelines import ann
    brute = em.queries()["ann_topk"](SF).to_pandas()
    ivf = em.queries()["ivf_topk"](SF).to_pandas()
    overlap = len(set(brute.vec_id) & set(ivf.vec_id))
    assert overlap >= 5, overlap
    full = ann.ivf_topk(SF, n_centroids=8, n_probe=8).to_pandas()
    assert list(full.vec_id) == list(brute.vec_id)


def test_ivf_index_topk_matches_scan(ray_session):
    """The materialized hive-partitioned IVF index (partition-pruned
    probe reads) returns exactly the scan-with-prune ivf_topk result:
    same training sample/seed => same centroids => same probe set."""
    import shutil

    import __ray_entry__ as em
    from destor_ray.pipelines import ann
    shutil.rmtree(ann._ivf_index_dir(SF, 16, 4096), ignore_errors=True)
    scan = em.queries()["ivf_topk"](SF).to_pandas()
    idx = em.queries()["ivf_index_topk"](SF).to_pandas()
    pd.testing.assert_frame_equal(scan.reset_index(drop=True),
                                  idx.reset_index(drop=True))
    # second call hits the cached index (build-once/probe-many)
    again = em.queries()["ivf_index_topk"](SF).to_pandas()
    pd.testing.assert_frame_equal(idx, again)


def test_quantile_sketch_stats_rank_bound(con, ray_session):
    """Sketch quantiles vs DuckDB exact: n_rows exact, each reported
    quantile's true rank within 2% of its target."""
    import __ray_entry__ as em
    out = em.queries()["quantile_sketch_stats"](SF)
    n_exact = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert int(out["n_rows"][0]) == n_exact
    vals = con.sql("SELECT l_extendedprice FROM lineitem").df()[
        "l_extendedprice"].to_numpy()
    import numpy as np
    srt = np.sort(vals)
    for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        g = float(out[col][0])
        lo = np.searchsorted(srt, g, side="left") / len(srt)
        hi = np.searchsorted(srt, g, side="right") / len(srt)
        assert lo - 0.02 < q < hi + 0.02, (q, lo, hi)


def test_segment_dedup_planted_windows(ray_session, tmp_path):
    """Plant known shared k-token windows: keep-first must credit the
    lowest (doc_id, position) occurrence and count partial tail
    segments as segments."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.curation import segment_dedup
    shared = " ".join(f"s{i}" for i in range(8))       # one full window
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    rows = {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            shared + " " + uniq("a", 8),   # 2 segs, both first-seen
            shared + " " + uniq("b", 8),   # seg0 dup of doc1's seg0
            uniq("c", 12),                 # 2 segs (tail of 4), all kept
            shared + " " + shared,         # seg0 dup; seg1 == seg0 text
        ], pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = segment_dedup(str(d)).to_pandas().set_index("doc_id")
    assert (int(out.loc[1, "n_segs"]), int(out.loc[1, "n_kept"])) == (2, 2)
    assert (int(out.loc[2, "n_segs"]), int(out.loc[2, "n_kept"])) == (2, 1)
    assert (int(out.loc[3, "n_segs"]), int(out.loc[3, "n_kept"])) == (2, 2)
    assert (int(out.loc[4, "n_segs"]), int(out.loc[4, "n_kept"])) == (2, 0)


def test_corpus_phash_topk_sane(ray_session):
    import numpy as np
    import __ray_entry__ as em
    out = em.queries()["corpus_phash_topk"](SF).to_pandas()
    assert len(out) == 10
    d = out["hamming"].to_numpy()
    assert (np.diff(d) >= 0).all() and (d >= 0).all() and (d <= 64).all()
    # the query image itself is excluded, so no zero-distance self-hit
    # unless a genuine phash twin exists — either way ids are unique
    assert out["image_id"].is_unique


def test_incremental_dedup_planted_statuses(ray_session, tmp_path):
    """All three states on planted data: fp hits the ingested index ->
    dup_index (even when another new doc saw it first); first new
    occurrence of a fresh fp -> unique; later ones -> dup_new."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.curation import incremental_dedup
    fpA = " ".join(f"a{i}" for i in range(8))   # in the index
    fpB = " ".join(f"b{i}" for i in range(8))   # new-only, repeated
    fpC = " ".join(f"c{i}" for i in range(8))   # new-only, once
    rows = {
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "source": pa.array(["src0", "srcX", "srcX", "srcX", "srcX"],
                           pa.string()),
        "text": pa.array([fpA + " tail0", fpA + " tail1", fpB + " t2",
                          fpB + " t3", fpC + " t4"], pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = incremental_dedup(str(d)).to_pandas().set_index("doc_id")
    assert 1 not in out.index                      # index rows not emitted
    assert out.loc[2, "status"] == "dup_index"
    assert out.loc[3, "status"] == "unique"
    assert out.loc[4, "status"] == "dup_new"
    assert out.loc[5, "status"] == "unique"


def test_pii_scrub_redacts_all_planted(ray_session):
    import __ray_entry__ as em
    out = em.queries()["pii_scrub"](SF).to_pandas()
    assert not out["clean_text"].str.contains("@").any()
    assert out["clean_text"].str.contains(r"\[EMAIL\]", regex=True).all()
    assert (out["n_phone"] == 1).all() and (out["n_ip"] == 1).all()
    assert (out["n_email"] == 1 + (out["doc_id"] % 3 == 0)).all()


def test_curation_job_resumes_and_matches_pipeline(ray_session, tmp_path):
    """The checkpointed curation job: first run computes all stages,
    second run resumes every stage from parquet+lineage; the final
    output equals the one-shot streaming pipeline; metrics line up."""
    import pandas as pd
    import ray.data
    from destor_ray.pipelines.curation import (curation_pipeline,
                                               run_curation_job)
    wd = str(tmp_path / "job")
    s1 = run_curation_job(SF, wd)
    assert not any(s1["resumed"].values())
    s2 = run_curation_job(SF, wd)
    assert all(s2["resumed"].values())
    assert s1["metrics"] == s2["metrics"]
    out = ray.data.read_parquet(s1["final_dir"]).to_pandas()
    ref = curation_pipeline(SF).to_pandas()
    a = out[sorted(out.columns)].sort_values("doc_id").reset_index(drop=True)
    b = ref[sorted(ref.columns)].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    m = s1["metrics"]
    assert m["survivors"] == len(ref)
    assert m["n_val"] + m["n_train"] == m["survivors"]
    assert m["duplicates_removed"] == int(ref["n_copies"].sum()) - len(ref)


def test_curation_pipeline_dedups_planted_copies(ray_session, tmp_path):
    """The corpus has no exact dups, so plant some: the dedup leg must
    keep min(doc_id) per clean-text group and count copies — including
    docs identical only AFTER the scrub."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.curation import curation_pipeline
    base = "x" * 150 + "the quick brown fox jumps over the lazy dog " * 3
    rows = {
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([
            base,                   # keeper of group A
            base,                   # exact dup of 1
            base + " table",        # dup of 1 after scrub ("table" removed,
                                    # trailing space survives -> distinct)
            base + "tail",          # distinct survivor
            "short",                # dropped: len < 200
            base,                   # dup of 1
        ], pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = curation_pipeline(str(d)).to_pandas().set_index("doc_id")
    assert 2 not in out.index and 6 not in out.index and 5 not in out.index
    assert int(out.loc[1, "n_copies"]) == 3
    assert int(out.loc[4, "n_copies"]) == 1
    assert 3 in out.index  # trailing-space variant stays distinct


def test_retention_cohorts_invariants(ray_session, con):
    import __ray_entry__ as em
    out = em.queries()["user_retention_cohorts"](SF).to_pandas()
    # offset 0 counts each user exactly once (their cohort day itself)
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(out.loc[out["day_offset"] == 0, "n_users"].sum()) == n_users
    assert (out["day_offset"] >= 0).all()
    # retention can never exceed the cohort's own size
    base = out[out["day_offset"] == 0].set_index("cohort_day")["n_users"]
    for _, r in out.iterrows():
        assert r["n_users"] <= base[r["cohort_day"]]


def test_upsert_latest_delta_priority(ray_session, con):
    import __ray_entry__ as em
    out = em.queries()["events_upsert_latest"](SF).to_pandas()
    # one surviving row per key
    assert not out.duplicated(["user_id", "event_type"]).any()
    # any key that has at least one delta (odd event_id) row in the
    # input must surface a delta row, regardless of base timestamps
    has_delta = con.sql("""
        SELECT user_id, event_type FROM events
        GROUP BY 1, 2 HAVING sum(CASE WHEN event_id % 2 = 1 THEN 1
                                      ELSE 0 END) > 0""").df()
    keys = set(map(tuple, has_delta.to_numpy()))
    for _, r in out.iterrows():
        expected = "delta" if (r["user_id"], r["event_type"]) in keys \
            else "base"
        assert r["src"] == expected


def test_corr_micro_bounded(ray_session):
    import __ray_entry__ as em
    out = em.queries()["lineitem_corr_stats"](SF)
    assert (out["corr_micro"].abs() <= 1_000_000).all()
    assert (out["n"] > 0).all()


def test_triangle_count_matches_networkx_free_bruteforce(ray_session):
    """Cross-check the distributed count against a driver-side brute
    force over the (tiny at sf0.001) distinct-edge set."""
    import itertools

    import __ray_entry__ as em
    out = em.queries()["triangle_count"](SF)
    import duckdb as d
    edges = d.sql(f"""
        WITH w AS (SELECT string_split(text, ' ') AS ws
                   FROM read_parquet('{SF}/documents.parquet')),
        bg AS (SELECT ws[i] AS u, ws[i+1] AS v
               FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1))
                                AS i) t)
        SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        FROM bg WHERE u <> v""").df()
    eset = set(map(tuple, edges.to_numpy()))
    adj = {}
    for a, b in eset:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(1 for a, b in eset
              for c in adj[a] & adj[b] if (min(a, c), max(a, c)) in eset
              and (min(b, c), max(b, c)) in eset) // 3
    # each triangle found once per edge (3x)
    assert int(out["n_triangles"].iloc[0]) == tri
    assert int(out["n_nodes"].iloc[0]) == len(adj)
    assert int(out["n_edges"].iloc[0]) == len(eset)


def test_zscore_outliers_exactness_vs_driver(ray_session, con):
    """The integer isqrt threshold reproduces the literal
    (v - mean)^2 > 9 var comparison done in exact rational arithmetic."""
    from fractions import Fraction

    import __ray_entry__ as em
    out = em.queries()["events_zscore_outliers"](SF).to_pandas()
    ev = con.sql("SELECT event_id, event_type, "
                 "CAST(round(value*1000000) AS BIGINT) AS v "
                 "FROM events").df()
    expect = set()
    for et, g in ev.groupby("event_type"):
        v = g["v"].to_numpy()
        n = len(v)
        mean = Fraction(int(v.sum()), n)
        var = Fraction(int((v.astype(object) ** 2).sum()), n) - mean * mean
        for eid, x in zip(g["event_id"], v):
            if (Fraction(int(x)) - mean) ** 2 > 9 * var:
                expect.add(int(eid))
    assert set(out["event_id"]) == expect


def test_decile_stats_cover_all_orders(ray_session, con):
    import __ray_entry__ as em
    out = em.queries()["orders_decile_stats"](SF).to_pandas()
    n = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert int(out["n_orders"].sum()) == n
    assert sorted(out["decile"]) == list(range(len(out)))
    # bucket ranges must not overlap
    o = out.sort_values("decile")
    assert (o["min_cents"].to_numpy()[1:]
            > o["max_cents"].to_numpy()[:-1]).all()


def test_grouped_sketch_percentiles_rank_bound(ray_session, con):
    """Sketch p50/p90 per type must land within the KLL rank-error
    envelope of the exact by-rank percentiles."""
    import __ray_entry__ as em
    approx = em.queries()["events_type_sketch_percentiles"](SF) \
        .to_pandas().set_index("event_type")
    exact = em.queries()["events_type_percentiles"](SF) \
        .to_pandas().set_index("event_type")
    for et in exact.index:
        vals = con.sql(
            "SELECT CAST(round(value*1000000) AS BIGINT) AS v FROM events "
            f"WHERE event_type = '{et}' ORDER BY v").df()["v"].to_numpy()
        n = len(vals)
        assert int(approx.loc[et, "n"]) == n
        for col, q in (("p50_micro", 0.5), ("p90_micro", 0.9)):
            got = int(approx.loc[et, col])
            # rank of the sketch's answer must be within 5% of target
            import numpy as np
            rank = np.searchsorted(vals, got, side="right") / n
            assert abs(rank - q) < 0.05, (et, col, rank)


def test_pq_index_topk_recall(ray_session):
    """ADC over 8-byte PQ codes finds most of the exact top-k, and the
    encode→ADC path is deterministic across rebuilds."""
    import shutil

    import __ray_entry__ as em
    from destor_ray.pipelines import ann
    shutil.rmtree(ann._pq_index_dir(SF, 16, 32, 4096), ignore_errors=True)
    brute = em.queries()["ann_topk"](SF).to_pandas()
    pq10 = em.queries()["pq_index_topk"](SF).to_pandas()
    overlap = len(set(brute.vec_id) & set(pq10.vec_id))
    assert overlap >= 8, overlap
    again = em.queries()["pq_index_topk"](SF).to_pandas()
    pd.testing.assert_frame_equal(pq10, again)


def test_version_diff_statuses_complete(ray_session, con):
    """Every key in either snapshot appears exactly once, and the four
    statuses partition exactly along the carving rules."""
    import __ray_entry__ as em
    out = em.queries()["events_version_diff"](SF).to_pandas()
    assert out["event_id"].is_unique
    eid = out["event_id"].to_numpy()
    st = out["status"].to_numpy()
    in_base = eid % 3 != 0
    in_cur = eid % 7 != 0
    changed = eid % 5 == 0
    import numpy as np
    expect = np.where(~in_base, "added",
                      np.where(~in_cur, "removed",
                               np.where(changed, "changed", "same")))
    assert (st == expect).all()
    assert set(out["status"]) == {"added", "removed", "changed", "same"}


def test_weighted_sample_prefers_heavy_rows(ray_session, con):
    """Sampled rows must skew toward high weights: the mean value of
    the k selected per type should exceed the type's overall mean."""
    import __ray_entry__ as em
    out = em.queries()["events_weighted_sample"](SF).to_pandas()
    ev = con.sql("SELECT event_id, event_type, value FROM events "
                 "WHERE value > 0").df()
    assert (out.groupby("event_type").size() <= 10).all()
    merged = out.merge(ev, on=["event_id", "event_type"])
    assert len(merged) == len(out)
    overall = ev.groupby("event_type")["value"].mean()
    picked = merged.groupby("event_type")["value"].mean()
    # weighted selection should beat the unweighted mean for most types
    beats = (picked > overall.loc[picked.index]).sum()
    assert beats >= max(1, len(picked) - 1), (picked, overall)


def test_audio_wav_stats_exact(ray_session):
    """Real WAV decode through the actor pool: every clip is one second
    at 8 kHz and a 0.5-amplitude sine (RMS 0.5/sqrt(2))."""
    import __ray_entry__ as em
    out = em.queries()["audio_wav_stats"](SF).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["n_clips"]) == 512
    assert int(r["total_samples"]) == 512 * 8000
    assert abs(int(r["rms_micro_mean"]) - 353553) < 300


def test_ivfpq_topk_recall(ray_session):
    """IVF pruning + residual-PQ ADC + exact re-rank finds most of the
    exact top-k (probing half the cells)."""
    import shutil

    import __ray_entry__ as em
    from destor_ray.pipelines import ann
    shutil.rmtree(ann._ivfpq_index_dir(SF, 16, 16, 32, 4096),
                  ignore_errors=True)
    brute = em.queries()["ann_topk"](SF).to_pandas()
    got = em.queries()["ivfpq_topk"](SF).to_pandas()
    overlap = len(set(brute.vec_id) & set(got.vec_id))
    assert overlap >= 6, overlap


def test_zorder_tiles_bound_both_dimensions(ray_session):
    """The docstring's falsifiable claim: every Z-order tile covers a
    compact 16x16 rectangle, so BOTH distinct-user and distinct-hour
    counts are <= 16 per tile."""
    import __ray_entry__ as em
    out = em.queries()["zorder_layout_stats"](SF).to_pandas()
    assert (out["n_users"] <= 16).all()
    assert (out["n_hours"] <= 16).all()
    assert out["n"].sum() > 0


def test_global_rank_spans_full_order(ray_session):
    """stride-thinned ranks are exactly 1, 101, 201, ... and values are
    non-increasing along the rank order (DESC sort certified)."""
    import __ray_entry__ as em
    out = em.queries()["events_global_rank"](SF).to_pandas() \
        .sort_values("rnk").reset_index(drop=True)
    import pyarrow.parquet as pq
    n = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert list(out.rnk) == list(range(1, n + 1, 100))
    assert (out.value_micro.diff().dropna() <= 0).all()


def test_cumulative_users_monotone_and_complete(ray_session):
    import __ray_entry__ as em
    out = em.queries()["events_cumulative_users"](SF) \
        .sort_values("checkpoint_eid")
    assert (out.distinct_users.diff().dropna() >= 0).all()
    import duckdb
    total = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert out.distinct_users.iloc[-1] <= total
    assert out.distinct_users.iloc[-1] >= 1


def test_gapfill_grid_dense_and_total_preserved(ray_session):
    import __ray_entry__ as em
    out = em.queries()["events_hourly_gapfill"](SF)
    types = out.event_type.nunique()
    hours = out.hour_bucket.nunique()
    assert len(out) == types * hours  # complete grid
    assert (out.groupby("event_type").hour_bucket.count() == hours).all()
    import pyarrow.parquet as pq
    n = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert out.n_events.sum() == n  # zero-fill adds no mass
    assert (out.n_events == 0).any()  # and there are real gaps


def test_rp_ann_topk_recall(ray_session):
    """JL-projected shortlist + exact re-rank finds (nearly) the
    brute-force top-k, and every emitted cos_sim is exact (it must
    appear in the brute-force scores for the same vec_id)."""
    import __ray_entry__ as em
    brute = em.queries()["ann_topk"](SF).to_pandas()
    fast = em.queries()["rp_ann_topk"](SF).to_pandas()
    overlap = len(set(brute.vec_id) & set(fast.vec_id))
    assert overlap >= 8, overlap
    bmap = dict(zip(brute.vec_id, brute.cos_sim))
    for _, r in fast.iterrows():
        if r.vec_id in bmap:  # exactness of the re-ranked score
            assert abs(bmap[r.vec_id] - r.cos_sim) < 1e-9


def test_sorted_neighborhood_boundary_pairs(ray_session, tmp_path):
    """Force the cross-bucket boundary path: many splitters over few
    docs means nearly every bucket holds 1-2 rows, so most in-window
    pairs straddle bucket boundaries and must come from the driver
    fix-up. Compare against a brute-force single-node SNM."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.text import sorted_neighborhood_pairs
    # 40 docs, several sharing 8-char prefixes, distinct 16-char keys
    texts = []
    for i in range(40):
        g, j = divmod(i, 4)
        texts.append(f"prefix{g:02d}tail{j:02d} body {i}")
    rows = {
        "doc_id": pa.array(list(range(100, 140)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))

    out = sorted_neighborhood_pairs(str(d), n_splits=64, sample_mod=2)
    got = set(map(tuple, out[["doc_a", "doc_b", "dist"]].to_numpy()))

    # brute force: global sort by (key, id), window pairs, prefix filter
    key = [t[:16].lower() for t in texts]
    order = sorted(range(40), key=lambda i: (key[i], 100 + i))
    want = set()
    for a in range(40):
        for dd in range(1, 4):
            b = a + dd
            if b >= 40:
                continue
            ia, ib = order[a], order[b]
            if key[ia][:8] == key[ib][:8]:
                want.add((100 + ia, 100 + ib, dd))
    assert got == want and len(want) > 0
    # sanity: with 64 splitters over 40 docs the boundary path is live
    # (some pair must span two buckets) — asserted indirectly by parity


def test_token_dictionary_encode_wide_vocab(ray_session, tmp_path):
    """Planted 600-token vocabulary across many docs: codes must be the
    exact dense rank in token sort order (order-preserving), occurrence
    counts exact — exercises multi-bucket range partitioning + the
    exclusive-prefix offset carry (the driver corpus has only ~31
    distinct tokens, which fits one bucket)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.text import token_dictionary_encode
    vocab = [f"w{i:04d}" for i in range(600)]
    texts = [" ".join(vocab[i::7]) for i in range(7)] + \
            [" ".join(vocab[:50])] * 3  # skewed repeats
    rows = {
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = token_dictionary_encode(str(d), n_splits=16, sample_mod=4) \
        .to_pandas().sort_values("code").reset_index(drop=True)
    assert len(out) == 600
    assert out["token"].tolist() == sorted(vocab)
    assert out["code"].tolist() == list(range(600))
    n = out.set_index("token")["n_occ"]
    assert int(n["w0000"]) == 4 and int(n["w0049"]) == 4
    assert int(n["w0050"]) == 1 and int(n["w0599"]) == 1


def _bpe_reference(texts, num_merges):
    """Single-process reference BPE trainer (Sennrich word-level)."""
    from collections import Counter
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    segs = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        cmax = max(pc.values())
        l, r = min(k for k, v in pc.items() if v == cmax)
        merges.append((l, r, cmax))
        for w, syms in segs.items():
            i = 0
            while i < len(syms) - 1:
                if syms[i] == l and syms[i + 1] == r:
                    syms[i:i + 2] = [l + r]
                else:
                    i += 1
    return merges


def test_bpe_train_merges_matches_reference(ray_session, tmp_path):
    """Distributed trainer == single-process reference on a corpus with
    known structure (repeated subwords force specific merges, a tie at
    round 1 pins the lexicographic tie-break)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.text import bpe_train_merges
    texts = [
        "lower lower lowest newer newer newest wider low new",
        "lower newest wide wide low low new newer",
        "abab abab cdcd",
    ]
    rows = {
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = bpe_train_merges(str(d), num_merges=10)
    got = list(zip(out["left"], out["right"], out["pair_count"]))
    want = _bpe_reference(texts, 10)
    assert [(l, r, int(c)) for l, r, c in got] == want
    assert len(want) == 10


def test_shard_rebalance_rendezvous_beats_mod(ray_session):
    """Rendezvous hashing moves ~1/n_new of keys on scale-out; modulo
    moves the vast majority — the measured gap must be wide."""
    import __ray_entry__ as em
    out = em.queries()["shard_rebalance_audit"](
        "/root/testdata/sf0.01").to_pandas().set_index("scheme")
    n = int(out.loc["mod", "n_keys"])
    assert n >= 100  # enough keys that the fractions are meaningful
    mod_frac = out.loc["mod", "n_moved"] / n
    rdv_frac = out.loc["rendezvous", "n_moved"] / n
    assert rdv_frac < 0.25          # theory: ~1/9 ≈ 0.11
    assert mod_frac > 0.7           # theory: ~8/9 ≈ 0.89
    assert rdv_frac < mod_frac / 3  # the scheme gap itself


def test_autocorr_matches_pandas_and_bucket_invariant(ray_session):
    """events_autocorr == a single-process pandas reference (exact
    integer moments, same rounding), and the result is invariant to
    the bucket count (the cross-bucket stitch can't depend on where
    the range splits fall — n_buckets=3 forces nearly every lag pair
    through the boundary-set path at 1000 rows / 5 types)."""
    import math

    import pyarrow.parquet as pq

    from destor_ray.pipelines.streaming import events_autocorr

    out = events_autocorr(SF).sort_values(
        ["event_type", "lag"]).reset_index(drop=True)
    out3 = events_autocorr(SF, n_buckets=3).sort_values(
        ["event_type", "lag"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out3)

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"]) \
        .to_pandas().sort_values("event_id")
    rows = []
    for t, g in df.groupby("event_type"):
        v = [int(round(x * 1_000_000)) for x in g["value"]]
        for k in (1, 2, 3):
            x, y = v[:-k], v[k:]
            n = len(x)
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            syy = sum(b * b for b in y)
            num = n * sxy - sx * sy
            corr = float(num) * 1e6 / math.sqrt(
                float(n * sxx - sx * sx) * float(n * syy - sy * sy))
            cm = math.floor(corr + 0.5) if corr >= 0 \
                else -math.floor(-corr + 0.5)
            rows.append((t, k, n, sx, sy, cm))
    ref = pd.DataFrame(rows, columns=out.columns).astype(out.dtypes) \
        .sort_values(["event_type", "lag"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


def test_readability_scores_hand_computed(ray_session):
    """flesch_micro matches a hand-computed value for a known doc, and
    every feature column is consistent with a per-row Python check."""
    import __ray_entry__ as em
    out = em.queries()["readability_scores"](SF).to_pandas() \
        .set_index("doc_id")
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    sample = docs.sample(25, random_state=7)
    for _, r in sample.iterrows():
        t = r["text"]
        w = t.count(" ") + 1
        s = max(t.count(".") + t.count("!") + t.count("?"), 1)
        v = sum(t.lower().count(c) for c in "aeiou")
        exp = 206_835_000 - (1_015_000 * w) // s - (84_600_000 * v) // w
        row = out.loc[r["doc_id"]]
        assert (row.n_words, row.n_sentences, row.n_vowels,
                row.flesch_micro) == (w, s, v, exp)


def test_embedding_pca_top1_matches_numpy(ray_session):
    """the distributed moment-partial PCA reproduces a single-process
    numpy covariance + eigh: PC1 per-label mean projections agree to
    micro precision (up to global sign) and EVR to 1e-4."""
    import numpy as np
    import pyarrow.parquet as pq

    from destor_ray.pipelines.ann import embedding_pca_top1

    out = embedding_pca_top1(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    lab = t["label"].to_numpy()
    mu = x.mean(0)
    cov = np.cov(x.T, bias=True)
    w, v = np.linalg.eigh(cov)
    proj = (x - mu) @ v[:, -1]
    ref = pd.DataFrame({"label": lab, "p": proj}).groupby("label")["p"] \
        .agg(["mean", "count"])
    # global sign is arbitrary in the reference; compare magnitudes
    # consistently by aligning on the largest-|mean| label
    big = ref["mean"].abs().idxmax()
    sign = 1.0 if (ref.loc[big, "mean"] *
                   out.set_index("label").loc[big, "mean_proj_micro"]) >= 0 \
        else -1.0
    for _, r in out.iterrows():
        assert int(r.n) == int(ref.loc[r.label, "count"])
        assert abs(r.mean_proj_micro / 1e6
                   - sign * ref.loc[r.label, "mean"]) < 2e-5
    evr = w[-1] / w.sum()
    assert abs(out.evr_ppm.iloc[0] / 1e6 - evr) < 1e-4


def test_ks_drift_matches_scipy_style_reference(ray_session):
    """events_ks_drift equals a single-process exact KS computation
    (numpy, binning-free), and is invariant to the bucket count."""
    import numpy as np
    import pyarrow.parquet as pq

    from destor_ray.pipelines.streaming import events_ks_drift

    out = events_ks_drift(SF).iloc[0]
    out5 = events_ks_drift(SF, n_buckets=5).iloc[0]
    assert tuple(out) == tuple(out5)

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    me = df.event_id.max()
    vm = np.round(df.value.to_numpy() * 1e6).astype(np.int64)
    pb = (df.event_id.to_numpy() * 2 > me)
    a, b = np.sort(vm[~pb]), np.sort(vm[pb])
    na, nb = len(a), len(b)
    allv = np.unique(vm)
    cum_a = np.searchsorted(a, allv, side="right")
    cum_b = np.searchsorted(b, allv, side="right")
    ks_num = int(np.abs(cum_a * nb - cum_b * na).max())
    assert (out.n_a, out.n_b) == (na, nb)
    assert out.ks_num == ks_num
    assert out.ks_den == na * nb


def test_weighted_quantiles_match_expansion_reference(ray_session):
    """lineitem_weighted_quantiles equals the brute-force definition:
    expand every row w times and take the uniform lower quantile of
    the expanded multiset."""
    import numpy as np
    import pyarrow.parquet as pq

    from destor_ray.pipelines.stats import lineitem_weighted_quantiles

    out = lineitem_weighted_quantiles(SF)
    df = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_extendedprice", "l_quantity"]) \
        .to_pandas()
    c = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    w = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
    expanded = np.sort(np.repeat(c, w))
    W = int(w.sum())
    assert (out["total_weight"] == W).all()
    for _, r in out.iterrows():
        # smallest v with cum(v)*b >= a*W  ==  expanded[ceil(a*W/b)-1]
        k = -(-int(r.q_num) * W // int(r.q_den))
        assert int(r.wq_cents) == int(expanded[k - 1]), \
            (r.q_num, r.q_den)


def test_rolling_median_matches_pandas_and_bucket_invariant(ray_session):
    """events_rolling_median equals pandas' per-type rolling lower
    median (min_periods=1, manual lower-median pick), and the carried
    boundary tails make it invariant to the bucket count."""
    import numpy as np
    import pyarrow.parquet as pq

    from destor_ray.pipelines.streaming import events_rolling_median

    out = events_rolling_median(SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    out3 = events_rolling_median(SF, n_buckets=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out.equals(out3)

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"]) \
        .to_pandas().sort_values("event_id")
    df["vm"] = np.round(df["value"].to_numpy() * 1e6).astype(np.int64)
    ref = {}
    for t, g in df.groupby("event_type"):
        v = g["vm"].to_numpy()
        for j, eid in enumerate(g["event_id"].to_numpy()):
            fr = np.sort(v[max(0, j - 6):j + 1])
            ref[int(eid)] = int(fr[(len(fr) - 1) // 2])
    got = dict(zip(out["event_id"].astype(int), out["med_micro"]))
    assert got == ref


def test_max_concurrency_matches_sweep_reference(ray_session):
    """events_max_concurrency equals a single-process sweep over the
    same session intervals, and is invariant to the bucket count."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from destor_ray.pipelines.streaming import events_max_concurrency

    out = events_max_concurrency(SF).iloc[0]
    out5 = events_max_concurrency(SF, n_buckets=5).iloc[0]
    assert tuple(out) == tuple(out5)

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    df["us"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "us"], kind="stable")
    uid, ts = df["user_id"].to_numpy(), df["us"].to_numpy()
    new = np.r_[True, (uid[1:] != uid[:-1])
                | ((ts[1:] - ts[:-1]) > 1800 * 1_000_000)]
    sid = np.cumsum(new) - 1
    iv = pd.DataFrame({"s": sid, "t": ts}).groupby("s")["t"] \
        .agg(["min", "max"])
    starts = np.sort(iv["min"].to_numpy())
    ends = np.sort(iv["max"].to_numpy())
    allt = np.unique(np.r_[starts, ends])
    conc = (np.searchsorted(starts, allt, side="right")
            - np.searchsorted(ends, allt, side="left"))
    mc = int(conc.max())
    assert out.n_sessions == len(iv)
    assert out.max_concurrent == mc
    assert out.t_at_max_us == int(allt[conc.argmax()])


def test_chi2_assoc_matches_crosstab_reference(ray_session):
    """events_chi2_assoc equals the classic (O−E)²/E chi-square over a
    pandas crosstab of the same dow derivation, cell by cell."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from destor_ray.pipelines.stats import events_chi2_assoc

    out = events_chi2_assoc(SF)
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    us = df["ts"].astype("int64")
    dow = (us // 86_400_000_000 + 4) % 7
    ct = pd.crosstab(df["event_type"], dow)
    n = ct.to_numpy().sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2_ref = ((ct.to_numpy() - e) ** 2 / e).sum()   # zero cells incl.
    got = out["chi2_term_micro"].sum() / 1e6
    assert abs(got - chi2_ref) < 1e-3
    assert int(out["o"].sum()) == n
    # the output is the full observed-domain cross product (zero-
    # observed cells carry (0−E)²/E), so every type has every dow row
    # and the per-cell expected counts recombine to the row margins
    assert len(out) == ct.shape[0] * ct.shape[1]
    for t, g in out.groupby("event_type"):
        assert len(g) == ct.shape[1]
        assert abs(g["e_micro"].sum() / 1e6 - ct.loc[t].sum()) \
            < len(g) * 1e-6 + 1e-9 * n


def test_embedding_dim_stats_matches_numpy(ray_session):
    """embedding_dim_stats equals the single-process numpy per-dim
    profile under the same floor(x*1e6) quantization."""
    import numpy as np
    import pyarrow.parquet as pq

    from destor_ray.pipelines.ann import embedding_dim_stats

    out = embedding_dim_stats(SF).to_pandas().sort_values("dim") \
        .reset_index(drop=True)
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"])["embedding"]
    m = np.stack(emb.to_pylist()).astype(np.float64)
    q = np.floor(m * 1e6).astype(np.int64)
    assert (out["n"] == m.shape[0]).all()
    assert (out["sum_micro"].to_numpy() == q.sum(axis=0)).all()
    assert (out["min_micro"].to_numpy() == q.min(axis=0)).all()
    assert (out["max_micro"].to_numpy() == q.max(axis=0)).all()
    assert len(out) == m.shape[1]


def test_mannwhitney_matches_bruteforce_and_bucket_invariant(ray_session):
    """events_mannwhitney_drift equals the O(n_a·n_b) pairwise
    definition 2U_a = Σ 2·[a>b] + [a==b] computed by brute force,
    tie_cube equals the per-value Σ t³−t, and the result is invariant
    to the bucket count."""
    import numpy as np
    import pyarrow.parquet as pq

    from destor_ray.pipelines.streaming import events_mannwhitney_drift

    out = events_mannwhitney_drift(SF).iloc[0]
    out3 = events_mannwhitney_drift(SF, n_buckets=3).iloc[0]
    assert tuple(out) == tuple(out3)

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    me = df.event_id.max()
    vm = np.round(df.value.to_numpy() * 1e6).astype(np.int64)
    pb = (df.event_id.to_numpy() * 2 > me)
    a, b = vm[~pb], vm[pb]
    # brute force: broadcast compare (sf0.001 is small enough)
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    u2_ref = int(2 * gt + eq)
    assert (out.n_a, out.n_b) == (len(a), len(b))
    assert out.u2_a == u2_ref
    _, t = np.unique(vm, return_counts=True)
    assert out.tie_cube == int((t.astype(np.int64) ** 3 - t).sum())
    assert 0 <= out.auc_micro <= 1_000_000


def test_stratified_kfold_balance(ray_session):
    """each lang stratum's fold sizes differ by at most 1 (perfect
    round-robin balance) and every doc is assigned exactly once."""
    import duckdb

    import __ray_entry__ as em
    out = em.queries()["stratified_kfold"](SF).to_pandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert out.n.sum() == total
    for _, g in out.groupby("lang"):
        assert len(g) == 5
        assert g.n.max() - g.n.min() <= 1


def test_sq8_ann_matches_brute_force(ray_session):
    """the int8 scalar-quantized scan + exact shortlist re-rank
    reproduces the float64 brute-force top-k exactly."""
    from destor_ray.pipelines.ann import ann_topk, sq8_ann_topk

    exact = ann_topk(SF).to_pandas().reset_index(drop=True)
    sq8 = sq8_ann_topk(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(sq8, exact)


def test_logreg_train_convergence_and_invariance(ray_session):
    """The GD trainer (a) matches a single-process numpy reference
    bit-for-bit (the reproducibility contract), (b) is invariant to
    partitioning/batching (micro-sums are order-free), and (c) actually
    LEARNS: final-round accuracy well above both the base rate and
    round-1 (zero-weight) accuracy."""
    import numpy as np
    import pyarrow.parquet as pq

    from destor_ray.pipelines import text

    got = text.logreg_train_lang(SF).to_pandas().sort_values("round")

    # single-process reference with identical arithmetic
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text", "n_chars"])
    texts = t["text"].to_pylist()
    ch = np.asarray(t["n_chars"].to_numpy(), dtype=np.int64)
    cnt = np.array([s.count(" the ") for s in texts], dtype=np.int64)
    n_tok = np.array([s.count(" ") + 1 for s in texts], dtype=np.int64)
    n = len(ch)
    c1, c2 = int(ch.sum()) // n, int(cnt.sum()) // n
    y = (n_tok > 50).astype(np.float64)
    x1 = (ch - c1).astype(np.float64) * 0.01
    x2 = (cnt - c2).astype(np.float64)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    w = [0, 0, 0]
    ref = []
    for r in range(1, 5):
        z = (w[0] * 1e-6 + w[1] * 1e-6 * x1) + w[2] * 1e-6 * x2
        p = 0.5 + 0.5 * (z / (1.0 + np.abs(z)))
        resid = p - y
        g = [int(np.floor(resid * 1000000.0).astype(np.int64).sum()),
             int(np.floor((resid * x1) * 1000000.0).astype(np.int64).sum()),
             int(np.floor((resid * x2) * 1000000.0).astype(np.int64).sum())]
        nc = int(((z > 0.0) == (y == 1.0)).sum())
        w = [w[j] - tdiv(g[j], 2 * n) for j in range(3)]
        ref.append((r, *w, *g, nc, n))

    assert [tuple(r) for r in got.itertuples(index=False)] == ref

    # learns: final accuracy beats both base rate and round-1 accuracy
    acc = got["n_correct"].to_numpy() / n
    base = max(y.mean(), 1.0 - y.mean())
    assert acc[-1] > base + 0.05 and acc[-1] > acc[0] + 0.05

    # partition invariance: tiny blocks give identical output
    import ray.data as rd
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024
        again = text.logreg_train_lang(SF).to_pandas().sort_values("round")
    finally:
        ctx.target_max_block_size = old
    assert [tuple(r) for r in again.itertuples(index=False)] == ref


def test_bpe_encode_corpus_matches_reference(ray_session, tmp_path):
    """Distributed domain-encode == per-doc single-process apply of the
    reference-trained merge table (train+encode end-to-end parity)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.text import _bpe_segment, bpe_encode_corpus
    texts = [
        "lower lower lowest newer newer newest wider low new",
        "lower newest wide wide low low new newer",
        "abab abab cdcd",
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(d / "documents.parquet"))

    got = bpe_encode_corpus(str(d), num_merges=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    ref_merges = _bpe_reference(texts, 10)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(ref_merges)}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        n_bpe = sum(len(_bpe_segment(w, ranks)) for w in ws)
        assert int(got.loc[i, "n_words"]) == len(ws)
        assert int(got.loc[i, "n_bpe_tokens"]) == n_bpe
    # merges actually compress: strictly fewer pieces than characters+1
    chars = sum(len(w) + 1 for t in texts for w in t.split(" ") if w)
    assert int(got["n_bpe_tokens"].sum()) < chars


def test_events_k_anonymity_matches_bruteforce(ray_session):
    """the distributed (QI,user)-domain fold == a single-process pandas
    reference over the raw table, for every k in the sweep."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from destor_ray.pipelines.curation import events_k_anonymity

    sf = "/root/testdata/sf0.001"
    out = events_k_anonymity(sf)

    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["ts", "event_type", "value", "user_id"])
    us = t["ts"].cast("int64").to_numpy()
    df = pd.DataFrame({
        "et": t["event_type"].to_pylist(),
        "dow": (us // 86_400_000_000 + 4) % 7,
        "vb": np.floor(t["value"].to_numpy() / 10.0).astype(np.int64),
        "user_id": t["user_id"].to_numpy()})
    g = df.groupby(["et", "dow", "vb"]).agg(
        n=("user_id", "size"), ndu=("user_id", "nunique")).reset_index()
    for _, row in out.iterrows():
        k = int(row.k)
        assert row.n_groups == len(g)
        assert row.n_groups_below_k == int((g["n"] < k).sum())
        assert row.rows_at_risk == int(g.loc[g["n"] < k, "n"].sum())
        assert row.n_groups_l_below_k == int((g["ndu"] < k).sum())
    # sanity: risk counts are monotone in k
    assert list(out["n_groups_below_k"]) == \
        sorted(out["n_groups_below_k"])


def test_omni_text_channel_invariants():
    """the measured facts the omni text channel design rests on, pinned
    at the kernel level (no ray): (a) the BG bag hash is EXACTLY
    order-invariant and the w=3 shingle Jaccard of a reordered doc
    falls below the MH verify gate (ro is BG's class); (b) the
    boilerplate-injection transform keeps bottom-64 shared-posting
    containment >= the CN gate while symmetric J sits in MH's
    unreliable zone; (c) distinct docs on the SHARED 40-word vocab
    stay far below every gate."""
    import hashlib

    import numpy as np

    from destor_ray.functions import hashing
    from destor_ray.pipelines.text import (_OTX_CN_FRAC, _OTX_K, _OTX_MH_J,
                                           _otx_base_text, _otx_norm,
                                           _otx_transform)

    def bag(t):
        uni = hashing.word_shingles_u64(_otx_norm(t), 1)
        return hashlib.blake2b(np.sort(uni).tobytes(),
                               digest_size=16).digest()

    def bottomk(t):
        sh = np.unique(hashing.word_shingles_u64(_otx_norm(t), 3))
        order = np.argsort(hashing.mix_u64(sh, 0xC017))
        return np.sort(sh[order[:_OTX_K]])

    def jac(a, b):
        inter = len(np.intersect1d(a, b, assume_unique=True))
        u = len(a) + len(b) - inter
        return inter / u if u else 1.0

    for i in range(4):
        base = _otx_base_text(i)
        ro = _otx_transform(base, "ro", i)
        assert ro != base
        assert bag(ro) == bag(base)                      # exact invariance
        assert jac(bottomk(base), bottomk(ro)) < _OTX_MH_J

        ct = _otx_transform(base, "ct", i)
        a, b = bottomk(base), bottomk(ct)
        shared = len(np.intersect1d(a, b, assume_unique=True))
        assert shared >= _OTX_CN_FRAC * min(len(a), len(b))
        assert shared >= 8

        ws = _otx_transform(base, "ws", i)
        assert ws != base and _otx_norm(ws) == _otx_norm(base)

        tr = _otx_transform(base, "tr", i)
        a, b = bottomk(base), bottomk(tr)
        shared = len(np.intersect1d(a, b, assume_unique=True))
        assert shared >= _OTX_CN_FRAC * min(len(a), len(b))
        assert shared >= 8

    # distinct-pair background: below every gate
    for k in range(6):
        a = bottomk(_otx_base_text(k))
        b = bottomk(_otx_base_text(k + 101))
        shared = len(np.intersect1d(a, b, assume_unique=True))
        assert shared < 8
        assert jac(a, b) < _OTX_MH_J
        assert bag(_otx_base_text(k)) != bag(_otx_base_text(k + 101))


def test_omni_text_dedup_per_class_full_recall(ray_session):
    """the production composition of the text channels: one
    normalize+tokenize pass, one unified band exchange, per-channel
    verify dispatch — on a mixed corpus planting one dup per transform
    class, EVERY class reaches recall 1.0 with zero false merges."""
    from destor_ray.pipelines.text import _OTX_KINDS, omni_text_dedup

    out = omni_text_dedup("/root/testdata/sf0.001")
    assert list(out["kind"]) == list(_OTX_KINDS) + ["_total"]
    per = out[out.kind != "_total"]
    assert (per.n_planted == 5).all()
    assert (per.recall_ppm == 1_000_000).all()
    tot = out[out.kind == "_total"].iloc[0]
    assert tot.n_planted == tot.n_found == 30
    assert tot.n_false == 0


def test_degrade_markers_and_guard_type(ray_session):
    """ADVICE r4 / VERDICT r4 #6: the exact-join volume guard is a
    DEDICATED exception type (no message-string dispatch), strict=True
    preserves the refusal, and the auto-degraded result surfaces its
    approximate candidate recall IN-BAND as a `recall_estimate` column
    whose value pins the measured boundary documented in the
    ngram_jaccard_pairs docstring (containment 0.905)."""
    import pytest

    from destor_ray.pipelines.text import (
        DEGRADE_RECALL_CONTAINMENT, DEGRADE_RECALL_JACCARD,
        VolumeGuardError, containment_join_exact, jaccard_join_exact)

    sf = "/root/testdata/sf0.001"
    # max_pairs=0 forces the guard on any corpus
    with pytest.raises(VolumeGuardError):
        jaccard_join_exact(sf, strict=True, max_pairs=0)
    with pytest.raises(VolumeGuardError):
        containment_join_exact(sf, strict=True, max_pairs=0)

    deg = jaccard_join_exact(sf, max_pairs=0).to_pandas()
    assert "recall_estimate" in deg.columns
    assert (deg["recall_estimate"] == DEGRADE_RECALL_JACCARD).all() or \
        deg.empty
    degc = containment_join_exact(sf, max_pairs=0).to_pandas()
    assert "recall_estimate" in degc.columns
    assert (degc["recall_estimate"] == DEGRADE_RECALL_CONTAINMENT).all() \
        or degc.empty
    # the docstring-measured boundary is pinned to the shipped constant
    from destor_ray.pipelines import text as _t
    assert "512/566 oracle pairs = 90.5% recall" in \
        _t.ngram_jaccard_pairs.__doc__
    assert DEGRADE_RECALL_CONTAINMENT == 0.905

    # the exact (non-degraded) path must NOT carry the marker column
    exact = jaccard_join_exact(sf).to_pandas()
    assert "recall_estimate" not in exact.columns


def test_volume_guard_detected_across_ray_task_boundary(ray_session):
    """_is_volume_guard must dispatch on the ORIGINAL exception type
    even when the raise happened inside a Ray task (Ray wraps it in
    RayTaskError / dual-type subclasses) — the in-bucket guard's
    delivery path. Also: an unrelated error whose MESSAGE mentions
    'all-pairs join' is NOT misrouted (the round-4 string-matching
    bug this round's dispatch replaced)."""
    import ray as _ray

    from destor_ray.pipelines.text import VolumeGuardError, _is_volume_guard

    @_ray.remote
    def boom():
        raise VolumeGuardError("bucket volume guard")

    try:
        _ray.get(boom.remote())
        assert False, "expected a raise"
    except Exception as e:  # noqa: BLE001 — asserting wrapper dispatch
        assert _is_volume_guard(e), type(e)

    @_ray.remote
    def other():
        raise RuntimeError("unrelated failure in an all-pairs join")

    try:
        _ray.get(other.remote())
        assert False, "expected a raise"
    except Exception as e:  # noqa: BLE001
        assert not _is_volume_guard(e), type(e)


def test_simhash64_shingle_pairs_banding_exact(ray_session):
    """The 8x8-bit band exchange loses NOTHING at hamming <= 6
    (pigeonhole: <=7 differing bits leave >=1 band untouched): the
    banded pipeline's pair set equals the brute-force fingerprint
    all-pairs set, and every emitted hamming is <= the threshold."""
    import duckdb

    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    out = em.queries()["simhash64_shingle_pairs"](sf).to_pandas()
    assert (out["hamming"] <= 6).all()
    sql = em.oracle_sql()["simhash64_shingle_pairs"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    brute = con.execute(sql).df()
    got = set(zip(out["left_id"], out["right_id"], out["hamming"]))
    want = set(zip(brute["left_id"], brute["right_id"],
                   brute["hamming"]))
    assert got == want and len(got) > 0


def test_token_cms_overcount_property(ray_session):
    """Count-Min estimates never undercount (est >= true for every
    top-k token) and overcount only by collision mass (bounded well
    below 2x on this corpus/width)."""
    import __ray_entry__ as em

    out = em.queries()["token_cms_md5"]("/root/testdata/sf0.001")
    assert len(out) == 10
    assert (out["cms_est"] >= out["true_freq"]).all()
    assert (out["cms_est"] <= 2 * out["true_freq"]).all()


def test_token_bloom_no_false_negatives(ray_session):
    """Bloom invariants through the oracle-verified md5 filter: every
    actually-present probe reads present (NO false negatives — the
    property DDFS relies on), and the planted '~miss' probes are
    either absent or genuine k-fold collisions (bounded FPR: not all
    of them can read present at this fill factor)."""
    import __ray_entry__ as em

    out = em.queries()["token_bloom_md5"]("/root/testdata/sf0.001")
    present = out[out["actually_present"] == 1]
    assert len(present) == 12
    assert (present["present_in_filter"] == 1).all()
    misses = out[out["actually_present"] == 0]
    assert len(misses) == 12
    assert int(misses["present_in_filter"].sum()) < 12
