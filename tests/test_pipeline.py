"""End-to-end flagship pipeline conformance: recall >= 0.99 vs planted
plan, no distractor merges, exact cluster-count agreement with ground
truth, determinism."""

import numpy as np
import pytest

from destor_ray import corpus

N = 400


@pytest.fixture(scope="module")
def corpus_dir(ray_session):
    return corpus.ensure_corpus_parquet(N, seed=42)


@pytest.fixture(scope="module")
def assignment(ray_session, corpus_dir):
    from destor_ray.pipelines.dedup import dedup_pipeline_from_dir
    return dedup_pipeline_from_dir(corpus_dir).to_pandas()


def test_all_rows_assigned(assignment):
    assert len(assignment) == N
    assert assignment.image_id.is_unique


def test_recall_and_distractors(assignment):
    pred = dict(zip(assignment.image_id, assignment.cluster_id))
    plan = corpus.dup_plan_table(N)
    hits = misses = joined_distractors = 0
    for l, r, k in zip(plan["left_id"].to_pylist(), plan["right_id"].to_pylist(),
                       plan["kind"].to_pylist()):
        same = pred[l] == pred[r]
        if k == "distractor_near_miss":
            joined_distractors += int(same)
        else:
            hits += int(same)
            misses += int(not same)
    recall = hits / max(1, hits + misses)
    assert recall >= 0.99, (recall, misses)
    assert joined_distractors == 0


def test_cluster_assignment_matches_truth_exactly(assignment):
    truth = {f"img{i:010d}": f"img{corpus.truth_cluster(i):010d}" for i in range(N)}
    pred = dict(zip(assignment.image_id, assignment.cluster_id))
    mismatches = {k: (pred[k], truth[k]) for k in truth if pred[k] != truth[k]}
    assert not mismatches, list(mismatches.items())[:5]


def test_exact_dedup_counts(ray_session, corpus_dir):
    import ray.data
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages.exact import exact_dedup
    out = exact_dedup(signatures_from_corpus(ray.data.read_parquet(corpus_dir))).to_pandas()
    assert len(out) == N
    # exact dups: slot 7 of each block, plus caption_para rows (slot 19 keeps
    # identical bytes → byte-identical too)
    n_exact_dups = out.is_dup.sum()
    expected = sum(1 for i in range(N) if corpus.plan_for_row(i)[0] in ("exact", "caption_para"))
    assert n_exact_dups == expected


def test_dsu_matches_distributed(ray_session, corpus_dir):
    """Driver union-find over the same edges reproduces the distributed
    hash-to-min result (including the exact channel riding the bands)."""
    import ray.data
    from destor_ray.pipelines.dedup import dedup_pipeline_from_dir, signatures_from_corpus
    from destor_ray.stages import candidates, cluster

    ds = ray.data.read_parquet(corpus_dir)
    sigs = signatures_from_corpus(ds)
    edges = candidates.candidate_edges(sigs)
    dsu = cluster.union_find_driver(edges.iter_batches(batch_format="pyarrow"))
    driver_df = cluster.clusters_from_dsu(dsu, list(range(N)))
    driver = {f"img{n:010d}": f"img{c:010d}"
              for n, c in zip(driver_df.node, driver_df.cluster)}
    # force the DISTRIBUTED hash-to-min path (driver_cc_threshold=0)
    from destor_ray.pipelines.dedup import dedup_pipeline
    dist_df = dedup_pipeline(ds, driver_cc_threshold=0).to_pandas()
    dist = dict(zip(dist_df.image_id, dist_df.cluster_id))
    assert driver == dist


def test_simulation_mode(ray_session, corpus_dir):
    """Metadata-only dry run (destor simulation-levels analog): no decode,
    phash-Hamming verify; recall degrades gracefully, no distractors."""
    import ray.data
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import dedup_pipeline
    cfg = EngineConfig(simulation=True)
    out = dedup_pipeline(ray.data.read_parquet(corpus_dir), cfg,
                         n_rows_hint=N).to_pandas()
    pred = dict(zip(out.image_id, out.cluster_id))
    plan = corpus.dup_plan_table(N)
    hits = total = joined = 0
    for l, r, k in zip(plan["left_id"].to_pylist(), plan["right_id"].to_pylist(),
                       plan["kind"].to_pylist()):
        same = pred[l] == pred[r]
        if k == "distractor_near_miss":
            joined += int(same)
        else:
            total += 1
            hits += int(same)
    assert joined == 0
    assert hits / total >= 0.9, hits / total


def test_recall_on_different_seed(ray_session):
    """Generator-generalization guard: a corpus from a different seed
    (different pixels, captions, sizes) still hits full recall."""
    import ray.data
    from destor_ray.pipelines.dedup import dedup_pipeline_from_dir
    d = corpus.ensure_corpus_parquet(N, seed=7)
    out = dedup_pipeline_from_dir(d).to_pandas()
    pred = dict(zip(out.image_id, out.cluster_id))
    hits = total = joined = 0
    for i in range(N):
        kind, src = corpus.plan_for_row(i)
        if kind == "original":
            continue
        same = pred[f"img{i:010d}"] == pred[f"img{src:010d}"]
        if kind == "distractor_near_miss":
            joined += int(same)
        else:
            total += 1
            hits += int(same)
    assert joined == 0
    assert hits / total >= 0.99, hits / total


def test_rendezvous_verify_matches_inline(ray_session, corpus_dir, assignment):
    """Pair-rendezvous verify (slim band shuffle + endpoint-keyed thumb
    attach) produces the IDENTICAL cluster assignment as the default
    thumb-on-band-row path, and the identical verified pair set."""
    import ray.data
    from destor_ray.config import PRESETS
    from destor_ray.pipelines.dedup import (dedup_pipeline,
                                            signatures_from_corpus)
    from destor_ray.stages import candidates

    ds = ray.data.read_parquet(corpus_dir)
    out = dedup_pipeline(ds, PRESETS["rendezvous"],
                         n_rows_hint=N).to_pandas()
    base = dict(zip(assignment.image_id, assignment.cluster_id))
    rdv = dict(zip(out.image_id, out.cluster_id))
    assert base == rdv

    sigs = signatures_from_corpus(ds).materialize()
    def pair_set(edges_ds):
        df = edges_ds.to_pandas()
        return set(zip(df.left_id, df.right_id))
    inline = pair_set(candidates.candidate_edges(sigs))
    rdv_pairs = pair_set(
        candidates.candidate_edges_rendezvous(sigs, num_buckets=64))
    assert inline == rdv_pairs


def test_quality_rep_manifest_picks_best_member(ray_session):
    """Tier-dedup manifest: every planted multi-member cluster keeps its
    SOURCE original (largest area; ties resolve to the min image_id =
    the original), membership partitions the corpus exactly, and byte
    accounting balances."""
    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as em
    from destor_ray import corpus

    out = em.queries()["corpus_dedup_manifest"]("/root/testdata/sf0.001") \
        .to_pandas()
    n = 400
    d = corpus.ensure_corpus_parquet(n, seed=42)
    assert out.n_members.sum() == n                      # exact partition
    assert out.cluster_id.is_unique
    assert (out.saved_bytes == out.total_bytes - out.stored_bytes).all()
    assert out.saved_bytes.sum() > 0
    # every multi-member planted cluster keeps its source original
    multi = out[out.n_members > 1]
    assert len(multi) > 0
    for _, r in multi.iterrows():
        src = corpus.truth_cluster(corpus.row_index_of(r.rep_id))
        assert r.rep_id == f"img{src:010d}", (r.rep_id, src)
    # total bytes accounted == corpus bytes
    tot = 0
    files = pq.ParquetDataset(d).files
    for f in files:
        t = pq.read_table(f, columns=["bytes"])
        tot += int(np.sum([len(b) for b in t["bytes"].to_pylist()]))
    assert out.total_bytes.sum() == tot


def test_probe_index_finds_planted_sources(ray_session):
    """Online query-by-image: each planted dup query matches its source
    original; the distractor query matches nothing."""
    import __ray_entry__ as em
    from destor_ray import corpus

    out = em.queries()["corpus_probe_index"]("/root/testdata/sf0.001")
    n = 400
    last_block = (n // corpus.BLOCK) - 1
    base = last_block * corpus.BLOCK
    matches = out.groupby("query_id").match_id.apply(set).to_dict()
    for slot in (5, 7, 11, 15, 19):  # resize / exact / reencode / crop / caption_para
        qid = f"img{base + slot:010d}"
        kind, src = corpus.plan_for_row(base + slot)
        assert f"img{src:010d}" in matches.get(qid, set()), (qid, kind)
    # distractor must not match its block original
    dq = f"img{base + 3:010d}"
    _, dsrc = corpus.plan_for_row(base + 3)
    assert f"img{base:010d}" not in matches.get(dq, set())


def test_shard_matrix_covers_planted_pairs(ray_session):
    """Every planted dup pair's (shard_a, shard_b) cell must be present
    in the cross-shard attribution matrix (recall is 1.0 at this corpus
    size), cells are canonical (shard_a <= shard_b), and the matrix
    counts globally pair-deduped edges (positive, bounded by corpus
    pair volume)."""
    import numpy as np
    import __ray_entry__ as em
    from destor_ray import corpus
    from destor_ray.stages.candidates import parse_nid

    sf = "/root/testdata/sf0.001"
    shard_rows = 100
    out = em._corpus_dedup_shard_matrix(sf, shard_rows=shard_rows).to_pandas()
    assert (out["shard_a"] <= out["shard_b"]).all()
    assert (out["n_pairs"] > 0).all()
    cells = set(zip(out["shard_a"].astype(int), out["shard_b"].astype(int)))

    n = em._corpus_rows_for(sf)
    plan = corpus.dup_plan_table(n)
    n_dup = 0
    for l, r, kind in zip(plan["left_id"].to_pylist(),
                          plan["right_id"].to_pylist(),
                          plan["kind"].to_pylist()):
        if kind.startswith("distractor"):
            continue
        sa, sb = sorted((int(parse_nid([l])[0]) // shard_rows,
                         int(parse_nid([r])[0]) // shard_rows))
        assert (sa, sb) in cells, (l, r, kind)
        n_dup += 1
    assert n_dup > 0


def test_compact_small_files_certified(ray_session):
    """Compaction merges many tiny files into few blocks and the
    order-insensitive digest certifies zero row loss/corruption."""
    import __ray_entry__ as em
    out = em.queries()["compact_small_files"]("/root/testdata/sf0.001")
    row = out.iloc[0]
    assert int(row["digest_match"]) == 1
    assert int(row["n_files_after"]) < int(row["n_files_before"])
    assert int(row["n_rows"]) > 0


def test_kcore_planted_fixpoint(ray_session, tmp_path):
    """Planted graph: a 5-clique (every node degree 4) plus a pendant
    chain hanging off it. At k=3 the chain must peel away COMPLETELY
    (cascading rounds: the tail's removal lowers its neighbor below k)
    and the clique must survive with degree 4 — the textbook k-core
    fixpoint, reached within the 3 unrolled rounds."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.graph import kcore_tokens
    # bigram edges come from adjacent tokens: encode each undirected
    # edge as its own 2-token doc
    clique = ["c0", "c1", "c2", "c3", "c4"]
    edges = [(a, b) for i, a in enumerate(clique)
             for b in clique[i + 1:]]
    edges += [("c0", "p1"), ("p1", "p2"), ("p2", "p3")]
    texts = [f"{a} {b}" for a, b in edges]
    rows = {
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = kcore_tokens(str(d), k=3, rounds=3).to_pandas()
    got = dict(zip(out["tok"], out["deg"].astype(int)))
    assert got == {c: 4 for c in clique}


def test_transactional_commit_excludes_orphan(ray_session):
    """The staged dir really contains the planted orphan file, and a
    naive directory listing WOULD double-count it — so the oracle hash
    match is non-vacuous evidence the manifest gate works."""
    import os
    import ray.data
    import __ray_entry__ as em
    out = em.queries()["transactional_commit_readback"](
        "/root/testdata/sf0.001").to_pandas()
    base = "/tmp/destor_ray_txn/sf0.001"
    names = os.listdir(base)
    assert "orphan-attempt2.parquet" in names
    n_committed = int(out["n"].sum())
    naive_paths = [f"{base}/{f}" for f in names if f.endswith(".parquet")]
    n_naive = ray.data.read_parquet(naive_paths).count()
    assert n_naive > n_committed


def test_cluster_caption_audit_planted(ray_session):
    """Caption-diversity histogram: the caption_para dup channel plants
    clusters whose members disagree on caption (diversity >= 2), while
    exact/reencode/crop clusters keep the source caption (diversity 1)
    — both buckets must be present; image totals must cover the corpus
    exactly."""
    import __ray_entry__ as em
    sf = "/root/testdata/sf0.001"
    out = em.queries()["corpus_cluster_caption_audit"](sf).to_pandas()
    n = em._corpus_rows_for(sf)
    assert int(out["n_images"].sum()) == n
    divs = set(out["n_distinct_captions"].astype(int))
    assert 1 in divs and any(d >= 2 for d in divs)
    # singleton + consistent clusters dominate
    one = int(out.loc[out["n_distinct_captions"] == 1, "n_clusters"].sum())
    multi = int(out.loc[out["n_distinct_captions"] >= 2, "n_clusters"].sum())
    assert one > multi > 0


def test_sssp_weighted_multi_hop_beats_direct(ray_session, tmp_path):
    """Planted weighted graph where the cheap path is 2 hops through
    common bigrams and the direct edge is a rare (expensive) bigram:
    Bellman-Ford must pick the 2-hop cost, BFS semantics would pick
    the 1-hop edge — pins that weights actually relax."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from destor_ray.pipelines.graph import sssp_weighted
    # edge costs: 1_000_000 // count
    # s->m and m->t each appear 10x (cost 100000); s->t once (1000000)
    texts = ["s m"] * 10 + ["m t"] * 10 + ["s t"]
    rows = {
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    out = sssp_weighted(str(d), source="s", rounds=3).to_pandas()
    got = dict(zip(out["token"], out["dist"].astype(int)))
    assert got["s"] == 0
    assert got["m"] == 100_000
    assert got["t"] == 200_000  # 2-hop beats the 1_000_000 direct edge


def test_hard_negatives_catch_distractors(ray_session):
    """Every planted distractor_near_miss pair must be mined as a hard
    negative (they band-collide by construction but fail verify), and
    NO verified duplicate pair may appear in the negative stream —
    the two streams partition the candidate set."""
    import ray.data
    import __ray_entry__ as em
    from destor_ray import corpus
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages import candidates
    from destor_ray.stages.candidates import parse_nid

    sf = "/root/testdata/sf0.001"
    out = em.queries()["corpus_hard_negatives"](sf).to_pandas()
    neg = set(map(tuple, out[["anchor", "negative"]].to_numpy()))
    neg_sym = neg | {(b, a) for a, b in neg}
    assert (out["psnr_centi"] >= 0).all()

    n = em._corpus_rows_for(sf)
    plan = corpus.dup_plan_table(n)
    n_distractors = mined = 0
    for l, r, kind in zip(plan["left_id"].to_pylist(),
                          plan["right_id"].to_pylist(),
                          plan["kind"].to_pylist()):
        if kind == "distractor_near_miss":
            n_distractors += 1
            pair = (int(parse_nid([l])[0]), int(parse_nid([r])[0]))
            mined += int(pair in neg_sym)
    # distractors that band-collide must be mined; a few never collide
    # in any band (they were never candidates), so require a majority
    # (measured: 15/20 at this corpus size)
    assert n_distractors > 0 and mined >= n_distractors // 2, \
        (mined, n_distractors)

    d = corpus.ensure_corpus_parquet(n, seed=42)
    sigs = signatures_from_corpus(ray.data.read_parquet(d)).materialize()
    edges = candidates.candidate_edges(sigs).to_pandas()
    pos = set(map(tuple, edges[["left_id", "right_id"]].to_numpy()))
    pos_sym = pos | {(b, a) for a, b in pos}
    assert not (neg_sym & pos_sym)


def test_resilient_read_quarantines_corrupt_files(ray_session):
    """Two planted corrupt files (truncated footer + garbage bytes)
    must be quarantined with their error class while every good file's
    rows survive; the naive directory read_parquet fails outright —
    pinned so the resilient path is demonstrably necessary."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data
    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    out = em.queries()["resilient_read_stats"](sf).to_pandas()
    ok = out[out["status"] == "ok"]
    bad = out[out["status"] != "ok"]
    assert int(bad["n_files"].sum()) == 2
    assert int(ok["n_files"].sum()) == 6
    n_docs = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    # good files hold all rows except those in the two corrupted shards
    assert 0 < int(ok["n_rows"].sum()) < n_docs
    with pytest.raises(Exception):
        ray.data.read_parquet("/tmp/destor_ray_resilient/sf0.001").count()


def test_storage_orphan_gc_finds_planted_orphan(ray_session):
    import __ray_entry__ as em
    out = em.queries()["storage_orphan_gc"]("/root/testdata/sf0.001") \
        .set_index("status")
    assert int(out.loc["orphan", "n_files"]) == 1
    assert int(out.loc["orphan", "total_bytes"]) > 0
    assert int(out.loc["committed", "n_files"]) >= 2


def test_user_erasure_actually_removes_rows(ray_session):
    """The rewritten store must contain zero rows for the erased user
    and fewer total rows than the source (physical erasure, not a
    view); the per-type aggregate is oracle-certified separately."""
    import pyarrow.parquet as pq
    import ray.data
    import __ray_entry__ as em
    sf = "/root/testdata/sf0.001"
    out = em.queries()["user_erasure_certified"](sf).to_pandas()
    n_after = int(out["n"].sum())
    n_before = pq.ParquetFile(f"{sf}/events.parquet").metadata.num_rows
    import duckdb
    n_user = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet') "
        "WHERE user_id = 7").fetchone()[0]
    assert n_user > 0  # the erased user existed
    assert n_after == n_before - n_user


def test_zonemap_prunes_and_loses_nothing(ray_session):
    """the zonemap skips a real fraction of shards for the mid-range
    predicate, and the pruned aggregate equals an unpruned filtered
    scan of the source table."""
    import duckdb

    import __ray_entry__ as em
    sf = "/root/testdata/sf0.001"
    out = em.queries()["zonemap_prune_stats"](sf)
    r = out.iloc[0]
    assert r.n_shards == 16
    # a 1/4-span range predicate over range shards touches ~4-6 shards
    assert 1 <= r.n_shards_scanned < r.n_shards
    ref = duckdb.sql(f"""
        WITH s AS (SELECT min(event_id) lo, max(event_id) hi
                   FROM read_parquet('{sf}/events.parquet'))
        SELECT count(*), sum(CAST(round(value*1000000) AS BIGINT))
        FROM read_parquet('{sf}/events.parquet'), s
        WHERE event_id BETWEEN lo + (hi-lo)*3//8 AND lo + (hi-lo)*5//8
    """).fetchone()
    assert (r.n_rows, r.sum_value_micro) == (ref[0], ref[1])
