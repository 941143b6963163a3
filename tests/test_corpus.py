import numpy as np

from destor_ray import codec, corpus


def test_row_determinism():
    a = corpus.generate_row(42, 123)
    b = corpus.generate_row(42, 123)
    assert a == b
    c = corpus.generate_row(43, 123)
    assert c["bytes"] != a["bytes"]


def test_exact_dup_is_byte_identical():
    kind, src = corpus.plan_for_row(7)
    assert kind == "exact"
    assert corpus.generate_row(42, 7)["bytes"] == corpus.generate_row(42, src)["bytes"]
    assert corpus.generate_row(42, 7)["caption"] == corpus.generate_row(42, src)["caption"]


def test_reencode_near_dup_psnr():
    kind, src = corpus.plan_for_row(11)
    assert kind == "reencode"
    a = codec.decode(corpus.generate_row(42, 11)["bytes"])
    b = codec.decode(corpus.generate_row(42, src)["bytes"])
    assert corpus.generate_row(42, 11)["bytes"] != corpus.generate_row(42, src)["bytes"]
    assert codec.psnr(a, b) >= 38.0


def test_verify_separation_across_blocks():
    """thumb-PSNR separates true dups from distractors for many rows."""
    dup_scores, distractor_scores = [], []
    for i in range(0, 600):
        kind, src = corpus.plan_for_row(i)
        if kind == "original":
            continue
        t1 = codec.thumbnail(codec.decode(corpus.generate_row(42, i)["bytes"]))
        t2 = codec.thumbnail(codec.decode(corpus.generate_row(42, src)["bytes"]))
        score = codec.thumb_psnr(t1, t2)
        if kind == "distractor_near_miss":
            distractor_scores.append(score)
        else:
            dup_scores.append(score)
    assert min(dup_scores) >= 26.0, min(dup_scores)
    assert max(distractor_scores) < 24.0, max(distractor_scores)


def test_caption_para_overlap():
    kind, src = corpus.plan_for_row(19)
    assert kind == "caption_para"
    a = corpus.generate_row(42, 19)
    b = corpus.generate_row(42, src)
    assert a["caption"] != b["caption"]
    assert a["bytes"] == b["bytes"]  # same image


def test_hot_cluster_plan():
    hot_block = corpus.HOT_EVERY - 1
    i = hot_block * corpus.BLOCK + 7
    kind, src = corpus.plan_for_row(i)
    assert src == 0


def test_dup_plan_table():
    t = corpus.dup_plan_table(100)
    assert set(t.column_names) == {"left_id", "right_id", "kind", "cluster_id"}
    assert t.num_rows == 30  # 6 dup slots per 20-row block


def test_sources_dispatch(ray_session):
    """sources.read_table: parquet path works (column-pruned); lance
    paths raise a clear error while the package is absent."""
    import pytest
    from destor_ray import corpus, sources
    d = corpus.ensure_corpus_parquet(40, seed=42)
    ds = sources.read_table(d, columns=["image_id"])
    assert ds.count() == 40
    assert ds.schema().names == ["image_id"]
    if not sources.have_lance():
        with pytest.raises(ImportError):
            sources.read_table("/tmp/nonexistent.lance")
