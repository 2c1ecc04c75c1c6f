"""ANN quality: the approximate paths (LSH multi-probe, IVF) must
recover a meaningful fraction of the exact brute-force top-k, and every
pair they return must carry the same exact re-scored cosine the
brute-force path computes for it."""

from __future__ import annotations

import pytest

from data_pipeline_for_e_commerce_shop_spark.operators import similarity


@pytest.fixture(scope="module")
def brute(spark, sf_dir):
    return {
        (r.query_id, r.corpus_id): r.cosine
        for r in similarity.brute_force_topk(spark, sf_dir).collect()
    }


def _recall_and_score_check(approx_rows, brute):
    hits = [r for r in approx_rows if (r.query_id, r.corpus_id) in brute]
    # Exact re-scoring: any recovered pair has the identical cosine.
    for r in hits:
        assert r.cosine == brute[(r.query_id, r.corpus_id)]
    return len(hits) / len(brute)


def test_lsh_multiprobe_recall(spark, sf_dir, brute):
    rows = similarity.lsh_topk(spark, sf_dir).collect()
    assert _recall_and_score_check(rows, brute) >= 0.25


def test_lsh_multiprobe_beats_single_bucket(spark, sf_dir, brute):
    single = similarity.lsh_topk(spark, sf_dir, multi_probe=False).collect()
    multi = similarity.lsh_topk(spark, sf_dir).collect()
    assert _recall_and_score_check(multi, brute) >= _recall_and_score_check(
        single, brute
    )


def test_ivf_recall(spark, sf_dir, brute):
    rows = similarity.ivf_topk(spark, sf_dir).collect()
    assert _recall_and_score_check(rows, brute) >= 0.25


def test_topk_shape(spark, sf_dir):
    """Each path returns <= k rows per query with rank 1..k and
    monotonically non-increasing cosine."""
    for fn in (
        similarity.brute_force_topk,
        similarity.lsh_topk,
        similarity.ivf_topk,
    ):
        rows = fn(spark, sf_dir, k=5).collect()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            assert len(rs) <= 5
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            cosines = [r.cosine for r in rs]
            assert cosines == sorted(cosines, reverse=True)
