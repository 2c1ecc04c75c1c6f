"""Property tests for the corpus-assembly operators (packing, shuffle/
split, source mixing) plus the dedup representative election and the
random-projection reduction — invariants the oracle hash can't state
directly (contiguity, partition-ness, boundedness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.operators import corpus, dedup, similarity
from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def test_pack_offsets_are_contiguous_per_shard(spark):
    """Documents tile each shard stream head-to-tail: every offset
    equals the previous document's offset + length, starting at 0."""
    rows = (
        corpus.pack_sequences(spark, SF)
        .orderBy("source", "doc_id")
        .collect()
    )
    assert rows
    pos: dict[str, int] = {}
    for r in rows:
        expect = pos.get(r.source, 0)
        assert r.offset_in_shard == expect, (r.source, r.doc_id)
        pos[r.source] = expect + r.n_tokens
        assert r.pack_id == expect // corpus.CTX_TOKENS
        assert r.n_packs_spanned >= 1


def test_pack_spans_match_token_extent(spark):
    """A doc spans exactly the packs its [offset, offset+n) token
    interval touches."""
    for r in corpus.pack_sequences(spark, SF).collect():
        first = r.offset_in_shard // corpus.CTX_TOKENS
        last = (r.offset_in_shard + r.n_tokens - 1) // corpus.CTX_TOKENS
        assert (r.pack_id, r.n_packs_spanned) == (first, last - first + 1)


def test_shuffle_split_partitions_corpus(spark):
    df = corpus.shuffle_split(spark, SF)
    docs = load_table(spark, SF, "documents")
    assert df.count() == docs.count()
    assert df.select("doc_id").distinct().count() == docs.count()
    by_split = dict(
        df.groupBy("split").count().collect()
    )
    n = docs.count()
    # hash draws: expect roughly 80/10/10 (loose bounds at tiny sf)
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split.get("train", 0) > n // 2
    bad = df.where(
        (F.col("shuffle_bucket") < 0) | (F.col("shuffle_bucket") >= 1024)
    ).count()
    assert bad == 0


def test_shuffle_key_order_is_deterministic(spark):
    a = [r.doc_id for r in corpus.shuffle_split(spark, SF).orderBy("shuffle_key", "doc_id").collect()]
    b = [r.doc_id for r in corpus.shuffle_split(spark, SF).orderBy("shuffle_key", "doc_id").collect()]
    assert a == b and a != sorted(a)


def test_source_mix_keeps_bottleneck_fully(spark):
    kept = corpus.source_mix(spark, SF)
    docs = load_table(spark, SF, "documents")
    supply = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept_counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    cuts = {r.source: r.cut_ppm for r in kept.select("source", "cut_ppm").distinct().collect()}
    # at least one source hits cut_ppm == 1e6 (the bottleneck keeps all)
    full = [s for s, c in cuts.items() if c == 1_000_000]
    assert full, cuts
    for s in full:
        assert kept_counts[s] == supply[s]
    for s, n in kept_counts.items():
        assert n <= supply[s]


def test_cluster_reps_are_members(spark):
    reps = dedup.cluster_representatives(spark, SF)
    clusters = {
        (r.doc_id, r.cluster_id)
        for r in dedup.duplicate_clusters(spark, SF).collect()
    }
    rows = reps.collect()
    assert rows
    for r in rows:
        assert (r.rep_doc_id, r.cluster_id) in clusters
        assert r.n_members >= 2  # clusters come from candidate PAIRS


def test_random_projection_shape_and_bounds(spark):
    df = similarity.random_projection_reduce(spark, SF)
    n_vec = load_table(spark, SF, "embeddings").count()
    assert df.count() == n_vec * similarity.N_PROJ_DIMS
    mx = df.agg(F.max(F.abs(F.col("r")))).first()[0]
    assert mx <= 64 * 1_000_000
    # components are not degenerate (some nonzero)
    assert df.where(F.col("r") != 0).count() > 0


def test_snapshot_diff_statuses(spark):
    rows = corpus.snapshot_diff(spark, SF).collect()
    assert rows
    by_status: dict[str, set[int]] = {}
    for r in rows:
        by_status.setdefault(r.status, set()).add(r.doc_id)
    # added = docs missing from the previous snapshot (doc_id % 7 == 3)
    # minus those deleted since (doc_id % 13 == 5)
    for d in by_status.get("added", ()):
        assert d % 7 == 3 and d % 13 != 5
    for d in by_status.get("removed", ()):
        assert d % 13 == 5 and d % 7 != 3
    for d in by_status.get("changed", ()):
        assert d % 11 == 0 and d % 7 != 3 and d % 13 != 5


def test_quality_sample_threshold_consistency(spark):
    kept = corpus.quality_weighted_sample(spark, SF)
    rows = kept.collect()
    assert rows
    for r in rows:
        assert r.cut_ppm <= corpus.QUALITY_ACCEPT_PPM
        # cut really is the floor of quality * peak
        assert r.cut_ppm == int(r.quality_score * corpus.QUALITY_ACCEPT_PPM)
    # acceptance rate lands between the min and max possible quality
    n_docs = load_table(spark, SF, "documents").count()
    assert 0 < len(rows) < n_docs


def test_pipeline_funnel_monotone(spark):
    """Each funnel stage strictly narrows: docs >= gated >= exact >=
    final; token totals only count final survivors."""
    rows = corpus.pipeline_funnel(spark, SF).collect()
    assert rows
    langs = {r.lang for r in rows}
    assert langs == {r.lang for r in load_table(spark, SF, "documents").select("lang").distinct().collect()}
    for r in rows:
        assert r.n_docs >= r.n_gated >= r.n_after_exact >= r.n_final >= 0
        if r.n_final == 0:
            assert r.n_tokens_final == 0


def test_stateful_sessionize_group_state_carry():
    """Drive the applyInPandasWithState fold function directly across
    two micro-batches with a stub state: batch 2 must EXTEND the open
    session when within the gap, and OPEN a new one past the gap."""
    import pandas as pd

    from data_pipeline_for_e_commerce_shop_spark.streaming import stateful

    class StubState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    def batch(rows):
        return [pd.DataFrame(rows, columns=["epoch_sec", "event_id", "cents"])]

    st = StubState()
    out1 = list(
        stateful._sessionize_group((7,), batch([(100, 1, 10), (150, 2, 5)]), st)
    )[0]
    assert out1.to_dict("records") == [
        {"user_id": 7, "session_no": 0, "session_start": 100,
         "session_end": 150, "n_events": 2, "cents": 15}
    ]
    # batch 2a: within gap of 150 -> extends session 0
    out2 = list(
        stateful._sessionize_group((7,), batch([(200, 3, 1)]), st)
    )[0]
    assert out2.to_dict("records") == [
        {"user_id": 7, "session_no": 0, "session_start": 100,
         "session_end": 200, "n_events": 3, "cents": 16}
    ]
    # batch 3: past the gap -> NEW session 1 (session 0 already emitted)
    out3 = list(
        stateful._sessionize_group((7,), batch([(500, 4, 2), (1000, 5, 3)]), st)
    )[0]
    assert out3.to_dict("records") == [
        {"user_id": 7, "session_no": 1, "session_start": 500,
         "session_end": 500, "n_events": 1, "cents": 2},
        {"user_id": 7, "session_no": 2, "session_start": 1000,
         "session_end": 1000, "n_events": 1, "cents": 3},
    ]


def test_split_leakage_consistency(spark):
    """Every reported leak pair must be an LSH candidate pair with
    genuinely different split assignments; within-split pairs must
    never appear."""
    from data_pipeline_for_e_commerce_shop_spark.operators import dedup as D

    leaks = corpus.split_leakage(spark, SF).collect()
    splits = {r.doc_id: r.split for r in corpus.shuffle_split(spark, SF).collect()}
    pairs = {(r.doc_a, r.doc_b) for r in D.lsh_candidate_pairs(spark, SF).collect()}
    for r in leaks:
        assert (r.doc_a, r.doc_b) in pairs
        assert splits[r.doc_a] == r.split_a != r.split_b == splits[r.doc_b]
    n_cross = sum(1 for a, b in pairs if splits[a] != splits[b])
    assert len(leaks) == n_cross


def test_dedup_token_audit_ledger(spark, tmp_path):
    """The before/after ledger on a corpus with KNOWN duplicates: one
    language with a 3-copy family, one clean — exact docs/token math."""
    from pyspark.sql import functions as F  # noqa: N812

    from data_pipeline_for_e_commerce_shop_spark.operators.corpus import (
        dedup_token_audit,
    )

    rows = [
        (1, "a b c", "en"),        # 3 tokens, kept (min of family)
        (2, "a b c", "en"),        # dup, dropped
        (3, "a b c", "en"),        # dup, dropped
        (4, "x y", "en"),          # unique, kept
        (5, "u v w z", "de"),      # unique, kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["lang"]: r for r in dedup_token_audit(spark, str(tmp_path)).collect()
    }
    en, de = out["en"], out["de"]
    assert (en["docs_before"], en["docs_after"]) == (4, 2)
    assert (en["tokens_before"], en["tokens_after"]) == (11, 5)
    assert en["removed_token_ppm"] == 6 * 1_000_000 // 11
    assert (de["docs_before"], de["docs_after"]) == (1, 1)
    assert de["removed_token_ppm"] == 0


def test_fixed_size_sample_exact_and_stable(spark, sf_dir):
    """Exactly n rows, and the SAME n rows on a re-run (determinism
    df.sample cannot give)."""
    from data_pipeline_for_e_commerce_shop_spark.operators.corpus import (
        fixed_size_sample,
    )

    a = sorted(r["doc_id"] for r in fixed_size_sample(spark, sf_dir, 37).collect())
    b = sorted(r["doc_id"] for r in fixed_size_sample(spark, sf_dir, 37).collect())
    assert len(a) == 37 and a == b


def test_budget_selection_respects_budget_and_greedy_order(spark):
    """Kept tokens must not exceed the budget; no skipped doc with a
    HIGHER score than a kept doc may exist (greedy property); and the
    boundary bucket must be the lowest kept score."""
    from pyspark.sql import functions as F

    from data_pipeline_for_e_commerce_shop_spark.operators.corpus import (
        TOKEN_BUDGET,
        budget_selection,
    )

    sf = "/root/testdata/sf0.001"
    kept = budget_selection(spark, sf).collect()
    total = sum(r["n_tokens"] for r in kept)
    assert 0 < total <= TOKEN_BUDGET
    scores = sorted({r["score_ppm"] for r in kept})
    boundary_scores = {
        r["score_ppm"] for r in kept if r["decision"] == "boundary"
    }
    assert len(boundary_scores) <= 1
    if boundary_scores:
        assert boundary_scores == {scores[0]}  # boundary = lowest kept


def test_dedup_aware_split_never_leaks(spark):
    """THE guarantee: no LSH candidate pair may straddle splits, and
    every cluster maps to exactly one split."""
    from data_pipeline_for_e_commerce_shop_spark.operators.corpus import (
        dedup_aware_split,
    )
    from data_pipeline_for_e_commerce_shop_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    sf = "/root/testdata/sf0.001"
    split = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in dedup_aware_split(spark, sf).collect()
    }
    pairs = lsh_candidate_pairs(spark, sf).collect()
    assert pairs, "no candidate pairs — leakage test would be vacuous"
    for p in pairs:
        assert split[p["doc_a"]][1] == split[p["doc_b"]][1], p
    by_cluster: dict = {}
    for _, (cid, sp) in split.items():
        by_cluster.setdefault(cid, set()).add(sp)
    assert all(len(v) == 1 for v in by_cluster.values())
