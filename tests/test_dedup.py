"""Dedup-clustering semantics: the connected-components output must be
consistent with the candidate-pair graph it was built from."""

from __future__ import annotations

from collections import defaultdict

from data_pipeline_for_e_commerce_shop_spark.operators import dedup


def test_duplicate_clusters_consistent(spark, sf_dir):
    pairs = dedup.lsh_candidate_pairs(spark, sf_dir).collect()
    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(spark, sf_dir).collect()
    }
    # Every matched pair ends up in the same cluster (transitivity).
    for p in pairs:
        assert clusters[p.doc_a] == clusters[p.doc_b]
    # The cluster id IS the canonical survivor: the minimum member.
    members = defaultdict(list)
    for d, c in clusters.items():
        members[c].append(d)
    for c, ms in members.items():
        assert c == min(ms)
    # Exactly the nodes that appear in some pair are clustered.
    in_pairs = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    assert set(clusters) == in_pairs
