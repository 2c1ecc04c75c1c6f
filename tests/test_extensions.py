"""Semantic invariants for the round-2 extension operators — properties
the value-hash parity gate can't state (it only proves Spark == DuckDB,
not that both are right)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.operators import (
    dedup,
    retention,
    text,
)

SF = "/root/testdata/sf0.001"


def test_incremental_decisions_partition_the_batch(spark):
    df = dedup.incremental_dedup(spark, SF).cache()
    try:
        n_batch = df.count()
        # decision is a total function of the two flags, in precedence order
        bad = df.where(
            (F.col("is_exact_dup") & (F.col("decision") != "drop_exact"))
            | (
                ~F.col("is_exact_dup")
                & F.col("is_near_dup")
                & (F.col("decision") != "drop_near")
            )
            | (
                ~F.col("is_exact_dup")
                & ~F.col("is_near_dup")
                & (F.col("decision") != "keep")
            )
        ).count()
        assert bad == 0
        # every batch doc gets exactly one verdict row
        assert df.select("doc_id").distinct().count() == n_batch
    finally:
        df.unpersist()


def test_incremental_exact_dup_is_also_band_dup(spark):
    """An identical text shares every minhash band, so exact dups must
    be a subset of band-level near dups — a cross-check that the two
    probes ran over the same corpus split."""
    df = dedup.incremental_dedup(spark, SF)
    violations = df.where(
        F.col("is_exact_dup") & ~F.col("is_near_dup")
    ).count()
    assert violations == 0


def test_cohort_offset_zero_matches_cohort_size(spark):
    """month_offset=0 counts every customer in the cohort (each customer
    orders in their own first month, by construction)."""
    tri = retention.cohort_retention(spark, SF).cache()
    try:
        assert tri.where(F.col("month_offset") < 0).count() == 0
        sizes = tri.where(F.col("month_offset") == 0)
        total_offset0 = sizes.agg(F.sum("n_customers")).first()[0]
        n_customers = (
            tri.sparkSession.read.parquet(f"{SF}/orders.parquet")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert total_offset0 == n_customers
    finally:
        tri.unpersist()


def test_cumulative_users_monotone_and_totals(spark):
    rows = (
        retention.cumulative_active_users(spark, SF)
        .orderBy("day")
        .collect()
    )
    assert rows, "no event days"
    running = 0
    for r in rows:
        running += r.n_new_users
        assert r.cum_users == running
    # final cumulative == distinct users overall
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert running == ev.select("user_id").distinct().count()


def test_quality_gate_reasons_consistent(spark):
    df = text.quality_gate(spark, SF)
    assert df.where(F.col("keep") & (F.col("reasons") != "")).count() == 0
    assert df.where(~F.col("keep") & (F.col("reasons") == "")).count() == 0


def test_zipf_ranks_dense_and_ordered(spark):
    rows = text.zipf_top_terms(spark, SF, k=10).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_rolling_7d_bounds_daily_actives(spark):
    """active_7d on day D must be >= the 1-day distinct count for D and
    <= the all-time distinct user count."""
    from data_pipeline_for_e_commerce_shop_spark.operators.retention import (
        rolling_active_users,
    )

    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    ev = load_table(spark, SF, "events")
    daily = (
        ev.select(
            F.to_date(F.col("ts")).alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("d1"))
    )
    total = ev.select("user_id").distinct().count()
    joined = rolling_active_users(spark, SF).join(daily, "day").collect()
    assert joined
    for r in joined:
        assert r.d1 <= r.active_7d <= total


def test_basket_pairs_are_ordered_and_real(spark):
    from data_pipeline_for_e_commerce_shop_spark.operators.basket import (
        part_pair_topk,
    )

    rows = part_pair_topk(spark, SF, k=10).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    for r in rows:
        assert r.part_a < r.part_b
        # n_orders really is the co-occurrence count for that pair
        n = (
            li.where(F.col("l_partkey") == r.part_a)
            .select("l_orderkey")
            .join(
                li.where(F.col("l_partkey") == r.part_b).select("l_orderkey"),
                "l_orderkey",
            )
            .count()
        )
        assert n == r.n_orders


def test_pivot_matches_long_form(spark):
    """The wide pivot must agree with the long groupBy it reshapes."""
    from data_pipeline_for_e_commerce_shop_spark.operators.kpis import (
        monthly_status_pivot,
    )
    from data_pipeline_for_e_commerce_shop_spark.functions.scalars import (
        money_sum,
    )

    wide = {r.month: r for r in monthly_status_pivot(spark, SF).collect()}
    long = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(
            F.trunc(F.to_date("o_orderdate"), "MM").alias("month"),
            "o_orderstatus",
        )
        .agg(money_sum("o_totalprice").alias("rev"))
        .collect()
    )
    assert long
    for r in long:
        got = getattr(wide[r.month], f"revenue_{r.o_orderstatus.lower()}")
        assert got == r.rev


def test_chunks_reassemble_to_document(spark):
    """Stride-24/width-32 chunks: dropping each chunk's 8-token overlap
    tail reconstructs the original token stream."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        CHUNK_STRIDE,
        chunk_documents,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    chunks = chunk_documents(spark, SF).collect()
    seen = {}
    for c in chunks:
        toks = c.chunk_text.split(" ")
        assert c.n_tokens == len(toks)
        seen.setdefault(c.doc_id, {})[c.chunk_id] = toks
    for doc_id, by_id in seen.items():
        rebuilt = []
        for cid in sorted(by_id):
            rebuilt.extend(by_id[cid][:CHUNK_STRIDE] if cid < max(by_id) else by_id[cid])
        # overlap-trimmed concat must equal the source tokens
        assert rebuilt == docs[doc_id], f"doc {doc_id} mismatch"
    assert set(seen) == {d for d, t in docs.items() if t != [""]}


def test_quantization_bounds_and_reconstruction(spark):
    from data_pipeline_for_e_commerce_shop_spark.operators.similarity import (
        quantize_embeddings,
    )

    q = quantize_embeddings(spark, SF).cache()
    try:
        assert q.where((F.col("q") > 127) | (F.col("q") < -127)).count() == 0
        # every vector emits exactly 64 positions
        bad = (
            q.groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("i").alias("d"))
            .where((F.col("n") != 64) | (F.col("d") != 64))
            .count()
        )
        assert bad == 0
        # dequantized norm ~ 127 (unit vector scaled): mean |q| can't be 0
        assert q.agg(F.max(F.abs("q"))).first()[0] > 0
    finally:
        q.unpersist()


def test_outlier_z_scores_against_plain_python(spark):
    import statistics

    from data_pipeline_for_e_commerce_shop_spark.operators.outliers import (
        price_outliers,
    )

    rows = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_mktsegment", "o_totalprice")
        .collect()
    )
    import collections

    by_seg = collections.defaultdict(list)
    for r in rows:
        by_seg[r.c_mktsegment].append(int(r.o_totalprice * 100) // 1)
    expected = set()
    for seg, cents in by_seg.items():
        m = statistics.fmean(cents)
        sd = statistics.stdev(cents)
        for r in rows:
            if r.c_mktsegment != seg:
                continue
            z = (int(r.o_totalprice * 100) - m) / sd
            if abs(round(z, 6)) >= 1.7:
                expected.add(r.o_orderkey)
    got = {r.o_orderkey for r in price_outliers(spark, SF).collect()}
    # Python fmean/stdev use different summation order than the exact
    # decimal moments — allow edge flips only at the threshold boundary
    assert len(got.symmetric_difference(expected)) <= max(1, len(expected) // 50)


def test_ordered_funnel_monotone(spark):
    from data_pipeline_for_e_commerce_shop_spark.operators.events import (
        ordered_funnel,
    )

    r = ordered_funnel(spark, SF).first()
    assert r.n_view >= r.n_view_click >= r.n_full_funnel >= 0
    assert r.n_view > 0


def test_apply_in_pandas_centroids(spark):
    from data_pipeline_for_e_commerce_shop_spark.operators.similarity import (
        label_centroids_pandas,
    )

    rows = label_centroids_pandas(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels
    assert sum(r.n_vectors for r in rows) == emb.count()
    for r in rows:
        assert r.dim == 64 and len(r.centroid) == 64
        # mean of unit-ish vectors: norm strictly between 0 and 1
        assert 0 < r.centroid_norm < 1


def test_contamination_benchmark_docs_excluded_and_bounded(spark):
    from data_pipeline_for_e_commerce_shop_spark.operators.dedup import (
        benchmark_contamination,
    )

    df = benchmark_contamination(spark, SF).cache()
    try:
        assert df.where((F.col("doc_id") % 20) == 0).count() == 0
        assert (
            df.where(
                (F.col("contamination") < 0)
                | (F.col("contamination") > 1)
                | (F.col("n_contaminated") > F.col("n_shingles"))
            ).count()
            == 0
        )
        assert (
            df.where(
                F.col("flagged") != (F.col("contamination") >= 0.5)
            ).count()
            == 0
        )
    finally:
        df.unpersist()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_event = st.tuples(st.integers(0, 5), st.integers(0, 2))  # tiny sec domain -> ties


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    histories=st.lists(st.lists(_event, min_size=0, max_size=8), min_size=1, max_size=6)
)
def test_funnel_fold_equals_min_chain(spark, histories):
    """Property: the sorted-array fold (Spark) computes exactly the
    3-level min-chain (fv; min click >= fv; min purchase >= fc) for any
    event sequence, including equal-second ties."""
    from data_pipeline_for_e_commerce_shop_spark.operators.events import (
        FUNNEL_FOLD_EXPR,
    )

    rows = [
        (uid, s, r)
        for uid, hist in enumerate(histories)
        for (s, r) in hist
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id INT, s BIGINT, r INT")
    got = {
        r.user_id: (r.st.fv, r.st.fc, r.st.fp)
        for r in df.select(
            "user_id", F.struct("s", "r").alias("e")
        )
        .groupBy("user_id")
        .agg(F.expr(FUNNEL_FOLD_EXPR).alias("st"))
        .collect()
    }

    def chain(events):
        views = [s for s, r in events if r == 0]
        fv = min(views) if views else None
        fc = fp = None
        if fv is not None:
            clicks = [s for s, r in events if r == 1 and s >= fv]
            fc = min(clicks) if clicks else None
        if fc is not None:
            purch = [s for s, r in events if r == 2 and s >= fc]
            fp = min(purch) if purch else None
        return fv, fc, fp

    for uid, hist in enumerate(histories):
        if hist:
            assert got[uid] == chain(hist), (uid, hist)


def test_new_vs_returning_partitions_actives(spark):
    rows = retention.new_vs_returning(spark, SF).collect()
    assert rows
    assert sum(r.n_new for r in rows) == (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.n_new + r.n_returning == r.n_active
        assert r.n_new >= 0 and r.n_returning >= 0
    # the first month has no returning customers
    first = min(rows, key=lambda r: r.month)
    assert first.n_returning == 0


def test_revenue_share_sums_to_one_per_month(spark):
    from collections import defaultdict

    from data_pipeline_for_e_commerce_shop_spark.operators.kpis import (
        category_revenue_share,
    )

    by_month = defaultdict(float)
    for r in category_revenue_share(spark, SF).collect():
        assert 0 <= r.share <= 1
        by_month[r.month] += r.share
    assert by_month
    for m, tot in by_month.items():
        assert abs(tot - 1.0) < 1e-9, (m, tot)


def test_repetition_ratios_consistent(spark):
    """word_rep_ratio and top_word_ratio must agree with a plain-Python
    recount of the same document, and top_word_count is a frequency,
    so it is bounded by n_words and at least ceil(n/ndistinct)."""
    rows = text.repetition_scores(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert rows
    for r in rows[:50]:
        ws = docs[r["doc_id"]].split(" ")
        assert r["n_words"] == len(ws)
        assert r["n_distinct_words"] == len(set(ws))
        top = max(ws.count(w) for w in set(ws))
        assert r["top_word_count"] == top
        assert abs(r["top_word_ratio"] - top / len(ws)) < 1e-12
        tgs = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        assert r["n_trigrams"] == len(tgs)
        exp_tri = 1.0 - len(set(tgs)) / len(tgs) if tgs else 0.0
        assert abs(r["trigram_dup_ratio"] - exp_tri) < 1e-12


def test_ann_recall_bounds_and_lsh_quality(spark):
    from data_pipeline_for_e_commerce_shop_spark.operators import similarity

    rows = similarity.ann_recall(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["lsh_recall"] <= 1.0
        assert 0.0 <= r["ivf_recall"] <= 1.0


def test_scd2_intervals_tile_each_customer(spark):
    """Per customer: versions are 1..n, intervals are ordered,
    valid_to equals the next version's valid_from, exactly one open
    interval (the last), and n_orders sums to the customer's orders."""
    from collections import defaultdict

    from data_pipeline_for_e_commerce_shop_spark.operators import scd

    hist = scd.priority_history(spark, SF).collect()
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .count()
        .collect()
    )
    order_counts = {r["o_custkey"]: r["count"] for r in orders}
    by_cust = defaultdict(list)
    for r in hist:
        by_cust[r["custkey"]].append(r)
    assert by_cust
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["n_orders"] for r in rows) == order_counts[cust]
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] <= a["last_seen"] <= b["valid_from"]
            # adjacent islands must differ in the tracked attribute
            assert a["priority"] != b["priority"]
        assert rows[-1]["valid_to"] is None


def test_minhash_estimate_calibration_invariants(spark):
    rows = dedup.minhash_estimate_quality(spark, SF).collect()
    assert rows  # LSH finds candidates in the seeded-dup corpus
    for r in rows:
        assert 0 <= r["n_match_components"] <= 8
        assert r["est_jaccard"] == r["n_match_components"] / 8
        assert 0.0 <= r["jaccard"] <= 1.0
        assert abs(abs(r["est_jaccard"] - r["jaccard"]) - r["abs_err"]) == 0
        # identical texts must agree on every signature component
        if r["jaccard"] == 1.0:
            assert r["n_match_components"] == 8


def test_rare_token_scores_consistent(spark):
    scored = {r["doc_id"]: r for r in text.rare_token_scores(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(scored) == len(docs)
    # independent recomputation in plain python
    from collections import Counter

    freq = Counter()
    for d in docs:
        freq.update(d["text"].split(" "))
    corpus_tokens = sum(freq.values())
    vocab = len(freq)
    for d in docs:
        toks = d["text"].split(" ")
        n_rare = sum(1 for t in toks if freq[t] * vocab < corpus_tokens)
        r = scored[d["doc_id"]]
        assert r["n_tokens"] == len(toks)
        assert r["n_rare_tokens"] == n_rare
        assert r["min_token_freq"] == min(freq[t] for t in toks)
        assert r["rare_frac"] == n_rare / len(toks)


def test_pii_scan_generic_operator(spark):
    from data_pipeline_for_e_commerce_shop_spark.quality.privacy import pii_scan

    rows = [
        ("two mails a@b.com and c.d@e-f.org here", 2, 0, 0),
        ("ip 192.168.0.1 and 10.0.0.255", 0, 2, 0),
        ("call 555-1234 or 555-0000", 0, 0, 2),
        ("clean text no pii at all", 0, 0, 0),
        ("mixed a@b.co 1.2.3.4 555-9999", 1, 1, 1),
        # version strings are NOT ipv4 (word boundary + 4 octets)
        ("release v1.2.3 is out", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(t,) for t, *_ in rows], ["payload"]
    )
    got = {r["payload"]: r for r in pii_scan(df, "payload").collect()}
    for t, n_email, n_ip, n_phone in rows:
        r = got[t]
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (
            n_email,
            n_ip,
            n_phone,
        ), t
    assert got["mixed a@b.co 1.2.3.4 555-9999"]["redacted_text"] == (
        "mixed [EMAIL] [IP] [PHONE]"
    )
    assert got["clean text no pii at all"]["redacted_text"] == (
        "clean text no pii at all"
    )


def test_pagerank_bounds_and_python_replay(spark):
    """Replay the integer PageRank trajectory in plain python from the
    raw lineitem pairs and require equality; check the damped floor."""
    from collections import Counter, defaultdict

    from data_pipeline_for_e_commerce_shop_spark.operators.graph import (
        PR_D_DEN,
        PR_D_NUM,
        PR_ITER,
        PR_SCALE,
        part_pagerank,
    )

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    w = Counter()
    for ps in baskets.values():
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                w[(a, b)] += 1
    edges = defaultdict(list)
    for (a, b), n in w.items():
        if n >= 2:
            edges[a].append((b, n))
            edges[b].append((a, n))
    outw = {u: sum(n for _, n in vs) for u, vs in edges.items()}
    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // PR_D_DEN
    pr = {u: PR_SCALE for u in edges}
    for _ in range(PR_ITER):
        inflow = defaultdict(int)
        for u, vs in edges.items():
            for v, n in vs:
                inflow[v] += pr[u] * n // outw[u]
        pr = {u: base + PR_D_NUM * inflow[u] // PR_D_DEN for u in edges}

    got = {r["part_id"]: r["pr"] for r in part_pagerank(spark, SF).collect()}
    assert got == pr
    assert all(v >= base for v in got.values())


def test_rate_anomaly_python_replay(spark):
    """Replay the trailing z-score from raw events in plain python."""
    import math
    from collections import Counter, defaultdict

    from data_pipeline_for_e_commerce_shop_spark.operators.events import (
        rate_anomaly,
    )
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    ev = load_table(spark, SF, "events").collect()
    counts = Counter(
        (r["event_type"], int(r["ts"].timestamp()) // 3600 * 3600)
        for r in ev
    )
    series = defaultdict(list)
    for (et, h), n in counts.items():
        series[et].append((h, n))
    expect = {}
    for et, pts in series.items():
        pts.sort()
        for i, (h, n) in enumerate(pts):
            tr = pts[max(0, i - 24) : i]
            cnt, s1 = len(tr), sum(x for _, x in tr)
            s2 = sum(x * x for _, x in tr)
            var_num = cnt * s2 - s1 * s1
            if cnt >= 12 and var_num > 0:
                z = round(
                    (cnt * n - s1)
                    / (cnt * math.sqrt(var_num * 1.0 / (cnt * cnt))),
                    9,
                )
                expect[(et, h)] = (n, cnt, z, abs(z) >= 3.0)
            else:
                expect[(et, h)] = (n, cnt, None, False)

    got = {
        (r["event_type"], r["hour_epoch"]): (
            r["n_events"],
            r["trail_cnt"],
            r["z_score"],
            r["is_anomaly"],
        )
        for r in rate_anomaly(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for key in expect:
        g, e = got[key], expect[key]
        assert g[:2] == e[:2], key
        if e[2] is None:
            assert g[2] is None, key
        else:
            assert g[2] is not None and abs(g[2] - e[2]) < 1e-9, key
        assert g[3] == e[3], key


def test_phrase_search_contiguity_and_repeats(spark, tmp_path):
    """Phrase hits must be CONTIGUOUS (a doc containing all words
    scattered must not match) and back-to-back repeats must each
    count."""
    from pyspark.sql import functions as F
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        phrase_search,
    )

    rows = [
        (1, "x slow hash batch y", "en"),                       # 1 hit
        (2, "slow hash batch slow hash batch", "en"),           # 2 hits
        (3, "slow x hash y batch", "en"),                       # scattered: 0
        (4, "hash batch slow", "en"),                           # wrong order: 0
        (5, "slow hash slow hash batch", "en"),                 # 1 (at idx 2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(spark, d).collect()
    }
    assert got == {1: 1, 2: 2, 5: 1}


def test_bpe_merges_known_corpus(spark, tmp_path):
    """BPE on a constructed corpus with a known trajectory: round 1
    must merge the most frequent pair, the merged symbol must then
    participate as a unit (greedy, no re-merge of the just-built
    token), and ties must break lexicographically."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        bpe_merges,
    )

    # 'abab' x3 and 'ab' x2: pair (a,b) count = 3*2+2 = 8, (b,a) = 3.
    # After merging (a,b)->'ab': words are [ab,ab] x3, [ab] x2 ->
    # round 2 pair is (ab, ab) with count 3.
    rows = [
        (1, "abab abab abab ab ab", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges(spark, d, rounds=2).collect()
    ]
    assert got == [(1, "a", "b", 8), (2, "ab", "ab", 3)]


def test_nb_classifier_learns_separable_corpus(spark, tmp_path):
    """On a corpus with disjoint per-language vocabularies the
    held-out confusion matrix must be diagonal, and an OOV-only test
    doc must fall back to the prior argmax (majority language, lang
    asc on ties)."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        NB_TEST_MOD,
        nb_language_classifier,
    )

    rows = []
    did = 0
    # Train+test docs: ids 0,5,10.. land in the test split.
    for _ in range(10):
        for lang, words in [("xx", "foo bar baz"), ("yy", "qux quux corge")]:
            rows.append((did, words, lang))
            did += 1
    # One OOV-only doc in the test split (id divisible by NB_TEST_MOD):
    while did % NB_TEST_MOD != 0:
        did += 1
    rows.append((did, "zzz www vvv", "yy"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in nb_language_classifier(spark, d).collect()
    }
    # Separable vocab -> every in-vocab test doc classified correctly.
    assert got[("xx", "xx")] >= 1 and got[("yy", "yy")] >= 1
    assert ("xx", "yy") not in got
    # The OOV doc scored by priors alone: both langs have equal doc
    # counts, so the tie breaks to 'xx' (lang asc) -> one yy->xx cell.
    assert got.get(("yy", "xx"), 0) == 1


def test_backfill_split_is_nonvacuous(spark):
    """The backfill equivalence only matters if late arrivals touch a
    strict subset of hours: some hours recomputed, some passed
    through."""
    from data_pipeline_for_e_commerce_shop_spark.operators.events import (
        LATE_ARRIVAL_MOD,
    )
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        (F.unix_timestamp("ts").cast("long") / 3600).cast("long").alias("hr"),
        "event_id",
    )
    all_hours = ev.select("hr").distinct().count()
    late_hours = (
        ev.where(F.col("event_id") % LATE_ARRIVAL_MOD == 0)
        .select("hr")
        .distinct()
        .count()
    )
    assert 0 < late_hours < all_hours


def test_bigram_ce_flags_shuffled_text(spark, tmp_path):
    """The bigram term must punish destroyed local structure: a
    corpus of repeated natural bigrams scores LOWER cross-entropy
    than the same tokens in scrambled order (unigram CE would tie
    them)."""
    from data_pipeline_for_e_commerce_shop_spark.operators.text import (
        bigram_cross_entropy,
    )

    natural = "the cat sat on the mat " * 5
    scrambled = "mat the on sat the cat " * 2 + "cat mat sat the on the " * 3
    rows = [(1, natural.strip(), "en"), (2, scrambled.strip(), "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r["ce_nats"] for r in bigram_cross_entropy(spark, d).collect()}
    assert got[1] < got[2], got


# ---------------------------------------------------------------------------
# round-3 session-3 additions: invariants the parity gate can't state


def test_skyline_members_are_mutually_nondominating(spark):
    """No skyline member may dominate another (they'd both be on the
    frontier only if incomparable or equal), and every non-member must
    be dominated by some member — frontier soundness + completeness
    against a brute-force pass in plain Python."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    sky = {
        (r["p_partkey"], int(r["price"] * 100), r["p_size"])
        for r in QUERIES["part_skyline"](spark, SF).collect()
    }
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    allp = [
        (r["p_partkey"], int(r["cents"]), r["p_size"])
        for r in load_table(spark, SF, "part")
        .select(
            "p_partkey",
            F.floor(F.col("p_retailprice") * 100).cast("long").alias("cents"),
            "p_size",
        )
        .collect()
    ]

    def dominates(q, p):
        return (q[1] <= p[1] and q[2] >= p[2]) and (q[1] < p[1] or q[2] > p[2])

    members = [(k, c, s) for (k, c, s) in allp if (k, c, s) in sky]
    non_members = [(k, c, s) for (k, c, s) in allp if (k, c, s) not in sky]
    for m in members:
        assert not any(dominates(q, m) for q in members if q[0] != m[0]), m
    for p in non_members:
        assert any(dominates(q, p) for q in members), p


def test_revenue_recognition_conserves_cents(spark):
    """Largest-remainder proration must conserve money EXACTLY: the sum
    of monthly recognized revenue equals the sum of line cents (joined
    lines only) to the cent."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    monthly = QUERIES["revenue_recognition"](spark, SF)
    total_out = monthly.agg(
        F.sum(F.round(F.col("recognized_revenue") * 100).cast("long"))
    ).collect()[0][0]
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders").select("o_orderkey")
    total_in = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")))
        .collect()[0][0]
    )
    assert total_out == total_in


def test_table_fingerprint_changes_on_any_row_edit(spark, tmp_path):
    """The fingerprint must move if any single row changes — write a
    copy of `part` with one mutated row and compare against the
    original through the same canonical fold."""
    from data_pipeline_for_e_commerce_shop_spark.queries import (
        _FP_CANON,
        _FP_MOD,
    )
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    def fp(df):
        expr = _FP_CANON["part"]
        h = df.select(
            F.conv(F.substring(F.md5(F.expr(expr)), 1, 15), 16, 10)
            .cast("long")
            .alias("h")
        )
        partial = h.groupBy((F.col("h") % 4096).alias("b")).agg(
            (F.sum(F.col("h") % _FP_MOD) % _FP_MOD).alias("hp")
        )
        return partial.agg((F.sum("hp") % _FP_MOD)).collect()[0][0]

    orig = load_table(spark, SF, "part")
    mutated = orig.withColumn(
        "p_size",
        F.when(F.col("p_partkey") == 1, F.col("p_size") + 1).otherwise(
            F.col("p_size")
        ),
    )
    assert fp(orig) != fp(mutated)
    # and permuting row order must NOT move it
    assert fp(orig.orderBy(F.col("p_name").desc())) == fp(orig)


def test_kmv_exact_when_audience_fits_sketch(spark):
    """KMV contract: any audience with fewer than K distinct users must
    be estimated EXACTLY (the sketch holds the whole audience)."""
    from data_pipeline_for_e_commerce_shop_spark.operators import dedup as _d  # noqa: F401
    from data_pipeline_for_e_commerce_shop_spark.queries import KMV_K, QUERIES
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    exact = {
        (r["event_type"]): r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = QUERIES["kmv_theta_overlap"](spark, SF).collect()
    for r in rows:
        for t, est in ((r["type_a"], r["est_a"]), (r["type_b"], r["est_b"])):
            if exact[t] < KMV_K:
                assert est == float(exact[t]), (t, est, exact[t])


def test_hhi_bounds_and_monopoly_detection(spark):
    """HHI must lie in (0, 1e6] ppm and a single-supplier category
    must score ~1e6 (within the floor bias of share quantization)."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    rows = QUERIES["category_hhi"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["hhi_ppm"] <= 1_000_000
        if r["n_suppliers"] == 1:
            assert r["hhi_ppm"] >= 999_998


def test_gap_interpolation_is_between_anchors(spark):
    """Interpolated values must lie in [min(prev,next), max(prev,next)]
    and observed hours must pass through untouched."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    rows = QUERIES["events_gap_interpolate"](spark, SF).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for evs in by_type.values():
        evs.sort(key=lambda r: r["hour_epoch"])
        obs = [
            (i, r["cents_filled"])
            for i, r in enumerate(evs)
            if r["fill_kind"] == "obs"
        ]
        for i, r in enumerate(evs):
            if r["fill_kind"] != "interp":
                continue
            prev = max((o for o in obs if o[0] < i), key=lambda o: o[0])
            nxt = min((o for o in obs if o[0] > i), key=lambda o: o[0])
            lo, hi = min(prev[1], nxt[1]), max(prev[1], nxt[1])
            assert lo <= r["cents_filled"] <= hi


def test_containment_catches_embedded_docs(spark, tmp_path):
    """A document that is a strict shingle-subset of another must be
    flagged with containment 1.0 from the short side when the LSH
    bands surface the pair — build a tiny corpus where they must."""
    import os

    from data_pipeline_for_e_commerce_shop_spark.operators import dedup as _d

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (1, base + " phi chi psi omega extra tokens here", "en", "s", 1),
            (2, base, "en", "s", 1),
            (3, "totally different words entirely unrelated text", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = _d.containment_pairs(spark, d).collect()
    pair = [r for r in out if {r["doc_a"], r["doc_b"]} == {1, 2}]
    assert pair, "embedded doc pair not surfaced"
    r = pair[0]
    short_side = (
        r["containment_a_ppm"] if r["n_a"] < r["n_b"] else r["containment_b_ppm"]
    )
    assert short_side == 1_000_000


def test_position_attribution_conserves_conversion_cents(spark):
    """U-shaped credits must sum exactly to the conversion cents of
    sessions that HAVE pre-purchase touches (purchases with no prior
    touch get no credit row — by construction)."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    out = QUERIES["events_position_attribution"](spark, SF)
    total_out = out.agg(
        F.sum(F.round(F.col("attributed_revenue") * 100).cast("long"))
    ).collect()[0][0]
    # independent replay of which conversions have touches
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table
    from pyspark.sql import Window

    ev = load_table(spark, SF, "events")
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(sec, "event_id")
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            sec.alias("epoch_sec"),
            F.when((sec - F.lag(sec).over(w)) > 90, 1).otherwise(0).alias("ns"),
        )
        .withColumn("session_no", F.sum("ns").over(w2))
        .withColumn(
            "okey", F.col("epoch_sec") * 100000 + F.col("event_id") % 100000
        )
    )
    conv = numbered.groupBy("user_id", "session_no").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("okey"))
        ).alias("pkey"),
        F.min(F.col("okey")).alias("first_key"),
    ).where(F.col("pkey").isNotNull())
    # sessions whose first purchase has at least one earlier event
    with_touch = conv.where(F.col("first_key") < F.col("pkey"))
    total_in = (
        numbered.join(with_touch, ["user_id", "session_no"])
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("okey") == F.col("pkey"))
        )
        .agg(F.sum("cents"))
        .collect()[0][0]
    )
    assert total_out == total_in


def test_ips_complementary_policies_average_to_full_mean(spark):
    """IPS identity: the two always-one-arm policies partition logged
    traffic, so (V(arm0) + V(arm1)) / 2 must equal the full mean
    reward exactly (same doubles, same division order)."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    rows = {
        r["policy"]: r
        for r in QUERIES["offline_policy_ips"](spark, SF).collect()
    }
    v0 = rows["always_arm_0"]["ips_value"]
    v1 = rows["always_arm_1"]["ips_value"]
    ev = load_table(spark, SF, "events").where(
        F.col("event_type") == "purchase"
    )
    full = ev.agg(
        (
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            / F.count(F.lit(1))
            / 100.0
        ).alias("m")
    ).collect()[0]["m"]
    assert abs((v0 + v1) / 2 - full) < 1e-9


def test_trade_matrix_conserves_total_revenue(spark):
    """Every joined line lands in exactly one (cust_nation,
    supp_nation, year) cell: matrix total == joined-fact total."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    m = QUERIES["nation_trade_matrix"](spark, SF)
    total_m = m.agg(
        F.sum(F.round(F.col("revenue") * 100).cast("long"))
    ).collect()[0][0]
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders").select("o_orderkey")
    total = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")))
        .collect()[0][0]
    )
    assert total_m == total


def test_market_share_sums_to_million_within_floor_bias(spark):
    """Per (region, year), supplier-nation shares must sum to 1e6 ppm
    minus at most (#nations - 1) floor losses."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    rows = QUERIES["supplier_market_share"](spark, SF).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["cust_region"], r["yr"]), []).append(
            r["share_ppm"]
        )
    for (reg, yr), shares in groups.items():
        s = sum(shares)
        assert 1_000_000 - len(shares) < s <= 1_000_000, (reg, yr, s)


def test_encoding_advisor_flags_low_cardinality_as_dict_or_rle(spark):
    """returnflag/linestatus have ~3 values on millions of rows — the
    advisor must never suggest PLAIN for them."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    rows = {
        r["col"]: r for r in QUERIES["lineitem_encoding_advisor"](spark, SF).collect()
    }
    assert rows["returnflag"]["advice"] in ("DICT", "RLE")
    assert rows["linestatus"]["advice"] in ("DICT", "RLE")
    assert rows["returnflag"]["n_distinct"] <= 5


def test_revenue_bridge_effects_sum_to_total(spark):
    """The walk identity: price + volume + cross + new + exited must
    equal the month-over-month total change EXACTLY (integer cents)."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    for r in QUERIES["revenue_bridge"](spark, SF).collect():
        lhs = round(
            (
                r["price_effect"]
                + r["volume_effect"]
                + r["cross_effect"]
                + r["new_parts"]
                + r["exited_parts"]
            )
            * 100
        )
        rhs = round(r["total_change"] * 100)
        assert lhs == rhs, (r["month"], lhs, rhs)


def test_peak_concurrency_bounds(spark):
    """Peak concurrent sessions per day is at least 1 and no more than
    that day's session count."""
    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES
    from data_pipeline_for_e_commerce_shop_spark.operators import events as _e

    peaks = {
        r["day_epoch"]: r["peak_concurrent"]
        for r in QUERIES["events_peak_concurrency"](spark, SF).collect()
    }
    sess = _e.sessionize(spark, SF)
    per_day = {
        r["d"]: r["n"]
        for r in sess.groupBy(
            F.expr("session_start div 86400").alias("d")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert peaks
    for d, peak in peaks.items():
        assert 1 <= peak <= per_day[d], (d, peak, per_day.get(d))


def test_peak_concurrency_hypothesis_vs_brute(spark, tmp_path):
    """Hypothesis: on arbitrary small event streams, the sweep-line
    peak matches a pure-Python interval-overlap brute force that
    replays the same sessionizer and the same close-before-open tie
    rule."""
    import datetime as dt
    import os

    from hypothesis import given, settings, strategies as st

    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    base = dt.datetime(2020, 1, 1)
    ev = st.tuples(
        st.integers(min_value=1, max_value=4),      # user_id
        st.integers(min_value=0, max_value=600),    # seconds offset
    )

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=25))
    def check(rows):
        counter[0] += 1
        d = str(tmp_path / f"pc{counter[0]}")
        os.makedirs(d, exist_ok=True)
        data = [
            (i + 1, base + dt.timedelta(seconds=s), u, "view", 1.0, "{}")
            for i, (u, s) in enumerate(rows)
        ]
        spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["day_epoch"]: r["peak_concurrent"]
            for r in QUERIES["events_peak_concurrency"](spark, d).collect()
        }
        # pure-Python replay
        per_user: dict = {}
        for i, (u, s) in enumerate(rows):
            per_user.setdefault(u, []).append((s, i + 1))
        sessions = []
        for evs in per_user.values():
            evs.sort()
            s0 = prev = evs[0][0]
            for s, _ in evs[1:]:
                if s - prev > 90:
                    sessions.append((s0, prev))
                    s0 = s
                prev = s
            sessions.append((s0, prev))
        deltas = []
        for s0, s1 in sessions:
            deltas.append((s0, 1))
            deltas.append((s1 + 1, -1))
        deltas.sort()  # (t, delta): -1 sorts before +1 at equal t
        cur = peak = 0
        for _, dl in deltas:
            cur += dl
            peak = max(peak, cur)
        day = (int(base.timestamp())) // 86400
        assert got == {day: peak}, (got, peak, sessions)

    check()


def test_revenue_bridge_hypothesis_identity_and_effects(spark, tmp_path):
    """Hypothesis: on arbitrary small (part, month) baskets the bridge
    effects equal a pure-Python decomposition and always sum to the
    total change."""
    import os

    from hypothesis import given, settings, strategies as st

    from data_pipeline_for_e_commerce_shop_spark.queries import QUERIES

    line = st.tuples(
        st.integers(min_value=1, max_value=3),    # partkey
        st.integers(min_value=0, max_value=2),    # month index
        st.integers(min_value=100, max_value=50000),  # cents
        st.integers(min_value=1, max_value=9),    # qty
    )

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(st.lists(line, min_size=1, max_size=15))
    def check(rows):
        counter[0] += 1
        d = str(tmp_path / f"rb{counter[0]}")
        os.makedirs(d, exist_ok=True)
        months = ["2020-01-15", "2020-02-15", "2020-03-15"]
        data = [
            (pk, months[m], cents / 100.0, float(q))
            for (pk, m, cents, q) in rows
        ]
        spark.createDataFrame(
            data,
            "l_partkey long, l_shipdate string,"
            " l_extendedprice double, l_quantity double",
        ).selectExpr(
            "l_partkey",
            "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate",
            "l_extendedprice",
            "l_quantity",
        ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        out = QUERIES["revenue_bridge"](spark, d).collect()
        # pure-Python: per (part, month-idx) rollup.  The engine's
        # money convention is floor(price_double * 100) — and
        # cents/100.0*100 can floor one cent LOW (201 -> 2.01 ->
        # 200.999... -> 200), so the reference must quantize through
        # the SAME double round-trip or it disagrees with BOTH
        # engines (hypothesis found cents=201).
        import math

        pm: dict = {}
        for pk, m, cents, q in rows:
            eng_cents = math.floor((cents / 100.0) * 100)
            c, qq = pm.get((pk, m), (0, 0))
            pm[(pk, m)] = (c + eng_cents, qq + q)
        # month-by-month decomposition (month 0 has no predecessor:
        # everything current is 'new'; month 3 exists only as the
        # exit bucket of month-2 parts)
        results: dict = {}
        for m in (0, 1, 2, 3):
            pe = ve = ce = new = exited = tot = 0
            for pk in (1, 2, 3):
                cur = pm.get((pk, m))
                prev = pm.get((pk, m - 1))
                if cur and prev:
                    c1, q1 = cur
                    c0, q0 = prev
                    u1, u0 = c1 // q1, c0 // q0
                    pe += (u1 - u0) * q0
                    ve += u0 * (q1 - q0)
                    ce += (u1 - u0) * (q1 - q0) + (c1 - u1 * q1) - (
                        c0 - u0 * q0
                    )
                    tot += c1 - c0
                elif cur and not prev:
                    new += cur[0]
                    tot += cur[0]
                elif prev and not cur:
                    exited -= prev[0]
                    tot -= prev[0]
            if pe or ve or ce or new or exited or tot or any(
                (pk, m) in pm or (pk, m - 1) in pm for pk in (1, 2, 3)
            ):
                results[m] = (pe, ve, ce, new, exited, tot)
        got = {}
        for r in out:
            m_idx = int(r["month"].strftime("%m"))  # 2,3,4 for months 1..3
            got[m_idx - 1] = tuple(
                round(r[k] * 100)
                for k in (
                    "price_effect",
                    "volume_effect",
                    "cross_effect",
                    "new_parts",
                    "exited_parts",
                    "total_change",
                )
            )
        for m, vals in got.items():
            exp = results.get(m, (0, 0, 0, 0, 0, 0))
            assert vals == exp, (m, vals, exp)
            assert sum(vals[:5]) == vals[5]

    check()
