"""End-to-end medallion pipeline: raw CSVs -> gates -> validated zone ->
KPI merge, including the violation twins from FIXTURES.md §5."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_for_e_commerce_shop_spark.pipeline import MedallionPipeline
from data_pipeline_for_e_commerce_shop_spark.quality.gates import (
    DataValidationError,
)

ORDERS_CSV = """order_id,user_id,status,created_at,returned_at,shipped_at,delivered_at,num_of_item
1,10,delivered,2024-03-01 10:00:00,,2024-03-01 12:00:00,2024-03-02 10:00:00,2
2,11,returned,2024-03-01 11:00:00,2024-03-05 10:00:00,,,1
3,12,shipped,2024-03-02 09:00:00,,2024-03-02 10:00:00,,1
"""

ITEMS_CSV = """id,order_id,user_id,product_id,status,created_at,shipped_at,delivered_at,returned_at,sale_price
100,1,10,500,complete,2024-03-01 10:00:00,,,,19.99
101,1,10,501,complete,2024-03-01 10:00:00,,,,5.50
102,2,11,500,returned,2024-03-01 11:00:00,,,2024-03-05 10:00:00,19.99
103,3,12,502,shipped,2024-03-02 09:00:00,,,,7.25
"""

PRODUCTS_CSV = """id,sku,cost,category,name,brand,retail_price,department
500,SKU500,10.00,widgets,Widget,BrandA,19.99,home
501,SKU501,2.00,gadgets,Gadget,BrandB,5.50,home
502,SKU502,3.00,widgets,Widget2,BrandA,7.25,garden
"""


def _write(tmp, name, content):
    p = os.path.join(tmp, name)
    with open(p, "w") as f:
        f.write(content)
    return p


@pytest.fixture()
def raw_dir(tmp_path):
    d = str(tmp_path / "raw")
    os.makedirs(d)
    return d


def test_end_to_end_batch(spark, tmp_path, raw_dir):
    paths = {
        "orders": [_write(raw_dir, "orders_part1.csv", ORDERS_CSV)],
        "order_items": [_write(raw_dir, "order_items_part1.csv", ITEMS_CSV)],
        "products": [_write(raw_dir, "products.csv", PRODUCTS_CSV)],
    }
    pipe = MedallionPipeline(spark, str(tmp_path / "zones"))
    result = pipe.run_batch(paths)
    assert result.status == "SUCCESS"
    assert all(v == 0 for v in result.ri_violation_counts.values())

    validated = spark.read.parquet(str(tmp_path / "zones/validated/order_items"))
    assert validated.count() == 4
    # per-row dt partitioning: two distinct days (reference would have
    # collapsed everything onto first() date)
    assert validated.select("dt").distinct().count() == 2

    cat = spark.read.parquet(str(tmp_path / "zones/kpis/category"))
    rows = {
        (r["category"], str(r["order_date"])): r for r in cat.collect()
    }
    assert float(rows[("widgets", "2024-03-01")]["daily_revenue"]) == pytest.approx(39.98)
    assert rows[("widgets", "2024-03-01")]["avg_return_rate"] == pytest.approx(0.5)

    okpi = spark.read.parquet(str(tmp_path / "zones/kpis/order"))
    d1 = [r for r in okpi.collect() if str(r["order_date"]) == "2024-03-01"][0]
    assert d1["total_orders"] == 2
    assert float(d1["total_revenue"]) == pytest.approx(45.48)
    assert d1["unique_customers"] == 2
    assert sorted(d1["data_sources"]) == ["order_items", "orders"]


def test_null_gate_quarantines(spark, tmp_path, raw_dir):
    bad_orders = ORDERS_CSV + "4,,delivered,2024-03-02 10:00:00,,,,1\n"
    paths = {"orders": [_write(raw_dir, "orders_part1.csv", bad_orders)]}
    pipe = MedallionPipeline(spark, str(tmp_path / "zones"))
    df, res = pipe.validate_and_load("orders", paths["orders"])
    assert df.count() == 3  # bad row removed
    rejected = spark.read.parquet(str(tmp_path / "zones/rejected/orders"))
    assert rejected.count() == 1
    assert rejected.collect()[0]["error_type"] == "NULL_VALIDATION_ERROR"


def test_null_gate_strict_raises(spark, tmp_path, raw_dir):
    bad_orders = ORDERS_CSV + "4,,delivered,2024-03-02 10:00:00,,,,1\n"
    pipe = MedallionPipeline(spark, str(tmp_path / "zones"))
    with pytest.raises(DataValidationError) as exc:
        pipe.validate_and_load(
            "orders", [_write(raw_dir, "orders.csv", bad_orders)], strict=True
        )
    assert exc.value.error_type == "NULL_VALIDATION_ERROR"


def test_ri_gate_quarantines_orphans(spark, tmp_path, raw_dir):
    orphan_items = ITEMS_CSV + "104,999,13,500,complete,2024-03-02 10:00:00,,,,1.00\n"
    paths = {
        "orders": [_write(raw_dir, "orders_part1.csv", ORDERS_CSV)],
        "order_items": [_write(raw_dir, "order_items_part1.csv", orphan_items)],
        "products": [_write(raw_dir, "products.csv", PRODUCTS_CSV)],
    }
    pipe = MedallionPipeline(spark, str(tmp_path / "zones"))
    result = pipe.run_batch(paths)
    assert result.ri_violation_counts["order_items.order_id"] == 1
    validated = spark.read.parquet(str(tmp_path / "zones/validated/order_items"))
    assert validated.count() == 4  # orphan excluded
    rejected = spark.read.parquet(str(tmp_path / "zones/rejected/order_items"))
    assert rejected.filter(F.col("error_type") == "REFERENTIAL_ERROR").count() == 1


def test_missing_header_raises(spark, tmp_path, raw_dir):
    no_header_col = ORDERS_CSV.replace("num_of_item", "wrong_name")
    pipe = MedallionPipeline(spark, str(tmp_path / "zones"))
    with pytest.raises(DataValidationError) as exc:
        pipe.validate_and_load(
            "orders", [_write(raw_dir, "orders.csv", no_header_col)]
        )
    assert exc.value.error_type == "SCHEMA_ERROR"


def test_partial_sources_converge_to_complete(spark, tmp_path, raw_dir):
    """FIXTURES §5.5: orders-only batch then items-only batch must
    coalesce to the same KPI row a complete batch produces."""
    zones_partial = str(tmp_path / "partial")
    pipe = MedallionPipeline(spark, zones_partial)
    pipe.run_batch({"orders": [_write(raw_dir, "orders_part1.csv", ORDERS_CSV)]})
    pipe.run_batch(
        {
            "order_items": [_write(raw_dir, "order_items_part1.csv", ITEMS_CSV)],
            "products": [_write(raw_dir, "products.csv", PRODUCTS_CSV)],
        }
    )
    partial = spark.read.parquet(f"{zones_partial}/kpis/order")

    zones_full = str(tmp_path / "full")
    pipe2 = MedallionPipeline(spark, zones_full)
    pipe2.run_batch(
        {
            "orders": [_write(raw_dir, "o2.csv", ORDERS_CSV)],
            "order_items": [_write(raw_dir, "i2.csv", ITEMS_CSV)],
            "products": [_write(raw_dir, "p2.csv", PRODUCTS_CSV)],
        }
    )
    full = spark.read.parquet(f"{zones_full}/kpis/order")

    key = lambda r: str(r["order_date"])  # noqa: E731
    p = {key(r): r for r in partial.collect()}
    f_ = {key(r): r for r in full.collect()}
    assert set(p) == set(f_)
    for k in f_:
        # orders-only fields came from batch 1, revenue fields from batch 2
        assert p[k]["total_orders"] == f_[k]["total_orders"]
        assert float(p[k]["total_revenue"]) == pytest.approx(
            float(f_[k]["total_revenue"])
        )
        assert p[k]["unique_customers"] == f_[k]["unique_customers"]
        assert sorted(p[k]["data_sources"]) == ["order_items", "orders"]


def test_expectation_summary_counts_and_single_scan(spark, sf_dir):
    """Every rule row is consistent (rate = violations/rows, passed ==
    (violations == 0)), and the whole suite costs ONE scan per table —
    adding a rule must never add a pass over the data."""
    import contextlib
    import io

    from data_pipeline_for_e_commerce_shop_spark.quality.gates import (
        EXPECTATIONS,
        UNIQUE_KEYS,
        expectation_summary,
    )

    df = expectation_summary(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == len(EXPECTATIONS) + len(UNIQUE_KEYS)
    for r in rows:
        assert 0 <= r["n_violations"] <= r["n_rows"]
        assert abs(r["violation_rate"] - r["n_violations"] / r["n_rows"]) < 1e-12
        assert r["passed"] == (1 if r["n_violations"] == 0 else 0)
    # plan probe: one parquet scan per distinct table in the rule set
    # (simple mode prints the tree once; formatted would repeat each
    # scan in the operator-detail and AQE initial-plan sections)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    # after execution AQE prints final + initial plan; count the final only
    plan = buf.getvalue().split("== Initial Plan ==")[0]
    n_tables = len({t for t, _, _ in EXPECTATIONS})
    assert plan.count("Scan parquet") == n_tables


def test_observed_metrics_single_pass(spark, sf_dir):
    """df.observe metrics must equal a separate aggregate — and arrive
    from the SAME action (no extra scan)."""
    from pyspark.sql import functions as F

    from data_pipeline_for_e_commerce_shop_spark.quality.gates import (
        load_with_observed_metrics,
    )
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    observed, obs = load_with_observed_metrics(spark, sf_dir)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    truth = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").isNull().cast("long")).alias(
                "n_null_price"
            ),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("long")
            ).alias("sum_cents"),
        )
        .collect()[0]
    )
    assert got["n_rows"] == truth["n_rows"]
    assert got["n_null_price"] == truth["n_null_price"]
    assert got["sum_cents"] == truth["sum_cents"]


def test_erase_user_rewrites_without_subject(spark, sf_dir, tmp_path):
    from data_pipeline_for_e_commerce_shop_spark.quality.privacy import (
        erase_user,
    )
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    p = str(tmp_path / "orders")
    load_table(spark, sf_dir, "orders").write.parquet(p)
    victim = spark.read.parquet(p).select("o_custkey").first()[0]
    audit = erase_user(spark, p, "o_custkey", victim)
    assert audit["n_erased"] > 0
    assert audit["consistent"]
    left = spark.read.parquet(p)
    assert left.where(left.o_custkey == victim).count() == 0
    assert left.count() == audit["n_after"]


def test_expire_partitions_drops_oldest(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table
    from data_pipeline_for_e_commerce_shop_spark.sources.sinks import (
        expire_partitions,
        write_partitioned,
    )

    p = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts").cast("string")
    )
    write_partitioned(ev, p, "dt")
    import os

    n_parts = len([d for d in os.listdir(p) if d.startswith("dt=")])
    assert n_parts > 3
    audit = expire_partitions(spark, p, "dt", keep_latest=3)
    assert len(audit["kept"]) == 3
    assert len(audit["dropped"]) == n_parts - 3
    remaining = spark.read.parquet(p)
    assert remaining.select("dt").distinct().count() == 3
    # partition values are type-inferred on read (date), audit keeps
    # the raw directory strings
    assert str(
        min(r[0] for r in remaining.select("dt").distinct().collect())
    ) == min(audit["kept"])


def test_erase_user_preserves_null_keys(spark, tmp_path):
    """NULL-keyed rows are not the subject and must survive erasure
    (a non-null-safe predicate silently dropped them)."""
    from data_pipeline_for_e_commerce_shop_spark.quality.privacy import (
        erase_user,
    )

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (None, "d")],
        "k long, v string",
    ).write.parquet(p)
    audit = erase_user(spark, p, "k", 1)
    assert audit["n_erased"] == 1 and audit["consistent"]
    left = spark.read.parquet(p)
    assert left.count() == 3
    assert left.where(left.k.isNull()).count() == 2


def test_expire_partitions_numeric_order_and_zero_keep(spark, tmp_path):
    """'Latest' follows the partition VALUE (9 < 10 numerically), and
    keep_latest=0 reports an empty kept list."""
    import os

    from data_pipeline_for_e_commerce_shop_spark.sources.sinks import (
        expire_partitions,
    )

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(9, 1), (10, 2), (11, 3)], "day long, x long"
    )
    df.write.partitionBy("day").parquet(p)
    audit = expire_partitions(spark, p, "day", keep_latest=2)
    assert audit["dropped"] == ["9"]
    assert sorted(audit["kept"]) == ["10", "11"]
    audit0 = expire_partitions(spark, p, "day", keep_latest=0)
    assert audit0["kept"] == []
    assert sorted(audit0["dropped"]) == ["10", "11"]
    assert not [d for d in os.listdir(p) if d.startswith("day=")]


def test_cli_list_run_sql(capsys):
    """The CLI front door: list filters, run executes a registered
    query, sql answers ad-hoc statements over the table views."""
    from data_pipeline_for_e_commerce_shop_spark.__main__ import main

    assert main(["list", "dedup_*"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact\toracle" in out

    assert main(
        ["run", "null_gate", "--sf-dir", "/root/testdata/sf0.001",
         "--limit", "5", "--json"]
    ) == 0
    out = capsys.readouterr().out
    assert '"n_null_user"' in out or "{" in out

    assert main(
        ["sql", "SELECT COUNT(*) AS n FROM region",
         "--sf-dir", "/root/testdata/sf0.001", "--json"]
    ) == 0
    out = capsys.readouterr().out
    assert '"n":5' in out.replace(" ", "")

    assert main(["run", "no_such_query"]) == 2
