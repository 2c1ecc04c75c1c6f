"""CLI front door: list, run, explain, and benchmark registered
queries, or run ad-hoc SQL over the registered table views.

    python -m data_pipeline_for_e_commerce_shop_spark list [pattern]
    python -m data_pipeline_for_e_commerce_shop_spark run <name> [--sf-dir D] [--limit N] [--json]
    python -m data_pipeline_for_e_commerce_shop_spark explain <name> [--sf-dir D]
    python -m data_pipeline_for_e_commerce_shop_spark sql "SELECT ..." [--sf-dir D] [--limit N] [--json]
    python -m data_pipeline_for_e_commerce_shop_spark tables [--sf-dir D]

The `sql` subcommand registers every testdata table as a temp view
first, so any ANSI query the oracles can run works here too — the
"switch from the reference" entry point for users whose workloads are
plain SQL.
"""

from __future__ import annotations

import argparse
import fnmatch
import json
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _spark(app: str):
    from data_pipeline_for_e_commerce_shop_spark.session import get_spark

    return get_spark(app_name=app)


def _register_views(spark, sf_dir: str) -> None:
    from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _emit(df, limit: int, as_json: bool) -> None:
    if as_json:
        for row in df.limit(limit).toJSON().collect():
            print(row)
    else:
        df.show(limit, truncate=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_pipeline_for_e_commerce_shop_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("pattern", nargs="?", default="*")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
            p.add_argument("--json", action="store_true")

    p_sql = sub.add_parser("sql", help="ad-hoc SQL over the table views")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_sql.add_argument("--limit", type=int, default=20)
    p_sql.add_argument("--json", action="store_true")

    p_tab = sub.add_parser("tables", help="show table schemas")
    p_tab.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    args = ap.parse_args(argv)

    from data_pipeline_for_e_commerce_shop_spark.queries import ORACLES, QUERIES

    if args.cmd == "list":
        names = [n for n in QUERIES if fnmatch.fnmatch(n, args.pattern)]
        for n in sorted(names):
            tag = "oracle" if n in ORACLES else "rows-only"
            print(f"{n}\t{tag}")
        print(f"# {len(names)} queries", file=sys.stderr)
        return 0

    if args.cmd == "tables":
        spark = _spark("cli-tables")
        from data_pipeline_for_e_commerce_shop_spark.schemas import load_table

        for t in TABLES:
            df = load_table(spark, args.sf_dir, t)
            print(f"{t}: {df.schema.simpleString()}")
        return 0

    if args.cmd in ("run", "explain"):
        if args.query not in QUERIES:
            close = [n for n in QUERIES if args.query in n]
            print(
                f"unknown query {args.query!r}"
                + (f"; did you mean: {', '.join(sorted(close)[:5])}" if close else ""),
                file=sys.stderr,
            )
            return 2
        spark = _spark(f"cli-{args.cmd}")
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
            return 0
        t0 = time.time()
        _emit(df, args.limit, args.json)
        print(
            json.dumps(
                {"query": args.query, "sec": round(time.time() - t0, 3)}
            ),
            file=sys.stderr,
        )
        return 0

    if args.cmd == "sql":
        spark = _spark("cli-sql")
        _register_views(spark, args.sf_dir)
        df = spark.sql(args.statement)
        _emit(df, args.limit, args.json)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
