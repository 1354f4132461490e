"""Dump a query's CANONICAL NORMALIZED rows — the exact form the
correctness gate hashes — to stdout, one TSV line per row.

Purpose (judge r12 item 5): when the driver reports `hash_match:
false` with rows+schema green and the strict local gate passes, the
divergence is environment-sensitive (JVM locale, engine version). The
debugging loop then needs a value-by-value diff between the two
environments instead of another round of guessing. Run this ON EACH
BOX and `diff` the outputs:

    python tools/dump_query_output.py q449_try_arithmetic_safe_lane \
        > /tmp/local.tsv               # spark side (default)
    python tools/dump_query_output.py --oracle q449_... > /tmp/ora.tsv
    diff /tmp/local.tsv /tmp/ora.tsv   # first differing row = the bug

Usage:
    python tools/dump_query_output.py [--oracle] [--sf SF_DIR] NAME...

Output format: a `# name cols=<sorted col list>` header, then one
tab-separated line per normalized row (columns sorted by name, rows
sorted — identical to tools/check_correctness.py::normalize, so two
dumps hash-match iff the gate would). STRICT_FLOATS=1 applies here
too.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import normalize  # noqa: E402


def _dump(name: str, cols: list[str], rows: list[tuple]) -> None:
    order = sorted(cols)
    sys.stdout.write(f"# {name} cols={order} n={len(rows)}\n")
    for r in normalize(rows, cols):
        sys.stdout.write("\t".join("NULL" if v is None else str(v) for v in r))
        sys.stdout.write("\n")


def main() -> int:
    args = sys.argv[1:]
    use_oracle = "--oracle" in args
    if use_oracle:
        args.remove("--oracle")
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        print(__doc__)
        return 2

    from airflow_scraping_etl_tutorial_spark.plans import all_queries

    specs = all_queries()
    unknown = [n for n in args if n not in specs]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2

    if use_oracle:
        import duckdb

        from airflow_scraping_etl_tutorial_spark.sources.tables import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for n in args:
            spec = specs[n]
            if not spec.oracle:
                print(f"# {n} HAS NO ORACLE (rows-only entry)", file=sys.stderr)
                continue
            rel = con.sql(spec.oracle)
            _dump(n, list(rel.columns), rel.fetchall())
    else:
        from airflow_scraping_etl_tutorial_spark.session import get_spark

        spark = get_spark("dump_query_output")
        for n in args:
            df = specs[n].fn(spark, sf_dir)
            _dump(n, df.columns, [tuple(r) for r in df.collect()])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
