"""Triage a composite suite key's driver hash mismatch: re-check each
member relation individually against its own DuckDB oracle and report
exactly which members diverge (and on what — columns, row count, or
values).  A suite hash certifies 6-8 member relations at once, which
is great for window economy and terrible for diagnosis — this is the
diagnosis tool.

    python scripts/suite_triage.py suite_tpch [--sf /root/testdata/sf0.01]
    python scripts/suite_triage.py all        # every suite, every member
"""

from __future__ import annotations

import argparse
import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suite", help="suite key name, or 'all'")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from ocr_pytorch_spark.sources.session import get_spark
    from tests.test_entry_contract import _normalize

    suites = (E._SUITES if args.suite == "all"
              else {args.suite: E._SUITES[args.suite]})
    qs, oracles = E.queries(), E.oracle_sql()
    spark = get_spark(app="suite-triage")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{args.sf}/{t}.parquet'")

    bad = 0
    for sname, members in suites.items():
        print(f"== {sname} ==")
        for m in members:
            got = qs[m](spark, args.sf).toPandas()
            want = con.sql(oracles[m]).df()
            g_cols, g_rows = _normalize(got)
            w_cols, w_rows = _normalize(want)
            if g_cols != w_cols:
                bad += 1
                print(f"  {m}: COLUMN MISMATCH {g_cols} != {w_cols}")
            elif len(g_rows) != len(w_rows):
                bad += 1
                print(f"  {m}: ROWCOUNT {len(g_rows)} != {len(w_rows)}")
            elif g_rows != w_rows:
                bad += 1
                diffs = [(a, b) for a, b in zip(g_rows, w_rows)
                         if a != b][:3]
                print(f"  {m}: VALUE MISMATCH, first diffs: {diffs}")
            else:
                print(f"  {m}: ok ({len(g_rows)} rows)")
    spark.stop()
    print(f"-- {bad} diverging member(s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
