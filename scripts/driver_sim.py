"""Local replica of the per-round driver correctness check.

Runs every ``queries()`` entry (and, with ``--extra``, every
``extra_queries()`` entry) against its DuckDB oracle at the given scale
factor, comparing row count, column names, and order-insensitive values with
columns sorted by name — the same mismatch surface CORRECTNESS_r{N}.json
grades.  Usage:

    python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01] [--extra]
        [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    # the ONE canonical normalization, shared with tests/test_entry.py — the
    # two surfaces must grade the identical mismatch surface
    from tests.normalize import norm_result

    return norm_result(df)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--extra", action="store_true", help="also run extra_queries()")
    ap.add_argument("--only", default="", help="comma-separated subset of names")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as em

    qs_all = {**em.queries(), **em.extra_queries()}
    oracles = {**em.oracle_sql(), **em.extra_oracle_sql()}
    if args.only:
        # --only may name extra-tier queries directly; unknown names are an
        # ERROR (a typo must not produce a passing zero-query run)
        keep = set(args.only.split(","))
        unknown = keep - set(qs_all)
        if unknown:
            ap.error(f"unknown query name(s): {sorted(unknown)}")
        qs = {k: v for k, v in qs_all.items() if k in keep}
    else:
        qs = qs_all if args.extra else dict(em.queries())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results, n_fail = {}, 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            got = _norm(fn(spark, args.sf_dir).toPandas())
            if name not in oracles:
                # mirror the driver's weaker rows-only check for documented
                # non-SQL-expressible queries (tests/test_entry.py ROWS_ONLY)
                results[name] = {
                    "rows_only": True, "spark_rows": int(len(got)),
                    "sec": round(time.monotonic() - t0, 2), "err": None,
                }
                print(f"ROWSONLY {name:30s} rows={len(got)} "
                      f"{time.monotonic() - t0:9.2f}s", flush=True)
                continue
            want = _norm(con.execute(oracles[name]).fetchdf())
            rows = bool(len(got) == len(want))
            schema = bool(list(got.columns) == list(want.columns))
            if rows and schema:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, atol=1e-9)
                    hash_m = True
                except AssertionError:
                    hash_m = False
            else:
                hash_m = False
            ok = rows and schema and hash_m
            results[name] = {
                "rows_match": rows, "schema_match": schema, "hash_match": hash_m,
                "spark_rows": int(len(got)), "oracle_rows": int(len(want)),
                "sec": round(time.monotonic() - t0, 2), "err": None,
            }
        except Exception as e:  # noqa: BLE001 — report, keep going
            ok = False
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300],
                             "sec": round(time.monotonic() - t0, 2)}
        n_fail += 0 if ok else 1
        print(f"{'MATCH' if ok else 'FAIL '} {name:32s} {results[name]['sec']:6.2f}s",
              flush=True)

    print(json.dumps({"checked": len(results), "failed": n_fail}))
    out = os.environ.get("DRIVER_SIM_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
