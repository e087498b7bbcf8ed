"""Drive every catalog query under a VANILLA SparkSession (Spark 4
defaults: ANSI on, no tuned confs) — catches cast/overflow bugs the
tuned session hides. Rows-only execution (the oracle comparison is
verify_local's job); exit 1 on any query raising.

Usage: python tools/vanilla_drive.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    from epe_data_wrangling_spark.catalog import all_queries

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.sql.shuffle.partitions", "24")
        # the tuned session needs 8g for localCheckpoint-heavy
        # trainers; keep parity so an OOM is never mistaken for an
        # ANSI failure (conf must precede JVM launch — this tool runs
        # standalone)
        .config("spark.driver.memory", "8g")
        .appName("vanilla_drive")
        .getOrCreate()
    )
    # the whole point is Spark 4 DEFAULTS (ANSI on): a reused tuned
    # session or a spark-defaults.conf flipping ANSI off would make
    # every pass vacuous — fail loudly instead (an explicit check,
    # not `assert`, which `python -O` strips)
    if spark.conf.get("spark.sql.ansi.enabled") != "true":
        print(
            "error: vanilla_drive requires ANSI mode "
            "(spark.sql.ansi.enabled=true); got a non-default session"
        )
        return 2
    qs = all_queries()
    unknown = only - qs.keys()
    if unknown:
        print(f"error: unknown queries: {sorted(unknown)}")
        return 2
    fails = []
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            n = len(q.fn(spark, sf_dir).collect())
            print(f"ok {name} rows={n} [{time.time() - t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001 — report-and-continue sweep
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
    print(f"\n{len(fails)} vanilla failures" + (f": {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
