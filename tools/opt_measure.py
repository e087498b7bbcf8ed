"""Optimization-round measurement harness (r16).

For each named catalog query (default: the headline set), captures
`.explain("formatted")` into plans/<round>/<query>_<tag>.txt and times
N noop-sink passes (bench.py methodology: per-query sf0.001 warm-up
first so codegen JIT is not billed), printing one JSON line per query
and a total.

Usage:
  python tools/opt_measure.py --tag before [--passes 2] [--sf-dir D] [query ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epe_data_wrangling_spark.catalog import all_queries  # noqa: E402
from epe_data_wrangling_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--round", default="r16")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(repo, "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    qs = all_queries()
    names = args.queries or sorted(n for n, q in qs.items() if q.headline)

    spark = get_spark("opt_measure")
    spark.sparkContext.setLogLevel("ERROR")

    # same infra warm-up as bench.py
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.sources.tables import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(100_000)
        .groupBy((F.col("id") % 101).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    r = load_table(spark, args.sf_dir, "region")
    n = load_table(spark, args.sf_dir, "nation")
    n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).count()
    spark.range(1_000).mapInPandas(lambda it: it, "id long").count()

    warm_dir = os.path.join(os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001")
    results: dict[str, list[float]] = {}
    for name in names:
        q = qs[name]
        if os.path.isdir(warm_dir):
            try:
                q.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                # a failed warm-up silently skews the first measured
                # pass (it absorbs codegen/JIT cost) — say so
                print(
                    f"WARN: sf0.001 warm-up failed for {name}: "
                    f"{type(e).__name__}: {str(e)[:200]}",
                    file=sys.stderr,
                )
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
        times = []
        for i in range(args.passes):
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            if i == 0 and not args.no_plans:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
                ) as f:
                    f.write(f"== {name} @ {args.sf_dir} [{args.tag}] ==\n")
                    f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(json.dumps({"query": name, "tag": args.tag, "times": times}))
    best = {n: min(t) for n, t in results.items()}
    print(
        json.dumps(
            {
                "tag": args.tag,
                "total_best": round(sum(best.values()), 3),
                "best": best,
            }
        )
    )


if __name__ == "__main__":
    main()
