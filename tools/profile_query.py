"""Profile one catalog query: input split counts, formatted physical
plan, and warm two-pass timings at a given scale factor.

Usage: python tools/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from epe_data_wrangling_spark.catalog import all_queries  # noqa: E402
from epe_data_wrangling_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[name]
    df = q.fn(spark, sf_dir)
    print(f"== {name} @ {sf_dir} ==")
    df.explain("formatted")
    for i in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"pass {i}: {time.perf_counter() - t0:.2f}s"
              + ("  (cold: includes codegen JIT)" if i == 0 else ""))


if __name__ == "__main__":
    main()
