"""Ingestion-scale probe for the incremental ANN index sinks.

Replicates the embeddings corpus ``--mult``× (id offsets, 64 dims
unchanged), bootstraps each index sink on the BASE corpus (training
batch), then appends the replicas as fixed-size generations and times
each append — the claim under test: append cost tracks the BATCH, not
the standing index (frozen quantizer ⇒ delta × K argmin +
touched-cell rewrite). Also reports the committed store bytes for
the raw-vector vs PQ-coded index (the codes-smaller-than-vectors
claim, measured not asserted).

Usage: python tools/supp/ann_index_scale.py [--sf-dir ...] [--mult 20]
Prints one JSON line:
  {"ivf": {"bootstrap": s, "appends": [s, ...], "store_bytes": N},
   "ivfpq": {...}, "vectors_per_gen": N, "mult": M}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F

from epe_data_wrangling_spark.session import get_spark
from epe_data_wrangling_spark.streaming.ann_index import (
    ivf_index_foreach_batch,
    ivfpq_index_foreach_batch,
)
from epe_data_wrangling_spark.streaming.sources import land_single_file

WORK = "/tmp/ann_index_scale"


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=20)
    args = ap.parse_args()
    spark = get_spark("ann_index_scale")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    base = spark.read.parquet(
        os.path.join(args.sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    n = base.count()
    gens = [base] + [
        base.select(
            (F.col("vec_id") + rep * n).alias("vec_id"), "embedding"
        )
        for rep in range(1, args.mult)
    ]

    results = {}
    for name, call in (
        (
            "ivf",
            lambda s, t, ck: ivf_index_foreach_batch(
                s, t, k_cells=8, train_iters=2, checkpoint_dir=ck
            ),
        ),
        (
            "ivfpq",
            lambda s, t, ck: ivfpq_index_foreach_batch(
                s, t, k_cells=8, train_iters=2, pq_m=4, pq_sub=16, cbk=32,
                checkpoint_dir=ck,
            ),
        ),
    ):
        work = os.path.join(WORK, name)
        landing = os.path.join(work, "landing")
        target = os.path.join(work, "state")
        ck = os.path.join(work, "ck")
        times = []
        for i, g in enumerate(gens, start=1):
            land_single_file(g, landing, f"g{i}.parquet", i)
            t0 = time.perf_counter()
            stream = (
                spark.readStream.schema(
                    "vec_id BIGINT, embedding ARRAY<FLOAT>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(landing)
            )
            call(stream, target, ck)
            times.append(round(time.perf_counter() - t0, 2))
        from epe_data_wrangling_spark.streaming.manifest import pool_store_dir

        store = "vectors" if name == "ivf" else "codes"
        results[name] = {
            "bootstrap": times[0],
            "appends": times[1:],
            "store_bytes": du(pool_store_dir(target, store)),
        }
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {**results, "vectors_per_gen": n, "mult": args.mult}
        )
    )


if __name__ == "__main__":
    main()
