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

DRIFT MODE (``--drift G``): measures what the frozen quantizer
CANNOT see — an embedding distribution that moves away from the
bootstrap training corpus. G generations are appended, generation g
shifted by ``g * --drift-step`` in every dimension; after each append
the probe records (a) the sink's meta-carried cell-occupancy skew
(max/mean live rows — the ingest-time witness that triggers the
retrain advisory) and (b) recall@k of probed serve vs exact
brute-force over the standing corpus, with queries drawn from the
NEWEST generation (the realistic serving case: fresh queries look
like fresh data). Prints {"drift_step": s, "k": k,
"gens": [{"gen", "skew", "max_cell", "mean_cell",
"recall_p2", "recall_p4"}]}.

REMEDIATE (``--drift G --remediate``): after the last drifted
generation, runs `ivf_index_retrain` on the standing target and
appends one more row (gen="retrain") with the same metrics plus the
retrain wall time — measuring that the advisory's remediation
actually restores what drift destroyed (scan_frac back to ~probe/k,
skew back toward 1) without losing recall.
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


def _drift_mode(spark, args) -> None:
    """Frozen-quantizer drift probe — see module docstring."""
    from epe_data_wrangling_spark.functions import vectors as V
    from epe_data_wrangling_spark.streaming.ann_index import ivf_index_topk
    from pyspark.sql import Window

    NQ, K = 20, 5
    base = spark.read.parquet(
        os.path.join(args.sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    n = base.count()
    work = os.path.join(WORK, "drift")
    landing = os.path.join(work, "landing")
    target = os.path.join(work, "state")
    ck = os.path.join(work, "ck")

    def shifted(g: int):
        return base.select(
            (F.col("vec_id") + g * n).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(float(g * args.drift_step))
            ).cast("array<float>").alias("embedding"),
        )

    def brute_topk(corpus, queries):
        ev = corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).withColumn("vv", V.dot(F.col("v"), F.col("v")))
        q = queries.withColumn("qq", V.dot(F.col("qv"), F.col("qv")))
        d2 = F.round(
            ((F.col("qq") - 2 * V.dot(F.col("qv"), F.col("v"))) + F.col("vv"))
            * F.lit(1e9)
        ).cast("bigint")
        w = Window.partitionBy("query_id").orderBy("d2_r", "neighbor_id")
        return (
            ev.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                d2.alias("d2_r"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
            .select("query_id", "neighbor_id")
        )

    def recall(corpus, queries, probe: int) -> float:
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_topk(corpus, queries).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_index_topk(
                spark, target, queries, probe=probe, k=K
            ).collect()
        }
        return round(len(exact & approx) / max(len(exact), 1), 3)

    rows = []
    corpus = None
    for g in range(args.drift + 1):
        gen = shifted(g)
        land_single_file(gen, landing, f"g{g + 1}.parquet", g + 1)
        stream = (
            spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        ivf_index_foreach_batch(
            stream, target, k_cells=8, train_iters=2, checkpoint_dir=ck
        )
        corpus = gen if corpus is None else corpus.union(gen)
        meta = json.load(open(os.path.join(target, "_ivm_meta.json")))
        cell_counts = {int(b): c for b, c in meta["cell_counts"].items()}
        counts = list(cell_counts.values())
        total = sum(counts)
        queries = gen.orderBy("vec_id").limit(NQ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )

        def scan_frac(probe: int) -> float:
            # mean fraction of the corpus a query's probed cells hold —
            # the metric drift actually destroys first (the hot cell
            # swallows the corpus, so probing it IS scanning it)
            cents = {
                int(r["cid"]): r["c"]
                for r in spark.read.parquet(
                    os.path.join(target, "centroids")
                ).collect()
            }
            fr = []
            for q in queries.collect():
                d2 = sorted(
                    (
                        sum((a - b) ** 2 for a, b in zip(q["qv"], c)),
                        cid,
                    )
                    for cid, c in cents.items()
                )
                probed = [cid for _, cid in d2[:probe]]
                fr.append(
                    sum(cell_counts.get(c, 0) for c in probed) / total
                )
            return round(sum(fr) / len(fr), 3)

        rows.append(
            {
                "gen": g,
                "skew": meta.get("occupancy_skew"),
                "warned": "occupancy_warning" in meta,
                "max_cell": max(counts),
                "mean_cell": round(sum(counts) / len(counts), 1),
                "recall_p2": recall(corpus, queries, 2),
                "recall_p4": recall(corpus, queries, 4),
                "scan_frac_p2": scan_frac(2),
                "scan_frac_p4": scan_frac(4),
            }
        )
    if args.remediate:
        from epe_data_wrangling_spark.streaming.ann_index import (
            ivf_index_retrain,
        )

        t0 = time.perf_counter()
        # k_cells=None → retrain reads the committed meta's k (keeps
        # the probe honest if the drift-mode bootstrap k ever changes);
        # --retrain-k overrides to measure k as the remediation lever
        n_re = ivf_index_retrain(
            spark, target, k_cells=args.retrain_k,
            train_iters=args.retrain_iters, init=args.retrain_init,
        )
        retrain_sec = round(time.perf_counter() - t0, 2)
        meta = json.load(open(os.path.join(target, "_ivm_meta.json")))
        # rebind the loop locals scan_frac() closes over so the
        # post-retrain row reads the NEW occupancy and centroids
        cell_counts = {int(b): c for b, c in meta["cell_counts"].items()}
        counts = list(cell_counts.values())
        total = sum(counts)
        rows.append(
            {
                "gen": "retrain",
                "retrained_rows": n_re,
                "sec": retrain_sec,
                "skew": meta.get("occupancy_skew"),
                "warned": "occupancy_warning" in meta,
                "max_cell": max(counts),
                "mean_cell": round(sum(counts) / len(counts), 1),
                "recall_p2": recall(corpus, queries, 2),
                "recall_p4": recall(corpus, queries, 4),
                "scan_frac_p2": scan_frac(2),
                "scan_frac_p4": scan_frac(4),
            }
        )
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "drift_step": args.drift_step,
                "k": K,
                "vectors_per_gen": n,
                "gens": rows,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=20)
    ap.add_argument("--drift", type=int, default=0,
                    help="run the drift probe with this many shifted "
                    "generations instead of the append-cost probe")
    ap.add_argument("--drift-step", type=float, default=0.2,
                    help="per-generation per-dimension shift")
    ap.add_argument("--remediate", action="store_true",
                    help="after the drift generations, retrain the "
                    "quantizer and append a post-retrain metrics row")
    ap.add_argument("--retrain-k", type=int, default=None,
                    help="retrain with this many cells (default: the "
                    "committed k) — a drift-elongated corpus is less "
                    "separable at fixed k, so MORE cells is the "
                    "production remediation lever when retrain-at-"
                    "same-k plateaus")
    ap.add_argument("--retrain-init", default="lowest",
                    choices=("lowest", "spread"),
                    help="retrain seeding: 'lowest' (certified "
                    "default; seeds in the OLDEST cluster) or "
                    "'spread' (farthest-first — the drifted-corpus "
                    "remediation)")
    ap.add_argument("--retrain-iters", type=int, default=2,
                    help="Lloyd iterations for --remediate (measured "
                    "r15: iterations are NOT the drift lever — with "
                    "--retrain-init lowest, 8 iters ≈ 2 because Lloyd "
                    "cannot migrate a seed across a cluster gap; the "
                    "lever is --retrain-init spread)")
    args = ap.parse_args()
    spark = get_spark("ann_index_scale")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    if args.drift:
        _drift_mode(spark, args)
        return

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
