"""Fixed-delta isolation harness for the standing-state sinks.

Measures what SCALE.md's "fixed-delta isolation" tables report — the
per-refresh cost of each incremental sink when the DELTA is held
constant while the corpus and bucket count scale — reproducibly from
a checkout (the r12 originals lived in /tmp and were lost; VERDICT
r12 gap #3).

Protocol per sink: build v1/v2/v3 of an orders-shaped corpus where
v2 and v3 each change a FIXED set of base-replica keys (status flip +
cents bump on ``o_orderkey % mod == residue``; replicas get keys
above the base maximum, so the delta does NOT grow with ``--mult``),
land each generation as one mtime-ordered file, and drive the sink
once per landing against a shared checkpoint — so ``bootstrap`` times
the corpus-sized first apply and ``refresh1``/``refresh2`` time pure
fixed-delta maintenance. Op-log sinks receive ``_rel_oplog``
changelogs (delta-sized landings); snapshot sinks receive full
version images (their input is the snapshot itself — the
irreducible scan SCALE.md attributes their growth to).

Usage:
    python tools/supp/fixed_delta.py [--sf-dir /root/testdata/sf0.1]
        [--mult 1] [--buckets 256] [--sinks all]

Prints one JSON line:
    {"sinks": {<name>: {"bootstrap": s, "refresh1": s, "refresh2": s}},
     "delta_rows": N, "corpus_rows": N, "mult": M, "buckets": B}
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

from epe_data_wrangling_spark.catalog.streaming_q import _rel_oplog
from epe_data_wrangling_spark.session import get_spark
from epe_data_wrangling_spark.streaming import ops

WORK = "/tmp/fixed_delta"

#: Base-replica carve: ~60 changed rows at sf0.1 (orders keys are
#: 4x-sparse, so ~mod/4 keys exist per residue). Fixed regardless of
#: --mult: only keys <= the base maximum are ever carved.
CARVE_MOD = 2477

#: ``g`` is a fine-grained derived group (o_custkey mod 997) so the
#: affected-group aggregate classes (top-k) recompute ~delta-many
#: groups, not the whole corpus — the regime the sinks are built for.
ORD_COLS = ["o_custkey", "cents", "o_orderstatus", "g"]
OPLOG_SCHEMA = (
    "o_orderkey BIGINT, seq BIGINT, op STRING, o_custkey BIGINT, "
    "cents BIGINT, o_orderstatus STRING, g BIGINT, prev_o_custkey BIGINT, "
    "prev_cents BIGINT, prev_o_orderstatus STRING, prev_g BIGINT"
)
SNAP_SCHEMA = (
    "v INT, o_orderkey BIGINT, o_custkey BIGINT, cents BIGINT, "
    "o_orderstatus STRING, g BIGINT"
)
JV_SCHEMA = (
    "rel STRING, v INT, o_orderkey BIGINT, o_custkey BIGINT, "
    "cents BIGINT, o_orderstatus STRING, c_custkey BIGINT, "
    "c_mktsegment STRING"
)


def build_versions(spark, sf_dir: str, mult: int):
    """v1/v2/v3 of the orders corpus: v1 = base replicated ``mult``x
    with key offsets; v2/v3 flip status + bump cents on the two fixed
    base-replica carves. Returns (v1, v2, v3, base max keys)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderstatus",
        (F.col("o_custkey") % 997).alias("g"),
    )
    omax, cmax = base.agg(
        F.max("o_orderkey"), F.max("o_custkey")
    ).collect()[0]
    if mult > 1:
        rep = spark.range(mult).select(F.col("id").alias("rep"))
        v1 = base.crossJoin(rep).select(
            (F.col("o_orderkey") + F.col("rep") * (omax + 1)).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.col("rep") * (cmax + 1)).alias(
                "o_custkey"
            ),
            "cents",
            "o_orderstatus",
            "g",
        )
    else:
        v1 = base

    def carve(df, residue, tag):
        hit = (F.col("o_orderkey") <= omax) & (
            F.col("o_orderkey") % CARVE_MOD == residue
        )
        return df.withColumn(
            "o_orderstatus",
            F.when(hit, F.lit(tag)).otherwise(F.col("o_orderstatus")),
        ).withColumn(
            "cents",
            F.when(hit, F.col("cents") + 1).otherwise(F.col("cents")),
        )

    v2 = carve(v1, 17, "X")
    v3 = carve(v2, 23, "Y")
    return v1, v2, v3, omax, cmax


def replicated_customer(spark, sf_dir: str, mult: int, cmax: int):
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment"
    )
    if mult == 1:
        return cust
    rep = spark.range(mult).select(F.col("id").alias("rep"))
    return cust.crossJoin(rep).select(
        (F.col("c_custkey") + F.col("rep") * (cmax + 1)).alias("c_custkey"),
        "c_mktsegment",
    )


def land_one(df, landing: str, name: str, order: int) -> None:
    """One generation -> one mtime-ordered parquet file (the shared
    landing core from `streaming.sources`)."""
    from epe_data_wrangling_spark.streaming.sources import land_single_file

    land_single_file(df, landing, name, order)


def timed_increments(spark, work: str, schema: str, gens, sink_call) -> dict:
    """Land generation i, drive the sink once (shared checkpoint),
    repeat — bootstrap / refresh1 / refresh2 timings."""
    landing = os.path.join(work, "landing")
    ck = os.path.join(work, "ck")
    out = {}
    for i, (name, gdf) in enumerate(gens, start=1):
        land_one(gdf, landing, name, i)
        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        sink_call(stream, ck)
        out[("bootstrap", "refresh1", "refresh2")[i - 1]] = round(
            time.perf_counter() - t0, 2
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=1)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument(
        "--sinks",
        default="all",
        help="comma list of distinct_oplog,minmax_oplog,topk_oplog,"
        "distinct_snapshot,cdc_snapshot,join_view (or 'all')",
    )
    args = ap.parse_args()
    names = (
        [
            "distinct_oplog",
            "minmax_oplog",
            "topk_oplog",
            "distinct_snapshot",
            "cdc_snapshot",
            "join_view",
        ]
        if args.sinks == "all"
        else args.sinks.split(",")
    )
    spark = get_spark("fixed_delta")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    v1, v2, v3, omax, cmax = build_versions(spark, args.sf_dir, args.mult)
    # materialize versions once so fixture cost never leaks into a
    # sink's timed refresh (the snapshot sinks re-read these files as
    # their INPUT — that scan is theirs by design)
    vdirs = []
    for i, v in enumerate((v1, v2, v3), start=1):
        p = f"{WORK}/v{i}"
        v.write.mode("overwrite").parquet(p)
        vdirs.append(p)
    v1, v2, v3 = (spark.read.parquet(p) for p in vdirs)
    delta_rows = v1.filter(
        (F.col("o_orderkey") <= omax)
        & (F.col("o_orderkey") % CARVE_MOD == 17)
    ).count()
    corpus_rows = v1.count()
    B = args.buckets

    def oplog_gens():
        G = 10**10
        return [
            ("log1.parquet", _rel_oplog(None, v1, "o_orderkey", ORD_COLS, G)),
            ("log2.parquet", _rel_oplog(v1, v2, "o_orderkey", ORD_COLS, 2 * G)),
            ("log3.parquet", _rel_oplog(v2, v3, "o_orderkey", ORD_COLS, 3 * G)),
        ]

    def snap_gens():
        return [
            (
                f"g{i}.parquet",
                v.select(
                    F.lit(i).alias("v"), "o_orderkey", "o_custkey",
                    "cents", "o_orderstatus", "g",
                ),
            )
            for i, v in enumerate((v1, v2, v3), start=1)
        ]

    def jv_gens():
        cust = replicated_customer(spark, args.sf_dir, args.mult, cmax)

        def tag_r(vdf, i):
            return vdf.select(
                F.lit("R").alias("rel"), F.lit(i).alias("v"),
                "o_orderkey", "o_custkey", "cents", "o_orderstatus",
                F.lit(None).cast("bigint").alias("c_custkey"),
                F.lit(None).cast("string").alias("c_mktsegment"),
            )

        def tag_s(sdf, i):
            return sdf.select(
                F.lit("S").alias("rel"), F.lit(i).alias("v"),
                F.lit(None).cast("bigint").alias("o_orderkey"),
                F.lit(None).cast("bigint").alias("o_custkey"),
                F.lit(None).cast("bigint").alias("cents"),
                F.lit(None).cast("string").alias("o_orderstatus"),
                "c_custkey", "c_mktsegment",
            )

        return [
            ("g1.parquet", tag_r(v1, 1).unionByName(tag_s(cust, 1))),
            ("g2.parquet", tag_r(v2, 2)),
            ("g3.parquet", tag_r(v3, 3)),
        ]

    runners = {
        "distinct_oplog": (
            OPLOG_SCHEMA,
            oplog_gens,
            lambda s, t, ck: ops.distinct_count_oplog_foreach_batch(
                s, t, op_col="op", seq_col="seq",
                group_col="o_orderstatus", value_col="o_custkey",
                n_buckets=B, checkpoint_dir=ck,
            ),
        ),
        "minmax_oplog": (
            OPLOG_SCHEMA,
            oplog_gens,
            lambda s, t, ck: ops.minmax_view_oplog_foreach_batch(
                s, t, op_col="op", seq_col="seq",
                group_cols=["o_orderstatus"], value_col="cents",
                n_buckets=B, checkpoint_dir=ck,
            ),
        ),
        "topk_oplog": (
            OPLOG_SCHEMA,
            oplog_gens,
            lambda s, t, ck: ops.topk_view_oplog_foreach_batch(
                s, t, key_cols=["o_orderkey"], op_col="op", seq_col="seq",
                group_cols=["g"], value_col="cents", k=5,
                n_buckets=B, checkpoint_dir=ck,
            ),
        ),
        "distinct_snapshot": (
            SNAP_SCHEMA,
            snap_gens,
            lambda s, t, ck: ops.distinct_count_view_foreach_batch(
                s, t, key_cols=["o_orderkey"], version_col="v",
                group_col="o_orderstatus", value_col="o_custkey",
                n_buckets=B, checkpoint_dir=ck,
            ),
        ),
        "cdc_snapshot": (
            SNAP_SCHEMA,
            snap_gens,
            lambda s, t, ck: ops.cdc_retraction_foreach_batch(
                s, t, key_cols=["o_orderkey"], version_col="v",
                group_cols=["o_orderstatus"], sum_cols=["cents"],
                n_buckets=B, checkpoint_dir=ck,
            ),
        ),
        "join_view": (
            JV_SCHEMA,
            jv_gens,
            lambda s, t, ck: ops.join_view_foreach_batch(
                s, t, rel_col="rel", version_col="v", r_tag="R", s_tag="S",
                r_key=["o_orderkey"], s_key=["c_custkey"],
                r_join="o_custkey", s_join="c_custkey",
                r_cols=["o_custkey", "cents", "o_orderstatus"],
                s_cols=["c_custkey", "c_mktsegment"],
                group_cols=["c_mktsegment", "o_orderstatus"],
                sum_cols=["cents"], n_buckets=B, checkpoint_dir=ck,
            ),
        ),
    }

    results = {}
    for name in names:
        schema, gens_fn, call = runners[name]
        work = os.path.join(WORK, name)
        target = os.path.join(work, "state")
        results[name] = timed_increments(
            spark, work, schema, gens_fn(),
            lambda s, ck, call=call, target=target: call(s, target, ck),
        )
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "sinks": results,
                "delta_rows": delta_rows,
                "corpus_rows": corpus_rows,
                "mult": args.mult,
                "buckets": args.buckets,
            }
        )
    )


if __name__ == "__main__":
    main()
