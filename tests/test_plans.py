"""Physical-plan assertions — the scale contract, checked, not hoped
for: filters reach the parquet scan, projections prune columns, small
dimensions broadcast, aggregates are partial+final, the salted join
has no shuffle on its join, and sketch barriers keep their explicit
partition counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from epe_data_wrangling_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_shipdate") > "1995-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # read schema carries only the 3 touched columns, not all 16
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_star_join_broadcasts_dimensions(spark):
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["join_broadcast_star"].fn(spark, SF_DIR)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no dim should shuffle-sort


def test_aggregate_is_partial_then_final(spark):
    o = load_table(spark, SF_DIR, "orders")
    q = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(q)
    # two HashAggregate stages around the exchange = map-side combine
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_salted_join_broadcasts_and_avoids_shuffle(spark):
    from epe_data_wrangling_spark.operators.joins import salted_join

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    su = load_table(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(li, su, "suppkey", n_salts=4)
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    # the join itself needs no exchange on the large side
    assert "Exchange hashpartitioning(suppkey" not in plan


def test_salted_join_equals_plain_join(spark):
    from epe_data_wrangling_spark.operators.joins import salted_join

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    su = load_table(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    salted = salted_join(li, su, "suppkey", n_salts=4)
    plain = li.join(su, "suppkey")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_whole_stage_codegen_covers_scan_filter_project(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_quantity") > 10).select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    # '*(n)' prefixes mark whole-stage-codegen'd operators; scan →
    # filter → project must all sit in one codegen stage
    plan = _plan(q)
    assert plan.count("*(1)") >= 2, plan


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — the corpus side may
    never shuffle its exploded shingles for the join."""
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["contamination_ngram_overlap"].fn(spark, SF_DIR)
    plan = _plan(q)
    # shingle join is broadcast; the final doc_id left join back onto
    # the (small, aggregated) count table may legitimately SMJ.
    assert "BroadcastHashJoin" in plan


def test_chunking_is_narrow(spark):
    """Chunking is explode + projection only: no exchange anywhere in
    the plan (the 100 TB 'scales as a pure scan' claim, asserted)."""
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["text_chunking"].fn(spark, SF_DIR)
    plan = _plan(q)
    assert "Exchange" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_centroids_aggregate_partial_final(spark):
    """posexplode fan-out must collapse map-side: partial+final
    HashAggregate around one exchange."""
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["embedding_label_centroids"].fn(spark, SF_DIR)
    plan = _plan(q)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_kmeans_broadcasts_centroids_every_iteration(spark):
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["kmeans_lloyd_centroids"].fn(spark, SF_DIR)
    plan = _plan(q)
    # both Lloyd iterations join the corpus against BROADCAST centroids
    # (nested-loop on the K-row side) — the corpus itself never shuffles
    # for the assignment step
    assert plan.count("BroadcastNestedLoopJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_anomaly_stats_broadcast_no_fact_shuffle(spark):
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["anomaly_zscore_events"].fn(spark, SF_DIR)
    plan = _plan(q)
    # per-type stats (small) broadcast back against the event scan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_reuses_one_user_partitioning(spark):
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["scd2_user_history"].fn(spark, SF_DIR)
    plan = _plan(q)
    # lag + running-sum windows, the version group-by, and the lead
    # window are all keyed by user_id: one hash exchange on user_id
    # must serve the chain (Spark reuses the partitioning; extra
    # exchanges would mean the windows re-shuffle per step)
    assert plan.count("Exchange hashpartitioning(user_id") <= 2


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session enables spark.sql.adaptive.skewJoin — prove it
    actually fires: a sort-merge join whose left side is dominated by
    one hot key must show SortMergeJoin(skew=true) in the FINAL
    adaptive plan (the hot partition split across tasks at runtime —
    the AQE complement to the manual salted_join, which handles skew
    the optimizer can't see in advance)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        )
        uniform = spark.range(50_000).select(
            (F.col("id") % 99 + 1).alias("k"), F.col("id").alias("payload")
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        j = hot.unionAll(uniform).join(right.hint("merge"), "k")
        assert len(j.collect()) == 250_000  # executes THIS df's query
        plan = _plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning — the other star-schema essential at
    100 TB (a date/region-partitioned fact scan must read only the
    partitions the FILTERED dim selects, discovered at runtime via a
    subquery on the dim): a partitioned-fact ⋈ filtered-dim join must
    carry a dynamicpruning#NNN expression into the fact scan in both
    the optimized and physical plans, and the pruned scan must read
    only the matching partitions' rows."""
    from pyspark.sql import functions as F

    d = str(tmp_path)
    spark.range(100_000).select(
        F.col("id"), (F.col("id") % 20).alias("pk")
    ).write.partitionBy("pk").parquet(d + "/fact")
    spark.range(20).select(
        F.col("id").alias("pk"), (F.col("id") % 4).alias("grp")
    ).write.parquet(d + "/dim")
    fact = spark.read.parquet(d + "/fact")
    dim = spark.read.parquet(d + "/dim").filter(F.col("grp") == 1)
    j = fact.join(dim, "pk")
    qe = j._jdf.queryExecution()
    assert "dynamicpruning" in qe.optimizedPlan().toString().lower()
    # 5 of 20 pk partitions survive grp==1 → exactly 1/4 of the rows
    assert len(j.collect()) == 25_000
    assert "dynamicpruning" in _plan(j).lower()
    # the real proof: the executed fact scan's runtime metrics show
    # only the 5 surviving partitions were READ (output cardinality
    # alone would be identical without pruning)
    spark_jvm = spark._jvm
    jconv = spark_jvm.scala.collection.JavaConverters

    def scan_metrics(node, out):
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name:
            jmap = jconv.mapAsJavaMapConverter(node.metrics()).asJava()
            out.append({str(k): jmap.get(k).value() for k in jmap.keySet().toArray()})
        for c in jconv.seqAsJavaListConverter(node.children()).asJava():
            scan_metrics(c, out)
        if name == "AdaptiveSparkPlanExec":
            scan_metrics(node.executedPlan(), out)
        if "QueryStage" in name:
            scan_metrics(node.plan(), out)

    scans = []
    scan_metrics(qe.executedPlan(), scans)
    [fact_scan] = [m for m in scans if "numPartitions" in m]
    assert fact_scan["numPartitions"] == 5, fact_scan
    assert fact_scan["numFiles"] < fact_scan["staticFilesNum"], fact_scan


def test_pagerank_partitioned_no_rank_broadcast(spark):
    """The beyond-broadcast PageRank (operators.graph.pagerank
    mode="partitioned") must survive the regime its broadcast twin
    cannot: a rank vector too big for any executor. Proof by plan
    shape with broadcasts forcibly disabled and AQE off (emulating
    the >10^8-node regime where no side qualifies): the 3-iteration
    plan must contain ZERO BroadcastHashJoins, the share⋈edges joins
    must be zero-exchange ShuffledHashJoins on the co-located src
    partitioning, and there must be EXACTLY ONE hash exchange per
    iteration (the contribution groupBy(dst)) plus the single
    up-front edge repartition — co-location is paid once and reused,
    not re-shuffled per iteration. The result is asserted
    bit-identical to the broadcast form (the decimal contribution
    staging makes it partitioning-invariant), which is what lets both
    physical forms share one DuckDB oracle in the catalog."""
    from epe_data_wrangling_spark.operators.graph import pagerank

    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = spark.range(2000).select(
            (F.col("id") % 97).cast("string").alias("src"),
            ((F.col("id") * 7) % 101).cast("string").alias("dst"),
        )
        iters = 3
        part = pagerank(df, iters=iters, mode="partitioned")
        plan = _plan(part)
        assert "BroadcastHashJoin" not in plan, "rank vector was broadcast"
        # r17: the co-partitioned edges/nodes/outdeg are pinned by
        # AQE-off localCheckpoints (operators.graph._pin — materialized
        # LogicalRDDs that KEEP hash(key, p); r16 used persist(), whose
        # InMemoryRelation build cost ~2-4 s/invocation and whose
        # CacheManager entries leaked across invocations), and ALL
        # THREE per-iteration joins (share⋈outdeg, share⋈edges,
        # update⋈s) are hinted shuffled-hash on the co-located keys:
        # zero exchange, zero sort. Count nodes by walking the
        # executed tree.
        def count_nodes(jnode, name: str) -> int:
            n = 1 if name in jnode.getClass().getSimpleName() else 0
            for i in range(jnode.children().size()):
                n += count_nodes(jnode.children().apply(i), name)
            return n

        root = part._jdf.queryExecution().executedPlan()
        assert count_nodes(root, "ShuffledHashJoin") == 3 * iters, plan
        # one LIVE exchange per iteration: the contribution groupBy
        n_exchanges = count_nodes(root, "ShuffleExchange")
        assert n_exchanges == iters, f"{n_exchanges} exchanges for {iters} iterations:\n{plan}"
        # and no per-iteration sort anywhere (SMJ would add two each)
        assert count_nodes(root, "SortExec") == 0, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # same doubles out of both physical forms
    bcast = pagerank(df, iters=iters, mode="broadcast")
    assert sorted(map(tuple, part.collect())) == sorted(map(tuple, bcast.collect()))
    # cache-lifecycle pin (r17): the partitioned mode must leave NO
    # SQL-cache entry behind — its pins are localCheckpoints (RDD
    # blocks freed by ContextCleaner on GC), never CacheManager
    # entries, which hold strong references and would accumulate
    # across invocations in a long-lived session.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "pagerank left a CacheManager entry behind"
    )
    # and the co-partition pin must hold under the DEFAULT session
    # (AQE on) too: the executed tree of a fresh invocation still
    # plans exchange-free iterations over the pinned relations.
    part2 = pagerank(df, iters=iters, mode="partitioned")

    def walk_live(jnode, name: str) -> int:
        cls = jnode.getClass().getSimpleName()
        n = 1 if name in cls else 0
        if cls == "AdaptiveSparkPlanExec":
            n += walk_live(jnode.executedPlan(), name)
        if "QueryStage" in cls:
            n += walk_live(jnode.plan(), name)
        for i in range(jnode.children().size()):
            n += walk_live(jnode.children().apply(i), name)
        return n

    root2 = part2._jdf.queryExecution().executedPlan()
    n_ex = walk_live(root2, "ShuffleExchange")
    assert n_ex == iters, f"AQE-on plan re-exchanges the pins: {n_ex}"


def test_snapshot_diff_joins_on_key_no_nested_loop(spark):
    """The snapshot-diff / changeset-apply pair must diff via a keyed
    shuffle join (SMJ or shuffled-hash on o_orderkey) — never a
    BroadcastNestedLoopJoin (both sides are table-sized at scale) and
    never a broadcast of a snapshot side. Scans must prune to the
    diffed columns, not the full orders width."""
    from epe_data_wrangling_spark.catalog import all_queries

    qs = all_queries()
    for name in ("snapshot_diff_keyed", "ivm_apply_changeset"):
        plan = _plan(qs[name].fn(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
        read_schema = plan.split("ReadSchema")[1][:300]
        assert "o_comment" not in read_schema and "o_clerk" not in read_schema, name


def test_sql_udfs_inline_no_python_workers(spark):
    """SQL UDFs (scalar chain and table function) must inline into
    pure Catalyst plans: no BatchEvalPython / ArrowEvalPython / UDTF
    python node anywhere, partial+final aggregation intact, and the
    scalar chain's filter/scan shape identical to the hand-written
    q1 idiom (pushdown reaches the parquet scan)."""
    from epe_data_wrangling_spark.catalog import all_queries

    qs = all_queries()
    p1 = _plan(qs["sql_udf_pricing_chain"].fn(spark, SF_DIR))
    assert "BatchEvalPython" not in p1 and "ArrowEvalPython" not in p1
    assert "PythonUDTF" not in p1
    assert p1.count("HashAggregate") >= 2  # partial + final
    assert "PushedFilters" in p1
    p2 = _plan(qs["sql_udf_table_month_spine"].fn(spark, SF_DIR))
    assert "BatchEvalPython" not in p2 and "PythonUDTF" not in p2
    assert "Generate explode" in p2 or "Generate" in p2  # TVF became a generator


def test_attribution_touch_join_is_equi_on_user_id(spark):
    """The attribution touch join must be an EQUI join on user_id with
    the lookback time-range riding as a post-join predicate — never a
    CartesianProduct / BroadcastNestedLoopJoin (both sides are
    events-table-sized at scale, so a range-only join would be an
    all-pairs explosion). Per-purchase windows must partition by the
    purchase id, and the purchase/touch filters must reach the scan."""
    import re

    from epe_data_wrangling_spark.catalog import all_queries

    plan = _plan(all_queries()["attribution_position_weighted"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[user_id", plan
    ), plan[:500]
    assert "windowspecdefinition(p_id" in plan
    assert "EqualTo(event_type,purchase)" in plan  # pushdown reached the scan


def test_split_by_dedup_cluster_reuses_checkpointed_pairs(spark):
    """split_by_dedup_cluster must compute the LSH pair set and the
    fold assignment ONCE each (localCheckpoint barriers) and reuse
    them for both the per-fold report and the leak self-join: the
    final plan may contain NO parquet scan (everything reads the
    checkpointed RDDs — a rebuilt LSH subtree would re-shingle the
    corpus) and exactly one BNLJ, the 1-row broadcast leak-scalar
    cross join."""
    from epe_data_wrangling_spark.catalog import all_queries

    plan = _plan(all_queries()["split_by_dedup_cluster"].fn(spark, SF_DIR))
    assert "FileScan parquet" not in plan  # no LSH/assignment recompute
    assert plan.count("Scan ExistingRDD") >= 3  # pairs + assign reused
    assert plan.count("BroadcastNestedLoopJoin") == 1  # only the 1-row leak join
    assert "IdentityBroadcastMode" in plan


def test_ivm_join_delta_equals_direct_recompute(spark):
    """The delta-join maintenance identity, checked in-engine:
    merge(γ(R₁⋈S₁), Σ± [ΔR⋈S₁ + R₁⋈ΔS + ΔR⋈ΔS]) must equal the
    direct recompute γ(R₂⋈S₂) exactly (integer cents), and the plan
    must contain no cartesian/nested-loop node — every Δ-term is an
    equi-join on the customer key."""
    from epe_data_wrangling_spark.catalog import all_queries
    from epe_data_wrangling_spark.catalog.evolve_q import (
        _dim_versions,
        _snapshot_versions,
    )

    q = all_queries()["ivm_join_delta_maintenance"]
    df = q.fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ΔR feeds t1+t3 and ΔS feeds t2+t3 from ONE materialization each:
    # the diff full-outer joins must appear as checkpointed-RDD scans
    # (4 consumers), never be recomputed per term
    assert plan.count("Scan ExistingRDD") >= 4

    _, r2 = _snapshot_versions(load_table(spark, SF_DIR, "orders"))
    _, s2 = _dim_versions(load_table(spark, SF_DIR, "customer"))
    direct = (
        r2.join(s2, r2.o_custkey == s2.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("cents_sum"),
        )
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want


def test_ivm_outer_join_delta_equals_direct_recompute(spark):
    """The outer-join maintenance identity (the counting problem,
    unique-dim-key regime): the incrementally refreshed γ(R₂ ⟕ S₂)
    must equal a direct recompute exactly — including the ∅-group
    migrations in BOTH directions (the carving removes and adds dim
    keys) — with no cartesian/nested-loop node beyond none (the
    key-transition joins are equi on the custkey)."""
    from epe_data_wrangling_spark.catalog import all_queries
    from epe_data_wrangling_spark.catalog.evolve_q import (
        _dim_versions,
        _snapshot_versions,
    )

    q = all_queries()["ivm_outer_join_maintenance"]
    df = q.fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    _, r2 = _snapshot_versions(load_table(spark, SF_DIR, "orders"))
    _, s2 = _dim_versions(load_table(spark, SF_DIR, "customer"))
    direct = (
        r2.join(s2, r2.o_custkey == s2.c_custkey, "left")
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("(none)")).alias(
                "c_mktsegment"
            ),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("cents_sum"),
        )
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want
    # the ∅-group must exist and must have moved vs a v1-state-only view
    assert any(t[0] == "(none)" for t in got)


def test_ivm_topk_affected_group_split_is_sparse_and_correct(spark):
    """The non-distributive IVM contract: the kept/recomputed split
    must (a) equal a direct recompute of the v2 top-3 view exactly,
    (b) route through an anti-join (kept) + semi-join (recompute
    scope) with no nested-loop node, and (c) be SPARSE — the affected
    groups are a small fraction of all groups, otherwise
    affected-group recompute is just full recompute with extra
    steps."""
    from epe_data_wrangling_spark.catalog import all_queries
    from epe_data_wrangling_spark.catalog.evolve_q import (
        _signed_delta,
        _sparse_version,
    )
    from pyspark.sql import Window

    q = all_queries()["ivm_topk_affected_groups"]
    df = q.fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "LeftAnti" in plan and "LeftSemi" in plan

    v1, v2 = _sparse_version(load_table(spark, SF_DIR, "orders"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("cents").desc(), F.col("o_orderkey")
    )
    direct = (
        v2.select(
            "o_custkey",
            F.row_number().over(w).cast("bigint").alias("rnk"),
            "o_orderkey",
            "cents",
        )
        .filter(F.col("rnk") <= 3)
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, direct.collect()))

    delta = _signed_delta(v1, v2, "o_orderkey", ["o_custkey", "cents"])
    n_affected = delta.select("o_custkey").distinct().count()
    n_groups = v1.select("o_custkey").distinct().count()
    assert 0 < n_affected < 0.2 * n_groups, (n_affected, n_groups)


def test_ivm_distinct_count_support_transitions(spark):
    """The duplicate-sensitive IVM contract: the support-table refresh
    must equal a direct COUNT(DISTINCT) recompute exactly, with no
    nested-loop node; and the carving must exercise all three support
    regimes (0→pos raises the distinct count, pos→0 lowers it,
    pos→pos must NOT move it)."""
    from epe_data_wrangling_spark.catalog import all_queries
    from epe_data_wrangling_spark.catalog.evolve_q import (
        _signed_delta,
        _snapshot_versions,
    )

    q = all_queries()["ivm_distinct_count_support"]
    df = q.fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    _, v2 = _snapshot_versions(load_table(spark, SF_DIR, "orders"))
    direct = v2.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_distinct_cust"),
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, direct.collect()))

    v1, v2b = (
        x.select("o_orderkey", "o_custkey", "o_orderstatus")
        for x in _snapshot_versions(load_table(spark, SF_DIR, "orders"))
    )
    delta = _signed_delta(v1, v2b, "o_orderkey", ["o_custkey", "o_orderstatus"])
    sup1 = v1.groupBy("o_orderstatus", "o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dsup = (
        delta.groupBy("o_orderstatus", "o_custkey")
        .agg(F.sum("sign").alias("dc"))
        .filter(F.col("dc") != 0)
    )
    ds_, sp = dsup.alias("ds"), sup1.alias("sp")
    trans = ds_.join(
        sp,
        (F.col("ds.o_orderstatus") == F.col("sp.o_orderstatus"))
        & (F.col("ds.o_custkey") == F.col("sp.o_custkey")),
        "left",
    ).select(
        F.coalesce(F.col("sp.cnt"), F.lit(0)).alias("old"),
        (F.coalesce(F.col("sp.cnt"), F.lit(0)) + F.col("ds.dc")).alias("new"),
    )
    up = trans.filter((F.col("new") > 0) & (F.col("old") == 0)).count()
    down = trans.filter((F.col("new") == 0) & (F.col("old") > 0)).count()
    stay = trans.filter((F.col("new") > 0) & (F.col("old") > 0)).count()
    assert up > 0 and down > 0 and stay > 0, (up, down, stay)


def test_signed_delta_catches_null_transitions(spark):
    """_signed_delta's change predicate must be null-SAFE: a column
    moving NULL→value (or back) is a change, not a silently-equal
    row (a plain != yields NULL and the filter would drop it)."""
    from epe_data_wrangling_spark.catalog.evolve_q import _signed_delta

    old = spark.createDataFrame(
        [(1, None), (2, "b"), (3, "c")], "k INT, v STRING"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k INT, v STRING"
    )
    d = {(r["k"], r["v"], r["sign"]) for r in _signed_delta(old, new, "k", ["v"]).collect()}
    assert d == {(1, None, -1), (1, "a", 1), (2, "b", -1), (2, None, 1)}


def test_ivm_algebra_on_randomized_evolutions(spark):
    """The bilinear (inner) and counting (outer) delta algebra,
    checked beyond the one catalog carving: three seeded
    pseudo-random evolutions of tiny relations (md5-driven mutation
    masks, so adds/deletes/updates and dim key transitions all vary
    by seed), each refreshed incrementally and compared against a
    direct recompute. Catches sign errors, off-by-one-version terms,
    and missed migrations that a single fixed carving might not."""
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.catalog.evolve_q import _signed_delta

    def h(col, seed, mod):
        return F.abs(F.hash(col.cast("string"), F.lit(seed))) % mod

    for seed in (7, 23, 61):
        r_base = spark.range(400).select(
            F.col("id").alias("rk"),
            (h(F.col("id"), seed, 20)).alias("jk"),
            (h(F.col("id"), seed + 1, 1000)).cast("bigint").alias("val"),
        )
        s_base = spark.range(20).select(
            F.col("id").alias("jk2"),
            F.concat(F.lit("g"), (h(F.col("id"), seed + 2, 4)).cast("string")).alias(
                "grp"
            ),
        )
        # evolution masks: ~25% of fact rows deleted, ~25% value-bumped;
        # ~25% of dim keys deleted, ~25% relabeled
        r1 = r_base.filter(h(F.col("rk"), seed + 3, 4) != 0)
        r2 = (
            r_base.withColumn(
                "val",
                F.when(h(F.col("rk"), seed + 4, 4) == 0, F.col("val") + 10000)
                .otherwise(F.col("val")),
            )
            .filter(h(F.col("rk"), seed + 5, 4) != 0)
        )
        s1 = s_base.filter(h(F.col("jk2"), seed + 6, 4) != 0)
        s2 = (
            s_base.withColumn(
                "grp",
                F.when(h(F.col("jk2"), seed + 7, 4) == 0, F.lit("gX")).otherwise(
                    F.col("grp")
                ),
            )
            .filter(h(F.col("jk2"), seed + 8, 4) != 0)
        )

        dR = _signed_delta(r1, r2, "rk", ["jk", "val"])
        dS = _signed_delta(s1, s2, "jk2", ["grp"])

        # inner: merge(γ(R1⋈S1), Σ± bilinear) == γ(R2⋈S2)
        def gamma(r, s):
            return (
                r.join(s, r.jk == s.jk2)
                .groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sv"))
            )

        state1 = gamma(r1, s1)
        t1 = dR.join(s1, dR.jk == s1.jk2).select("grp", "val", "sign")
        t2 = r1.alias("ro").join(dS.alias("ds"), F.col("ro.jk") == F.col("ds.jk2")).select(
            F.col("ds.grp").alias("grp"), F.col("ro.val").alias("val"),
            F.col("ds.sign").alias("sign"),
        )
        t3 = dR.alias("dr").join(dS.alias("ds"), F.col("dr.jk") == F.col("ds.jk2")).select(
            F.col("ds.grp").alias("grp"), F.col("dr.val").alias("val"),
            (F.col("dr.sign") * F.col("ds.sign")).alias("sign"),
        )
        delta = (
            t1.unionByName(t2).unionByName(t3)
            .groupBy("grp")
            .agg(F.sum("sign").alias("dn"), F.sum(F.col("sign") * F.col("val")).alias("dsv"))
        )
        merged = (
            state1.alias("st").join(delta.alias("d"), "grp", "full_outer")
            .select(
                "grp",
                (F.coalesce(F.col("st.n"), F.lit(0)) + F.coalesce(F.col("d.dn"), F.lit(0))).alias("n"),
                (F.coalesce(F.col("st.sv"), F.lit(0)) + F.coalesce(F.col("d.dsv"), F.lit(0))).alias("sv"),
            )
            .filter(F.col("n") > 0)
        )
        got = sorted(map(tuple, merged.collect()))
        want = sorted(map(tuple, gamma(r2, s2).collect()))
        assert got == want, f"inner algebra diverged at seed {seed}"

        # outer: add the ∅-terms (ΔR∖K2 + R1⋈key-transitions)
        def gamma_outer(r, s):
            return (
                r.join(s, r.jk == s.jk2, "left")
                .groupBy(F.coalesce(F.col("grp"), F.lit("(none)")).alias("grp"))
                .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sv"))
            )

        state1o = gamma_outer(r1, s1)
        t4 = dR.join(s2.select("jk2"), dR.jk == F.col("jk2"), "left_anti").select(
            F.lit("(none)").alias("grp"), "val", "sign"
        )
        net = dS.groupBy("jk2").agg(F.sum("sign").alias("net"))
        t5 = r1.join(net.filter(F.col("net") == -1).select("jk2"), r1.jk == F.col("jk2")).select(
            F.lit("(none)").alias("grp"), "val", F.lit(1).alias("sign")
        )
        t6 = r1.join(net.filter(F.col("net") == 1).select("jk2"), r1.jk == F.col("jk2")).select(
            F.lit("(none)").alias("grp"), "val", F.lit(-1).alias("sign")
        )
        delta_o = (
            t1.unionByName(t2).unionByName(t3).unionByName(t4).unionByName(t5).unionByName(t6)
            .groupBy("grp")
            .agg(F.sum("sign").alias("dn"), F.sum(F.col("sign") * F.col("val")).alias("dsv"))
        )
        merged_o = (
            state1o.alias("st").join(delta_o.alias("d"), "grp", "full_outer")
            .select(
                "grp",
                (F.coalesce(F.col("st.n"), F.lit(0)) + F.coalesce(F.col("d.dn"), F.lit(0))).alias("n"),
                (F.coalesce(F.col("st.sv"), F.lit(0)) + F.coalesce(F.col("d.dsv"), F.lit(0))).alias("sv"),
            )
            .filter(F.col("n") > 0)
        )
        got_o = sorted(map(tuple, merged_o.collect()))
        want_o = sorted(map(tuple, gamma_outer(r2, s2).collect()))
        assert got_o == want_o, f"outer algebra diverged at seed {seed}"


def test_bench_heavies_keep_their_join_strategies(spark):
    """Insurance on the two un-pinned bench heavies: pq_adc_topk must
    keep every join broadcast-hash (codebook/centroid sides are
    dimension-sized; a sort-merge would mean the corpus shuffles for
    the assignment), and bm25_doc_scores's only nested-loop node must
    be the single 1-row corpus-stats scalar join (avgdl/N) — a second
    one would mean a data-sized cross product crept in."""
    from epe_data_wrangling_spark.catalog import all_queries

    qs = all_queries()
    p1 = _plan(qs["pq_adc_topk"].fn(spark, SF_DIR))
    assert "SortMergeJoin" not in p1
    assert "BroadcastNestedLoopJoin" not in p1
    assert p1.count("BroadcastHashJoin") >= 2
    p2 = _plan(qs["bm25_doc_scores"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in p2
    assert "SortMergeJoin" not in p2
    assert p2.count("BroadcastNestedLoopJoin") == 1  # the 1-row stats join


def _scan_metrics(spark, df, out):
    """Runtime FileSourceScan metrics for every scan in df's executed
    plan (shared shape with the DPP test's inline helper)."""
    jconv = spark._jvm.scala.collection.JavaConverters

    def walk(node):
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name:
            jmap = jconv.mapAsJavaMapConverter(node.metrics()).asJava()
            out.append({str(k): jmap.get(k).value() for k in jmap.keySet().toArray()})
        for c in jconv.seqAsJavaListConverter(node.children()).asJava():
            walk(c)
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        if "QueryStage" in name:
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())


def test_ivm_pruned_refresh_reads_only_touched_buckets(spark, tmp_path):
    """The pruned IVM refresh's scale contract: with the fact base
    stored partitioned on the join key's bucket, a SPARSE dim delta
    must make the R₁⋈ΔS term read ONLY the touched buckets — proven
    by runtime scan metrics (numPartitions == |touched| ≪ total,
    numFiles < staticFilesNum), not just a filter node in the plan —
    while the refreshed view stays exactly equal to a direct
    recompute. ΔS is broadcast, so the pruned term shuffles nothing."""
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.catalog.evolve_q import (
        _signed_delta,
        ivm_pruned_join_refresh,
    )
    from epe_data_wrangling_spark.sources.tables import load_table

    N_BUCKETS = 64
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    r1 = o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderstatus",
    )
    s1 = c.select("c_custkey", "c_mktsegment")
    # SPARSE dim delta: only keys ≡0 mod 397 move segment — a handful
    # of keys, so the touched-bucket set is a small fraction of 64
    s2 = s1.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 397 == 0, "MACHINERY").otherwise(
            F.col("c_mktsegment")
        ),
    )
    base_dir = str(tmp_path / "base")
    r1.withColumn(
        "_kb", F.pmod(F.col("o_custkey"), F.lit(N_BUCKETS))
    ).write.partitionBy("_kb").parquet(base_dir)
    base = spark.read.parquet(base_dir)

    dR = spark.createDataFrame(
        [], "o_orderkey BIGINT, o_custkey BIGINT, cents BIGINT, "
        "o_orderstatus STRING, sign INT",
    )  # fact unchanged this refresh: isolates the pruned term
    dS = _signed_delta(s1, s2, "c_custkey", ["c_mktsegment"]).localCheckpoint(
        eager=True
    )
    touched = {
        r["b"]
        for r in dS.select(
            F.pmod(F.col("c_custkey"), F.lit(N_BUCKETS)).alias("b")
        ).distinct().collect()
    }
    assert 0 < len(touched) < N_BUCKETS // 2, touched  # sparsity is load-bearing

    delta, term2 = ivm_pruned_join_refresh(
        spark, base, dR, s1, dS, n_buckets=N_BUCKETS
    )
    term2.collect()  # execute so runtime metrics exist
    scans = []
    _scan_metrics(spark, term2, scans)
    [fact_scan] = [m for m in scans if "numPartitions" in m]
    assert fact_scan["numPartitions"] == len(touched), (fact_scan, touched)
    # the scan read strictly fewer files than the store holds
    # (staticFilesNum exists only for DPP scans; static pruning is
    # proven against the on-disk file count)
    import glob

    total_files = len(glob.glob(base_dir + "/_kb=*/*.parquet"))
    assert 0 < fact_scan["numFiles"] < total_files, (fact_scan, total_files)
    # no exchange under the pruned term: the delta side broadcasts
    assert "BroadcastHashJoin" in _plan(term2)

    # correctness of the whole refresh under the sparse delta:
    # merge(γ(r1⋈s1), delta) ≡ recompute(γ(r1⋈s2))
    state1 = (
        base.join(s1, base.o_custkey == s1.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    st, d = state1.alias("st"), delta.alias("d")
    merged = {
        (r["c_mktsegment"], r["o_orderstatus"]): (r["n_rows"], r["cents_sum"])
        for r in st.join(d, ["c_mktsegment", "o_orderstatus"], "full_outer")
        .select(
            "c_mktsegment",
            "o_orderstatus",
            (
                F.coalesce(F.col("st.n"), F.lit(0))
                + F.coalesce(F.col("d.dn"), F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(F.col("st.s"), F.lit(0))
                + F.coalesce(F.col("d.ds_"), F.lit(0))
            ).alias("cents_sum"),
        )
        .filter(F.col("n_rows") > 0)
        .collect()
    }
    expect = {
        (r["c_mktsegment"], r["o_orderstatus"]): (r["n"], r["s"])
        for r in r1.join(s2, r1.o_custkey == s2.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .collect()
    }
    assert merged == expect


def test_ivm_minmax_support_eviction_is_load_bearing(spark):
    """The MIN/MAX IVM contract: the kept/recomputed refresh must
    equal a direct recompute of v2's MIN/MAX exactly, with no
    nested-loop node and the anti/semi split in the plan; and the
    carving must actually EVICT at least one group's current extremum
    (a delete or migration removing the min or max row), otherwise
    the hard case — re-deriving the replacement from the support
    multiset — is never exercised."""
    from epe_data_wrangling_spark.catalog import all_queries
    from epe_data_wrangling_spark.catalog.evolve_q import _snapshot_versions

    q = all_queries()["ivm_minmax_support"]
    df = q.fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan and "LeftSemi" in plan

    v1, v2 = (
        x.select("o_orderkey", "cents", "o_orderstatus")
        for x in _snapshot_versions(load_table(spark, SF_DIR, "orders"))
    )
    agg = lambda v: {  # noqa: E731
        r["o_orderstatus"]: (r["n"], r["mn"], r["mx"])
        for r in v.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("mn"),
            F.max("cents").alias("mx"),
        )
        .collect()
    }
    g1, g2 = agg(v1), agg(v2)
    assert sorted(map(tuple, df.collect())) == sorted(
        (k, *v) for k, v in g2.items()
    )
    # eviction evidence: some group present in both versions changed
    # its min or max — the refresh could not have kept the stored row
    moved = [
        k
        for k in g1.keys() & g2.keys()
        if (g1[k][1], g1[k][2]) != (g2[k][1], g2[k][2])
    ]
    assert moved, (g1, g2)


def test_pruned_store_read_pushes_kb_filter_to_scan(spark, tmp_path):
    """`manifest.read_store(buckets=...)`'s `_kb` selection filter must
    reach the parquet scan (PushedFilters) — with packed multi-bucket
    files, row-group stats on the sorted `_kb` column are what keep a
    one-bucket read from paying a whole shared file once files grow
    real row groups."""
    from epe_data_wrangling_spark.streaming.manifest import (
        read_manifest,
        read_store,
        write_store_delta,
    )
    from epe_data_wrangling_spark.streaming.ops import _atomic_swap

    target = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, k) for k in range(64)], "k BIGINT, v BIGINT"
    ).withColumn("_kb", F.pmod(F.hash("k"), F.lit(8)))
    stage = f"{target}.stage-0"
    write_store_delta(
        spark, df, target, "s", stage, batch_id=0,
        touched=list(range(8)), manifest=None,
    )
    _atomic_swap(stage, target, 0)
    pr = read_store(spark, target, "s", buckets=[1, 3],
                    manifest=read_manifest(target, "s"))
    plan = _plan(pr)
    assert "PushedFilters" in plan
    assert "_kb" in plan.split("PushedFilters")[1][:200]


def test_ivfpq_broadcasts_quantizers_and_tables(spark):
    """ann_ivfpq_topk's serve path must broadcast the small sides —
    the coarse centroids, the residual codebooks, and the ADC distance
    tables — and never sort-merge the corpus against any of them; the
    corpus-sized relations move only through hash partitioning for the
    per-vector argmin windows and the (query, vec) partial sums."""
    from epe_data_wrangling_spark.catalog import all_queries

    q = all_queries()["ann_ivfpq_topk"].fn(spark, SF_DIR)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
