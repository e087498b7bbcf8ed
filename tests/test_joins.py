"""As-of join semantics: backward match, equal-timestamp ties,
leading rows with no match, and key isolation."""

from __future__ import annotations

from datetime import datetime

from epe_data_wrangling_spark.operators.joins import asof_join_backward


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts("2020-01-01 00:05:00")),  # before any right row → null
            (2, 1, _ts("2020-01-01 00:10:00")),  # exactly at right ts → matches it
            (3, 1, _ts("2020-01-01 00:25:00")),  # between rights → earlier one
            (4, 1, _ts("2020-01-01 00:40:00")),  # after all → latest
            (5, 2, _ts("2020-01-01 00:30:00")),  # other key: only its own rights
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2020-01-01 00:10:00"), 10.0),
            (1, _ts("2020-01-01 00:30:00"), 30.0),
            (2, _ts("2020-01-01 00:01:00"), 99.0),
        ],
        "user_id long, rts timestamp, v double",
    )
    out = {
        r.event_id: (r.asof_rts, r.asof_v)
        for r in asof_join_backward(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            value_cols=["rts", "v"],
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2020-01-01 00:10:00"), 10.0)
    assert out[3] == (_ts("2020-01-01 00:10:00"), 10.0)
    assert out[4] == (_ts("2020-01-01 00:30:00"), 30.0)
    assert out[5] == (_ts("2020-01-01 00:01:00"), 99.0)
    assert len(out) == 5  # all left rows survive (left semantics)


def test_q21_sole_supplier_semantics_on_crafted_orders(spark):
    """Crafted case: order A has lines only from supplier 1 (sole),
    order B mixes suppliers 1 and 2 (not sole), order C is sole but
    not order-status F — only order A may count."""
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [(100, 1), (100, 1), (200, 1), (200, 2), (300, 3)],
        "l_orderkey long, l_suppkey long",
    )
    orders = spark.createDataFrame(
        [(100, "F"), (200, "F"), (300, "O")],
        "o_orderkey long, o_orderstatus string",
    )
    o = orders.filter(F.col("o_orderstatus") == "F")
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    cand = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_anti",
        )
    )
    got = {
        (r.l_suppkey, r.n)
        for r in cand.groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert got == {(1, 1)}  # supplier 1, exactly order 100


def test_asof_forward_semantics(spark):
    """Forward mirror: earliest right with rts >= ts; equal timestamp
    matches; tolerance nulls far matches; equal-ts right rows break
    ties on right_tie; keys are isolated."""
    from epe_data_wrangling_spark.operators.joins import asof_join_forward

    left = spark.createDataFrame(
        [
            (1, 1, _ts("2020-01-01 00:05:00")),  # next right at 00:10 → match
            (2, 1, _ts("2020-01-01 00:10:00")),  # equal ts → matches 00:10
            (3, 1, _ts("2020-01-01 00:31:00")),  # next right 02:00, > 1h away → null
            (4, 2, _ts("2020-01-01 00:00:00")),  # two rights at same ts → min rid
            (5, 3, _ts("2020-01-01 00:00:00")),  # key with no rights → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (11, 1, _ts("2020-01-01 00:10:00"), 10.0),
            (12, 1, _ts("2020-01-01 02:00:00"), 30.0),
            (22, 2, _ts("2020-01-01 00:30:00"), 22.0),
            (21, 2, _ts("2020-01-01 00:30:00"), 21.0),
        ],
        "rid long, user_id long, rts timestamp, v double",
    )
    out = {
        r.event_id: (r.asof_ts, r.asof_rid, r.asof_v)
        for r in asof_join_forward(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            value_cols=["rid", "v"], right_tie="rid", tolerance_seconds=3600,
        ).collect()
    }
    assert out[1] == (_ts("2020-01-01 00:10:00"), 11, 10.0)
    assert out[2] == (_ts("2020-01-01 00:10:00"), 11, 10.0)
    assert out[3] == (None, None, None)
    assert out[4] == (_ts("2020-01-01 00:30:00"), 21, 21.0)
    assert out[5] == (None, None, None)
    assert len(out) == 5


def test_bloom_prefilter_no_false_negatives_and_mapside(spark):
    """bloom_flag_fact: (1) every true-matching fact row passes the
    filter (no false negatives — the invariant that lets the real
    join re-check false positives without ever losing rows); (2) the
    flagged fact plan has NO shuffle on the fact side — the filter
    must be a map-side expression over a 1-row broadcast, or it
    wouldn't be a pre-SHUFFLE prune at scale."""
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.operators.joins import bloom_flag_fact

    dim = spark.range(0, 500, 7).select(F.col("id").alias("k"))  # 72 keys
    fact = spark.range(0, 5000).select((F.col("id") % 500).alias("fk"))
    flagged = bloom_flag_fact(fact, dim, dim_key="k", fact_key="fk")
    rows = flagged.collect()
    true_keys = {r.k for r in dim.collect()}
    false_neg = [r for r in rows if r.fk in true_keys and not r._bloom_pass]
    assert not false_neg
    # false positives exist in principle but must be rare (2048 bits,
    # 72 keys, k=3 → fp ≈ (1-e^(-216/2048))^3 ≈ 0.1%)
    n_fp = sum(1 for r in rows if r.fk not in true_keys and r._bloom_pass)
    assert n_fp <= len(rows) * 0.05
    # plan: fact side reaches the bloom check without an Exchange
    # (the only broadcast is the 1-row filter map)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    fact_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in fact_side, fact_side


def test_native_runtime_bloom_filter_injects(spark):
    """Spark's own InjectRuntimeFilter produces the same pattern
    automatically when thresholds allow — pin that the engine-native
    path is available (bloomFilter enabled) and injects a
    might_contain probe for a selective dim join once the size
    thresholds are lowered to test scale. If a Spark upgrade changes
    these conf names or the plan shape, this fails loudly."""
    import uuid

    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ so the filter matters
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    tmp = f"/tmp/bloom_native_{uuid.uuid4().hex}"
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.range(0, 100_000).select(
            F.col("id").alias("fk"), (F.col("id") % 97).alias("pay")
        ).write.parquet(f"{tmp}/fact")
        spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("attr")
        ).write.parquet(f"{tmp}/dim")
        fact = spark.read.parquet(f"{tmp}/fact")
        dim = spark.read.parquet(f"{tmp}/dim").filter(F.col("attr") == 3)
        joined = fact.join(dim, fact.fk == dim.k)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
