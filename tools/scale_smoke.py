"""Scale smoke: replicate the sf0.1 tables ~10× into /tmp and run the
heaviest operators on the enlarged corpus — the 'would this plan
survive a scale-up' probe, with evidence instead of assertion.

documents: 10 replicas per doc, each with a replica tag appended to
the text, so every doc acquires 9 *near*-duplicates (Jaccard ≈ 0.8+)
— a worst-practical-case duplicate density for the dedup paths.
lineitem: plain 10× replication (6M rows) for the agg/join paths.

Usage: python tools/scale_smoke.py [base_sf_dir] — prints one JSON
line with per-operator seconds at the enlarged scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from epe_data_wrangling_spark.operators import dedup as X
from epe_data_wrangling_spark.operators import similarity as S
from epe_data_wrangling_spark.session import get_spark

WORK = "/tmp/scale_smoke"
REPLICAS = 10


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    n_docs = docs.count()
    rep = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    big_docs = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.concat("text", F.lit(" replicatag"), F.col("rep").cast("string")).alias("text"),
            "lang",  # kept so stratified shapes (kfold) run on the replica
            "source",
        )
        .repartition(64)
    )
    big_docs.write.mode("overwrite").parquet(f"{WORK}/documents.parquet")

    li = spark.read.parquet(os.path.join(base, "lineitem.parquet"))
    li.crossJoin(rep).drop("rep").repartition(64).write.mode("overwrite").parquet(
        f"{WORK}/lineitem.parquet"
    )

    timings: dict[str, float] = {}

    def run(name: str, df_or_thunk) -> None:
        # queries with eager localCheckpoints (iterative trainers) do
        # real work at CONSTRUCTION time — accept a thunk so that
        # cost lands inside the timer
        t0 = time.perf_counter()
        df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)

    bd = spark.read.parquet(f"{WORK}/documents.parquet")
    run("minhash_lsh_50k_docs", X.minhash_lsh_pairs(bd, "text", "doc_id"))
    # cluster-level simhash: the doc-level pair enumeration is
    # quadratic per duplicate cluster (90M pairs on this corpus);
    # distinct-sketch groups are the scale shape
    run(
        "simhash_groups_50k_docs",
        X.simhash_dedup_groups(bd, "text", "doc_id", num_bits=32, blocks=4),
    )
    run("exact_dedup_50k_docs", X.exact_dedup(bd, "text", "doc_id"))

    bl = spark.read.parquet(f"{WORK}/lineitem.parquet")
    run(
        "q1_shape_6m_rows",
        bl.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.avg("l_extendedprice"),
            F.count(F.lit(1)),
        ),
    )

    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    run(
        "ann_arrow_2k_corpus_100q",
        S.brute_topk_arrow(
            emb.filter(F.col("vec_id") < 100), emb, vec_col="embedding", id_col="vec_id", k=5
        ),
    )

    # r2 additions — run the catalog plans directly against sf0.1
    # inputs (events/orders aren't replicated here; their 10× story is
    # the lineitem-backed pagerank below plus the q1 shape above)
    from epe_data_wrangling_spark.catalog import all_queries

    cat = all_queries()
    for qname, label in [
        ("kmeans_lloyd_centroids", "kmeans_2iter_5k_vecs"),
        ("corpus_dup_ngram_fraction", "dup_ngram_fraction_sf01"),
        ("join_interval_episodes", "interval_join_sf01"),
        ("pagerank_trading_graph", "pagerank_3iter_sf01"),
        # r6: the beyond-broadcast twin (same oracle, same result) —
        # co-partitioned edges, no rank broadcast anywhere
        ("pagerank_partitioned_edges", "pagerank_partitioned_sf01"),
        ("dedup_shared_spans", "shared_spans_sf01"),
        # r4 additions: tokenizer training (vocabulary-sized
        # iterations) and PQ-ADC serving at sf0.1
        ("bpe_train_merges", "bpe_3merges_sf01"),
        ("pq_adc_topk", "pq_adc_sf01"),
        ("mmr_diverse_topk", "mmr_4picks_sf01"),
        # r4-continuation additions: semantic dedup, importance
        # selection, relational LR training, hybrid fusion, the
        # progressive-JPEG Arrow decode path
        ("dedup_semantic_clusters", "semdedup_sf01"),
        ("dsir_importance_select", "dsir_sf01"),
        ("logreg_train_quality", "logreg_16steps_sf01"),
        ("retrieval_rrf_hybrid", "rrf_hybrid_sf01"),
        ("multimodal_jpeg_progressive_stats", "jpeg_progressive_40assets"),
    ]:
        run(label, lambda q=cat[qname]: q.fn(spark, base))

    # r4: distributed-ordering primitives vs the single-task global
    # window they replaced, at 10× (1.5M orders / 50k docs). The
    # sharded form pays 2 extra small jobs (percentile cut points +
    # shard totals) to keep EVERY data-sized stage partitioned — at
    # this modest scale the two should be comparable; the global form
    # degrades with data volume (one task sorts everything), the
    # sharded form with nothing but shard count.
    from pyspark.sql import Window

    from epe_data_wrangling_spark.operators.windows import (
        exact_ntile_from_rank,
        global_row_number,
        sharded_cumsum,
    )

    orders = spark.read.parquet(os.path.join(base, "orders.parquet"))
    (
        orders.crossJoin(rep)
        .select(
            (F.col("o_orderkey") * REPLICAS + F.col("rep")).alias("o_orderkey"),
            "o_totalprice",
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{WORK}/orders.parquet")
    )
    bo = spark.read.parquet(f"{WORK}/orders.parquet")

    def ntile_global():
        w = Window.orderBy("o_totalprice", "o_orderkey")
        b = bo.select(F.ntile(10).over(w).cast("int").alias("bin"), "o_totalprice")
        return b.groupBy("bin").agg(
            F.count(F.lit(1)).alias("n"), F.min("o_totalprice"), F.max("o_totalprice")
        )

    def ntile_sharded():
        ranked, total = global_row_number(
            bo, F.col("o_totalprice"), "o_orderkey", out="_rank"
        )
        b = ranked.select(
            exact_ntile_from_rank("_rank", total, 10).alias("bin"), "o_totalprice"
        )
        return b.groupBy("bin").agg(
            F.count(F.lit(1)).alias("n"), F.min("o_totalprice"), F.max("o_totalprice")
        )

    # sharded forms passed as THUNKS: their construction runs driver
    # jobs (percentile cut points + shard counts) that must land
    # inside the timer for an unbiased comparison
    run("ntile_global_1m5_orders", ntile_global())
    run("ntile_sharded_1m5_orders", ntile_sharded)
    bd_w = bd.select("doc_id", F.length("text").alias("wt"))
    run(
        "cumsum_global_50k_docs",
        bd_w.withColumn("cum", F.sum("wt").over(Window.orderBy("doc_id"))),
    )
    run("cumsum_sharded_50k_docs", lambda: sharded_cumsum(bd_w, "doc_id", "wt", out="cum"))

    # r5: TRUE-10× runs of the two r4 headline heavies (they were
    # previously smoked only at base sf0.1 — VERDICT r4 item 6).
    # shared spans on the replicated corpus: every replica shares its
    # whole text with 9 siblings, so this is max-density span overlap;
    # the max_gram_freq=10 suppression is what keeps the self-join
    # fan-out bounded (grams non-unique in the BASE corpus exceed the
    # cap after 10× replication and are dropped as boilerplate).
    run(
        "shared_spans_50k_docs_10xdup",
        lambda: X.shared_span_pairs(bd, "text", "doc_id"),
    )
    # pagerank on a 10×-node/10×-edge graph: disjoint key-shifted
    # copies of orders+lineitem (keys shifted by rep·10^9 so the 10
    # subgraphs never merge under distinct()); same catalog plan.
    pr_dir = f"{WORK}/pr"
    shift = F.col("rep") * F.lit(10**9)
    (
        orders.select("o_orderkey", "o_custkey")
        .crossJoin(rep)
        .select(
            (F.col("o_orderkey") + shift).alias("o_orderkey"),
            (F.col("o_custkey") + shift).alias("o_custkey"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{pr_dir}/orders.parquet")
    )
    (
        li.select("l_orderkey", "l_suppkey")
        .crossJoin(rep)
        .select(
            (F.col("l_orderkey") + shift).alias("l_orderkey"),
            (F.col("l_suppkey") + shift).alias("l_suppkey"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{pr_dir}/lineitem.parquet")
    )
    run(
        "pagerank_3iter_10x_graph",
        lambda: cat["pagerank_trading_graph"].fn(spark, pr_dir),
    )
    run(
        "pagerank_partitioned_10x_graph",
        lambda: cat["pagerank_partitioned_edges"].fn(spark, pr_dir),
    )

    # r5 new operators at 10×: a mixed dir (10×-replicated fact
    # tables + base dims, symlinked — zero copy) lets the catalog
    # plans run unmodified against the enlarged inputs. NOTE: the
    # orders replica is the ntile benchmark's 2-column projection
    # (o_orderkey, o_totalprice) — enough for the bisect probe; a
    # query touching other orders columns needs a full replica.
    mix = f"{WORK}/mix"
    os.makedirs(mix, exist_ok=True)
    for name, src in (
        ("lineitem.parquet", f"{WORK}/lineitem.parquet"),
        ("orders.parquet", f"{WORK}/orders.parquet"),
        ("part.parquet", os.path.join(base, "part.parquet")),
    ):
        dst = os.path.join(mix, name)
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    run("bloom_prefilter_6m_fact", lambda: cat["join_bloom_prefilter"].fn(spark, mix))
    run("zorder_skipping_6m_rows", lambda: cat["layout_zorder_skipping"].fn(spark, mix))
    run(
        "sql_scripting_bisect_1m5_orders",
        lambda: cat["sql_scripting_bisect_threshold"].fn(spark, mix),
    )

    # r6 operators at base then 10×: CM sketch, sequence packing,
    # weighted reservoir, skew profile, winsorize, kfold. The
    # documents replica carries (doc_id, text, lang, source); events
    # are replicated with offset event_ids (same users — per-user
    # density grows 10×, the harder shape for the rank windows).
    docs_link = os.path.join(mix, "documents.parquet")
    if not os.path.exists(docs_link):
        os.symlink(os.path.abspath(f"{WORK}/documents.parquet"), docs_link)
    from epe_data_wrangling_spark.sources.tables import load_table

    ev = load_table(spark, base, "events")
    n_ev = ev.count()
    (
        ev.crossJoin(rep)
        .select(
            (F.col("event_id") + F.col("rep") * n_ev).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(os.path.join(mix, "events.parquet"))
    )
    for qname, lbl in (
        ("sketch_countmin_heavy_hitters", "countmin"),
        ("pack_sequences_contiguous", "pack_sequences"),
        ("sample_weighted_reservoir", "weighted_reservoir"),
        ("skew_key_profile", "skew_profile"),
        ("feature_winsorize_robust", "winsorize"),
        ("split_kfold_assignment", "kfold"),
    ):
        run(f"{lbl}_sf01", lambda q=cat[qname]: q.fn(spark, base))
        run(f"{lbl}_10x", lambda q=cat[qname]: q.fn(spark, mix))

    # r7: the snapshot-diff / IVM family needs full-width orders
    # (status, priority); keys shifted per replica so the carving
    # mods stay deterministic and keys unique
    of = f"{WORK}/orders_full_dir"
    os.makedirs(of, exist_ok=True)
    orders_full = spark.read.parquet(os.path.join(base, "orders.parquet"))
    (
        orders_full.crossJoin(rep)
        .select(
            (F.col("o_orderkey") + F.col("rep") * F.lit(10_000_000)).alias(
                "o_orderkey"
            ),
            *[c for c in orders_full.columns if c != "o_orderkey"],
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{of}/orders.parquet")
    )
    for qname, lbl in (
        ("snapshot_diff_keyed", "snapshot_diff"),
        ("ivm_apply_changeset", "ivm_apply"),
        ("streaming_ivm_agg_merge", "streaming_ivm_4refresh"),
    ):
        run(f"{lbl}_sf01", lambda q=cat[qname]: q.fn(spark, base))
        run(f"{lbl}_10x", lambda q=cat[qname]: q.fn(spark, of))

    # r7 cont.: attribution over 10× events; the split-leakage pair at
    # 10× duplicate density (every doc has 9 near-dup replicas →
    # ~10-doc clusters, the component fixpoint's stress shape)
    for qname, lbl in (
        ("attribution_position_weighted", "attribution_uweighted"),
        ("split_leakage_near_dups", "split_leakage"),
        ("split_by_dedup_cluster", "cluster_aware_split"),
    ):
        run(f"{lbl}_sf01", lambda q=cat[qname]: q.fn(spark, base))
        run(f"{lbl}_10x", lambda q=cat[qname]: q.fn(spark, mix))

    # r8: the remaining r7 queries without 10× rows (SQL UDF pair,
    # privacy pair, fixed-width supplier) plus the two r8 additions
    # (zoned ledger, CDC retraction pipeline). These need full-width
    # orders with CONSISTENTLY shifted o_custkey (the spine joins
    # orders→customer), a shifted customer replica, and a shifted
    # supplier replica — mix2 assembles that, reusing the lineitem
    # and events replicas via symlink.
    mix2 = f"{WORK}/mix2"
    os.makedirs(mix2, exist_ok=True)
    for name, src in (
        ("region.parquet", os.path.join(base, "region.parquet")),
        ("nation.parquet", os.path.join(base, "nation.parquet")),
        ("lineitem.parquet", f"{WORK}/lineitem.parquet"),
        ("events.parquet", os.path.join(mix, "events.parquet")),
    ):
        dst = os.path.join(mix2, name)
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    kshift = F.col("rep") * F.lit(10_000_000)
    (
        orders_full.crossJoin(rep)
        .select(
            (F.col("o_orderkey") + kshift).alias("o_orderkey"),
            (F.col("o_custkey") + kshift).alias("o_custkey"),
            *[c for c in orders_full.columns if c not in ("o_orderkey", "o_custkey")],
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{mix2}/orders.parquet")
    )
    cust = spark.read.parquet(os.path.join(base, "customer.parquet"))
    (
        cust.crossJoin(rep)
        .select(
            (F.col("c_custkey") + kshift).alias("c_custkey"),
            *[c for c in cust.columns if c != "c_custkey"],
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(f"{mix2}/customer.parquet")
    )
    supp = spark.read.parquet(os.path.join(base, "supplier.parquet"))
    (
        supp.crossJoin(rep)
        .select(
            (F.col("s_suppkey") + F.col("rep") * F.lit(1_000_000)).alias("s_suppkey"),
            *[c for c in supp.columns if c != "s_suppkey"],
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{mix2}/supplier.parquet")
    )
    for qname, lbl in (
        ("sql_udf_pricing_chain", "sql_udf_chain"),
        ("sql_udf_table_month_spine", "sql_udf_spine"),
        ("dp_noisy_group_counts", "dp_noisy_counts"),
        ("kanon_quasi_identifier_audit", "kanon_audit"),
        ("fixed_width_source_suppliers", "fixed_width_suppliers"),
        ("fixed_width_zoned_order_ledger", "fixed_width_ledger"),
        ("streaming_cdc_retraction_pipeline", "cdc_retraction_3gen"),
        ("ivm_join_delta_maintenance", "ivm_join_delta"),
        ("ivm_outer_join_maintenance", "ivm_outer_join"),
        ("ivm_topk_affected_groups", "ivm_topk_affected"),
        ("ivm_distinct_count_support", "ivm_distinct_support"),
        ("streaming_join_view_maintenance", "streaming_join_view_3gen"),
        ("streaming_outer_join_view_maintenance", "streaming_outer_view_3gen"),
    ):
        run(f"{lbl}_sf01", lambda q=cat[qname]: q.fn(spark, base))
        run(f"{lbl}_10x", lambda q=cat[qname]: q.fn(spark, mix2))

    # ---- r9: the r9 additions end-to-end, plus the REFRESH-COST
    # isolation experiment: hold the CHANGE fixed in absolute size
    # while the corpus grows 10×. End-to-end catalog runs include the
    # fixture build (itself snapshot-sized), so the isolation rows are
    # what separate the claims: the snapshot-CDC sink's second refresh
    # must track the snapshot (diff + image rewrite), the op-log
    # sink's must track the delta (flat), and the pruned IVM refresh
    # must read only the touched buckets of the 10× base.
    for qname, lbl in (
        ("streaming_cdc_oplog_pipeline", "cdc_oplog_3gen"),
        ("streaming_cdc_tombstone_pipeline", "cdc_tombstone_3gen"),
        ("streaming_join_view_oplog_pipeline", "join_view_oplog_3gen"),
        ("streaming_outer_join_view_oplog_pipeline", "outer_join_view_oplog_3gen"),
        ("ivm_join_delta_pruned_base", "ivm_join_delta_pruned"),
        ("ivm_minmax_support", "ivm_minmax"),
        (
            "streaming_distinct_count_view_maintenance",
            "streaming_distinct_view_3gen",
        ),
        # r10 additions end-to-end
        ("streaming_distinct_count_oplog_pipeline", "distinct_oplog_3gen"),
        ("streaming_minmax_view_maintenance", "minmax_oplog_3gen"),
        ("streaming_topk_view_maintenance", "topk_oplog_3gen"),
        ("streaming_distinct_count_tombstone_pipeline", "distinct_tomb_3gen"),
    ):
        run(f"{lbl}_sf01", lambda q=cat[qname]: q.fn(spark, base))
        run(f"{lbl}_10x", lambda q=cat[qname]: q.fn(spark, mix2))

    from epe_data_wrangling_spark.catalog.evolve_q import (
        _signed_delta,
        ivm_pruned_join_refresh,
    )
    from epe_data_wrangling_spark.catalog.streaming_q import (
        _land_generations,
        _oplog_from_versions,
    )
    from epe_data_wrangling_spark.streaming.ops import (
        cdc_oplog_foreach_batch,
        cdc_retraction_foreach_batch,
    )

    def _carve_fixed_delta(sfdir):
        """v1 → v2 with a FIXED-absolute-size change: status flips on
        keys ≡0 mod 9973 below the replica shift (10M), so the base
        corpus and the 10× replica carry the SAME ~600-row delta."""
        o = spark.read.parquet(os.path.join(sfdir, "orders.parquet"))
        v1 = o.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderstatus",
        )
        v2 = v1.withColumn(
            "o_orderstatus",
            F.when(
                (F.col("o_orderkey") % 9973 == 0)
                & (F.col("o_orderkey") < 10_000_000),
                F.lit("X"),
            ).otherwise(F.col("o_orderstatus")),
        )
        return v1, v2

    snap_schema = (
        "o_orderkey BIGINT, cents BIGINT, o_orderstatus STRING, "
        "snapshot_version INT"
    )
    oplog_schema = (
        "o_orderkey BIGINT, seq BIGINT, op STRING, o_orderstatus STRING, "
        "cents BIGINT, prev_o_orderstatus STRING, prev_cents BIGINT"
    )

    for tag, sfdir in (("sf01", base), ("10x", mix2)):
        v1, v2 = _carve_fixed_delta(sfdir)
        # snapshot-fed sink: bootstrap untimed, SECOND refresh timed —
        # its cost is the full-image diff + image rewrite
        root = f"{WORK}/cdcsnap_{tag}"
        landing = os.path.join(root, "landing")
        os.makedirs(landing)

        def go_snap(root=root, landing=landing):
            stream = spark.readStream.schema(snap_schema).parquet(landing)
            return cdc_retraction_foreach_batch(
                stream,
                os.path.join(root, "state"),
                key_cols=["o_orderkey"],
                version_col="snapshot_version",
                group_cols=["o_orderstatus"],
                sum_cols=["cents"],
                checkpoint_dir=os.path.join(root, "ckpt"),
            )

        _land_generations(
            landing, [v1.withColumn("snapshot_version", F.lit(1))], prefix="a"
        )
        go_snap()  # bootstrap (corpus-sized by definition) — untimed
        _land_generations(
            landing, [v2.withColumn("snapshot_version", F.lit(2))], prefix="b"
        )
        run(f"cdc_snapshot_2nd_refresh_{tag}", go_snap)

        # op-log sink: same change, delivered as ~600 U-ops (built
        # pre-timer — the log producer's job); the timed refresh is
        # delta + |groups| only, no image anywhere
        root = f"{WORK}/cdclog_{tag}"
        landing = os.path.join(root, "landing")
        os.makedirs(landing)

        def go_log(root=root, landing=landing):
            stream = spark.readStream.schema(oplog_schema).parquet(landing)
            return cdc_oplog_foreach_batch(
                stream,
                os.path.join(root, "state"),
                op_col="op",
                seq_col="seq",
                group_cols=["o_orderstatus"],
                sum_cols=["cents"],
                checkpoint_dir=os.path.join(root, "ckpt"),
            )

        _land_generations(
            landing, [_oplog_from_versions(None, v1, 10**10)], prefix="a"
        )
        go_log()  # bootstrap load — untimed
        _land_generations(
            landing, [_oplog_from_versions(v1, v2, 2 * 10**10)], prefix="b"
        )
        run(f"cdc_oplog_2nd_refresh_{tag}", go_log)

        # tombstone sink: same fixed-delta experiment but the change
        # is ~60 keys (mod 99731) over 256 buckets, so the timed
        # second refresh rewrites only the touched slice of the 10×
        # image (the rest hardlinks) — cost must grow far slower than
        # the snapshot sink's
        from epe_data_wrangling_spark.catalog.streaming_q import (
            _tombstone_log_from_versions,
        )
        from epe_data_wrangling_spark.streaming.ops import (
            cdc_tombstone_foreach_batch,
        )

        o_ = spark.read.parquet(os.path.join(sfdir, "orders.parquet"))
        t1 = o_.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderstatus",
        )
        t2 = t1.withColumn(
            "o_orderstatus",
            F.when(
                (F.col("o_orderkey") % 99731 == 0)
                & (F.col("o_orderkey") < 10_000_000),
                F.lit("X"),
            ).otherwise(F.col("o_orderstatus")),
        )
        tomb_schema = (
            "o_orderkey BIGINT, seq BIGINT, op STRING, "
            "o_orderstatus STRING, cents BIGINT"
        )
        root = f"{WORK}/cdctomb_{tag}"
        landing = os.path.join(root, "landing")
        os.makedirs(landing)

        def go_tomb(root=root, landing=landing):
            stream = spark.readStream.schema(tomb_schema).parquet(landing)
            return cdc_tombstone_foreach_batch(
                stream,
                os.path.join(root, "state"),
                key_cols=["o_orderkey"],
                op_col="op",
                seq_col="seq",
                group_cols=["o_orderstatus"],
                sum_cols=["cents"],
                n_buckets=256,
                checkpoint_dir=os.path.join(root, "ckpt"),
            )

        _land_generations(
            landing, [_tombstone_log_from_versions(None, t1, 10**10)], prefix="a"
        )
        go_tomb()  # bootstrap image build — untimed
        _land_generations(
            landing, [_tombstone_log_from_versions(t1, t2, 2 * 10**10)], prefix="b"
        )
        run(f"cdc_tombstone_2nd_refresh_{tag}", go_tomb)

        # pruned vs full-scan IVM join refresh on a sparse dim delta
        # (10 customer keys flip segment at every scale → ≤10 of 64
        # buckets touched); base partitioned write is the standing
        # store, built untimed
        cdf = spark.read.parquet(os.path.join(sfdir, "customer.parquet"))
        s1 = cdf.select("c_custkey", "c_mktsegment")
        s2 = s1.withColumn(
            "c_mktsegment",
            F.when(
                (F.col("c_custkey") % 1499 == 0)
                & (F.col("c_custkey") < 10_000_000),
                F.lit("MACHINERY"),
            ).otherwise(F.col("c_mktsegment")),
        )
        r1 = spark.read.parquet(os.path.join(sfdir, "orders.parquet")).select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderstatus",
        )
        base_dir = f"{WORK}/ivm_base_{tag}"
        r1.withColumn("_kb", F.pmod(F.col("o_custkey"), F.lit(64))).write.partitionBy(
            "_kb"
        ).parquet(base_dir)
        stored = spark.read.parquet(base_dir)
        dR = spark.createDataFrame(
            [],
            "o_orderkey BIGINT, o_custkey BIGINT, cents BIGINT, "
            "o_orderstatus STRING, sign INT",
        )
        dS = _signed_delta(s1, s2, "c_custkey", ["c_mktsegment"]).localCheckpoint(
            eager=True
        )
        sfull, sd = stored.alias("sf"), dS.alias("ds")
        run(
            f"ivm_refresh_fullscan_{tag}",
            sfull.join(
                F.broadcast(sd), F.col("sf.o_custkey") == F.col("ds.c_custkey")
            )
            .groupBy("c_mktsegment", "o_orderstatus")
            .agg(
                F.sum("sign").alias("dn"),
                F.sum(F.col("sign") * F.col("cents")).alias("ds_"),
            ),
        )
        run(
            f"ivm_refresh_pruned_{tag}",
            lambda stored=stored, dR=dR, s1=s1, dS=dS: ivm_pruned_join_refresh(
                spark, stored, dR, s1, dS
            )[0],
        )

        # ---- r10: fixed-delta isolation for the two new op-log
        # sinks. Both keep a BUCKETED support table, so the honest
        # scale knob is production bucket sizing: n_buckets grows with
        # the corpus (fixed target bucket SIZE), making the touched-
        # bucket slice a ~constant number of rows — the timed second
        # refresh should be ~flat while the bootstrap (untimed here)
        # is corpus-sized by definition. The fixed ~60-row delta is
        # the tombstone experiment's carving (mod 99731, below the
        # replica shift).
        from epe_data_wrangling_spark.catalog.streaming_q import _rel_oplog
        from epe_data_wrangling_spark.streaming.ops import (
            distinct_count_oplog_foreach_batch,
            minmax_view_oplog_foreach_batch,
        )

        nb = 256 if tag == "sf01" else 2560

        o10 = spark.read.parquet(os.path.join(sfdir, "orders.parquet"))
        d1 = o10.select("o_orderkey", "o_custkey", "o_orderstatus")
        d2 = d1.withColumn(
            "o_orderstatus",
            F.when(
                (F.col("o_orderkey") % 99731 == 0)
                & (F.col("o_orderkey") < 10_000_000),
                F.lit("X"),
            ).otherwise(F.col("o_orderstatus")),
        )
        dlog_schema = (
            "o_orderkey BIGINT, seq BIGINT, op STRING, o_custkey BIGINT, "
            "o_orderstatus STRING, prev_o_custkey BIGINT, "
            "prev_o_orderstatus STRING"
        )
        root = f"{WORK}/dlog_{tag}"
        landing = os.path.join(root, "landing")
        os.makedirs(landing)

        def go_dlog(root=root, landing=landing, nb=nb):
            stream = spark.readStream.schema(dlog_schema).parquet(landing)
            return distinct_count_oplog_foreach_batch(
                stream,
                os.path.join(root, "state"),
                op_col="op",
                seq_col="seq",
                group_col="o_orderstatus",
                value_col="o_custkey",
                n_buckets=nb,
                checkpoint_dir=os.path.join(root, "ckpt"),
            )

        dcols = ["o_custkey", "o_orderstatus"]
        _land_generations(
            landing, [_rel_oplog(None, d1, "o_orderkey", dcols, 10**10)],
            prefix="a",
        )
        go_dlog()  # bootstrap support build (corpus-sized) — untimed
        _land_generations(
            landing, [_rel_oplog(d1, d2, "o_orderkey", dcols, 2 * 10**10)],
            prefix="b",
        )
        run(f"distinct_oplog_2nd_refresh_{tag}", go_dlog)

        # minmax: many synthetic groups (pmod(custkey, 8192)) so the
        # touched-GROUP prune is visible — the fixed delta bumps cents
        # on ~60 keys, touching ≤60 of 8192 groups / ≤60 of nb buckets
        m1 = o10.select(
            "o_orderkey",
            F.pmod(F.col("o_custkey"), F.lit(8192)).alias("g"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        m2 = m1.withColumn(
            "cents",
            F.when(
                (F.col("o_orderkey") % 99731 == 0)
                & (F.col("o_orderkey") < 10_000_000),
                F.col("cents") + 777,
            ).otherwise(F.col("cents")),
        )
        mmlog_schema = (
            "o_orderkey BIGINT, seq BIGINT, op STRING, g BIGINT, "
            "cents BIGINT, prev_g BIGINT, prev_cents BIGINT"
        )
        root = f"{WORK}/mmlog_{tag}"
        landing = os.path.join(root, "landing")
        os.makedirs(landing)

        def go_mmlog(root=root, landing=landing, nb=nb):
            stream = spark.readStream.schema(mmlog_schema).parquet(landing)
            return minmax_view_oplog_foreach_batch(
                stream,
                os.path.join(root, "state"),
                op_col="op",
                seq_col="seq",
                group_cols=["g"],
                value_col="cents",
                n_buckets=nb,
                checkpoint_dir=os.path.join(root, "ckpt"),
            )

        mcols = ["g", "cents"]
        _land_generations(
            landing, [_rel_oplog(None, m1, "o_orderkey", mcols, 10**10)],
            prefix="a",
        )
        go_mmlog()  # bootstrap — untimed
        _land_generations(
            landing, [_rel_oplog(m1, m2, "o_orderkey", mcols, 2 * 10**10)],
            prefix="b",
        )
        run(f"minmax_oplog_2nd_refresh_{tag}", go_mmlog)

        # top-k sink: same fixed ~60-row delta over per-customer
        # groups; the second refresh reads/rewrites only the touched
        # group buckets of image AND view and re-ranks ≤60 groups
        from epe_data_wrangling_spark.streaming.ops import (
            topk_view_oplog_foreach_batch,
        )

        k1 = o10.select("o_orderkey", "o_custkey",
                        F.round(F.col("o_totalprice") * 100).cast("bigint")
                        .alias("cents"))
        k2_df = k1.withColumn(
            "cents",
            F.when(
                (F.col("o_orderkey") % 99731 == 0)
                & (F.col("o_orderkey") < 10_000_000),
                F.col("cents") + 100000,
            ).otherwise(F.col("cents")),
        )
        tklog_schema = (
            "o_orderkey BIGINT, seq BIGINT, op STRING, o_custkey BIGINT, "
            "cents BIGINT, prev_o_custkey BIGINT, prev_cents BIGINT"
        )
        root = f"{WORK}/tklog_{tag}"
        landing = os.path.join(root, "landing")
        os.makedirs(landing)

        def go_tklog(root=root, landing=landing, nb=nb):
            stream = spark.readStream.schema(tklog_schema).parquet(landing)
            return topk_view_oplog_foreach_batch(
                stream,
                os.path.join(root, "state"),
                key_cols=["o_orderkey"],
                op_col="op",
                seq_col="seq",
                group_cols=["o_custkey"],
                value_col="cents",
                k=3,
                n_buckets=nb,
                checkpoint_dir=os.path.join(root, "ckpt"),
            )

        kcols = ["o_custkey", "cents"]
        _land_generations(
            landing, [_rel_oplog(None, k1, "o_orderkey", kcols, 10**10)],
            prefix="a",
        )
        go_tklog()  # bootstrap image+view build — untimed
        _land_generations(
            landing, [_rel_oplog(k1, k2_df, "o_orderkey", kcols, 2 * 10**10)],
            prefix="b",
        )
        run(f"topk_oplog_2nd_refresh_{tag}", go_tklog)

    n_pairs = X.minhash_lsh_pairs(bd, "text", "doc_id").count()
    n_groups = X.simhash_dedup_groups(bd, "text", "doc_id", num_bits=32, blocks=4).count()
    print(
        json.dumps(
            {
                "docs": n_docs * REPLICAS,
                "lineitem_rows": li.count() * REPLICAS,
                "minhash_pairs_found": n_pairs,
                "simhash_group_pairs_found": n_groups,
                "timings_sec": timings,
            }
        )
    )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
