"""Incremental ANN index maintenance (`streaming.ann_index`): IVF
refresh without retrain — bootstrap trains, later generations append
under the frozen quantizer, serve probes only its cells, and the
final state equals the from-scratch recompute."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions import vectors as V
from epe_data_wrangling_spark.sources.tables import load_table
from epe_data_wrangling_spark.streaming.ann_index import (
    ivf_index_foreach_batch,
    ivf_index_topk,
)

SF_DIR = "/root/testdata/sf0.001"
NQ, PROBE, K = 12, 3, 3


def _land(df, landing: str, name: str, order: int) -> None:
    from epe_data_wrangling_spark.streaming.sources import land_single_file

    land_single_file(df, landing, name, order)


def _run(spark, landing: str, target: str, ck: str, k_cells: int = 8,
         per_file: bool = True) -> None:
    reader = spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)
    ivf_index_foreach_batch(
        reader.parquet(landing), target,
        k_cells=k_cells, train_iters=2, checkpoint_dir=ck,
    )


def _gens(spark):
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    return [e.filter(F.col("vec_id") % 3 == i) for i in range(3)], e


def _queries(e):
    return e.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )


def _serve_set(spark, target, e):
    return {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_index_topk(
            spark, target, _queries(e), probe=PROBE, k=K
        ).collect()
    }


def _direct_recompute(spark, target, e):
    """Assign ALL vectors against the index's FROZEN centroids, probe,
    rank — what the maintained index must equal exactly."""
    cents = spark.read.parquet(os.path.join(target, "centroids"))
    c = cents.withColumn("cc", V.dot(F.col("c"), F.col("c")))
    ev = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("vv", V.dot(F.col("v"), F.col("v")))
    d2 = (F.col("vv") - 2 * V.dot(F.col("v"), F.col("c"))) + F.col("cc")
    w_a = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cid"))
    assigned = (
        ev.crossJoin(F.broadcast(c))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w_a))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "vv", F.col("cid").alias("cell"))
    )
    q = assigned.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vv").alias("qq"),
    )
    d2q = (F.col("qq") - 2 * V.dot(F.col("qv"), F.col("c"))) + F.col("cc")
    w_p = Window.partitionBy("query_id").orderBy(F.col("d2q"), F.col("cid"))
    probes = (
        q.crossJoin(F.broadcast(c))
        .withColumn("d2q", d2q)
        .withColumn("rn", F.row_number().over(w_p))
        .filter(F.col("rn") <= PROBE)
        .select("query_id", "qv", "qq", F.col("cid").alias("cell"))
    )
    d2x = F.round(
        (
            (F.col("qq") - 2 * V.dot(F.col("qv"), F.col("v")))
            + F.col("vv")
        )
        * F.lit(1e9)
    ).cast("bigint")
    w_k = Window.partitionBy("query_id").orderBy("d2_r", "neighbor_id")
    return {
        (r.query_id, r.neighbor_id, r.rank)
        for r in probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), d2x.alias("d2_r")
        )
        .withColumn("rank", F.row_number().over(w_k).cast("int"))
        .filter(F.col("rank") <= K)
        .collect()
    }


def test_ann_index_converges_on_recompute(spark, tmp_path):
    """Three append generations (one sink run per landing — the
    monthly-cycle driving pattern) must serve exactly what a
    from-scratch assignment against the frozen quantizer serves."""
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    for i, g in enumerate(gens, start=1):
        _land(g, landing, f"g{i}.parquet", i)
        _run(spark, landing, target, ck)
    got = _serve_set(spark, target, e)
    assert got == _direct_recompute(spark, target, e)
    assert len({q for q, _, _ in got}) == NQ


def test_ann_index_batch_split_invariance(spark, tmp_path):
    """One run over three landed files (per-file triggers) and three
    incremental land+run cycles must produce identical serve results
    — the appends compose."""
    gens, e = _gens(spark)
    l1, l2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    for i, g in enumerate(gens, start=1):
        _land(g, l1, f"g{i}.parquet", i)
    t1 = str(tmp_path / "t1")
    _run(spark, l1, t1, str(tmp_path / "ck1"))
    t2 = str(tmp_path / "t2")
    ck2 = str(tmp_path / "ck2")
    for i, g in enumerate(gens, start=1):
        _land(g, l2, f"g{i}.parquet", i)
        _run(spark, l2, t2, ck2)
    assert _serve_set(spark, t1, e) == _serve_set(spark, t2, e)


def test_ann_index_replay_noop_and_fresh_checkpoint_guard(spark, tmp_path):
    """Replay over applied files (fresh checkpoint, no new data) must
    change nothing; new data under a fresh checkpoint must raise, not
    silently drop or double-append."""
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    for i, g in enumerate(gens[:2], start=1):
        _land(g, landing, f"g{i}.parquet", i)
    _run(spark, landing, target, str(tmp_path / "ck1"))
    before = _serve_set(spark, target, e)
    _run(spark, landing, target, str(tmp_path / "ck2"))  # pure replay
    assert _serve_set(spark, target, e) == before
    # a fresh-checkpoint SINGLE batch mixing applied files with a
    # never-applied one cannot be told from a replay by batch_id alone
    # — the provenance guard must raise, not drop or double-append
    _land(gens[2], landing, "g3.parquet", 3)
    with pytest.raises(Exception, match="never-applied"):
        _run(spark, landing, target, str(tmp_path / "ck3"), per_file=False)
    # resuming with the ORIGINAL checkpoint applies exactly the new file
    _run(spark, landing, target, str(tmp_path / "ck1"))
    assert _serve_set(spark, target, e) == _direct_recompute(spark, target, e)


def test_ann_index_duplicate_id_raises(spark, tmp_path):
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    _land(gens[0], landing, "g1.parquet", 1)
    _run(spark, landing, target, ck)
    # re-deliver a gen-1 vector as if new: same vector, same frozen
    # assignment -> caught in its cell
    _land(gens[0].limit(1), landing, "g2.parquet", 2)
    with pytest.raises(Exception, match="already present"):
        _run(spark, landing, target, ck)


def test_ann_index_k_cells_drift_raises(spark, tmp_path):
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    _land(gens[0], landing, "g1.parquet", 1)
    _run(spark, landing, target, ck, k_cells=8)
    _land(gens[1], landing, "g2.parquet", 2)
    with pytest.raises(Exception, match="k_cells"):
        _run(spark, landing, target, ck, k_cells=4)


def test_ann_index_serve_prunes_and_broadcasts(spark, tmp_path):
    """The serve plan must (a) push the probed-cell `_kb` filter to
    the index scan (manifest bucket pruning) and (b) broadcast the
    query/centroid sides — never sort-merge the index."""
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    for i, g in enumerate(gens, start=1):
        _land(g, landing, f"g{i}.parquet", i)
    _run(spark, landing, target, str(tmp_path / "ck"))
    out = ivf_index_topk(spark, target, _queries(e), probe=PROBE, k=K)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    assert "_kb" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- PQ-coded twin (codes-only store, external re-rank) --------------

from epe_data_wrangling_spark.streaming.ann_index import (  # noqa: E402
    ivfpq_index_foreach_batch,
    ivfpq_index_topk,
)


def _pq_run(spark, landing: str, target: str, ck: str, pq_m: int = 4,
            per_file: bool = True) -> None:
    reader = spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)
    ivfpq_index_foreach_batch(
        reader.parquet(landing), target,
        k_cells=8, train_iters=2, pq_m=pq_m, pq_sub=64 // pq_m, cbk=32,
        checkpoint_dir=ck,
    )


def _pq_serve_set(spark, target, e):
    vectors = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivfpq_index_topk(
            spark, target, _queries(e), vectors, probe=PROBE, cand=30, k=K
        ).collect()
    }


def test_ivfpq_index_batch_split_invariance(spark, tmp_path):
    """Incremental land+run cycles and one per-file-trigger run must
    produce identical code stores — serve results equal. (Exact
    convergence-on-recompute is certified by the catalog oracle.)"""
    gens, e = _gens(spark)
    l1, l2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    for i, g in enumerate(gens, start=1):
        _land(g, l1, f"g{i}.parquet", i)
    t1 = str(tmp_path / "t1")
    _pq_run(spark, l1, t1, str(tmp_path / "ck1"))
    t2 = str(tmp_path / "t2")
    ck2 = str(tmp_path / "ck2")
    for i, g in enumerate(gens, start=1):
        _land(g, l2, f"g{i}.parquet", i)
        _pq_run(spark, l2, t2, ck2)
    s1 = _pq_serve_set(spark, t1, e)
    assert s1 == _pq_serve_set(spark, t2, e)
    assert len({q for q, _, _ in s1}) == NQ


def test_ivfpq_index_fresh_checkpoint_guard_and_dim_check(spark, tmp_path):
    """The PQ twin keeps the module's provenance discipline (a fresh-
    checkpoint single batch mixing applied and never-applied files
    raises), and a layout whose pq_m*pq_sub does not cover the vector
    raises instead of silently encoding a residual prefix."""
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    _land(gens[0], landing, "g1.parquet", 1)
    _pq_run(spark, landing, target, str(tmp_path / "ck1"))
    _land(gens[1], landing, "g2.parquet", 2)
    with pytest.raises(Exception, match="never-applied"):
        _pq_run(spark, landing, target, str(tmp_path / "ck2"),
                per_file=False)
    with pytest.raises(Exception, match="pq_m\\*pq_sub"):
        ivfpq_index_foreach_batch(
            spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
            .parquet(landing),
            str(tmp_path / "state2"),
            k_cells=8, train_iters=2, pq_m=4, pq_sub=8, cbk=32,
            checkpoint_dir=str(tmp_path / "ck3"),
        )


def test_ivfpq_index_layout_drift_and_duplicate_raise(spark, tmp_path):
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    _land(gens[0], landing, "g1.parquet", 1)
    _pq_run(spark, landing, target, ck, pq_m=4)
    _land(gens[1], landing, "g2.parquet", 2)
    with pytest.raises(Exception, match="pq_layout|misread"):
        _pq_run(spark, landing, target, ck, pq_m=2)
    _pq_run(spark, landing, target, ck, pq_m=4)  # matching layout applies
    _land(gens[0].limit(1), landing, "g3.parquet", 3)
    with pytest.raises(Exception, match="already present"):
        _pq_run(spark, landing, target, ck, pq_m=4)


def test_ivfpq_index_serve_prunes_and_broadcasts(spark, tmp_path):
    """The PQ serve plan must read codes pruned to the probed cells
    (PushedFilters `_kb`) and broadcast the small sides (ADC tables,
    candidates, queries) — never sort-merge the code store."""
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    for i, g in enumerate(gens, start=1):
        _land(g, landing, f"g{i}.parquet", i)
    _pq_run(spark, landing, target, str(tmp_path / "ck"))
    vectors = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    out = ivfpq_index_topk(
        spark, target, _queries(e), vectors, probe=PROBE, cand=30, k=K
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    assert "_kb" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the exact re-rank reads candidate rows, not the corpus: the
    # collected candidate ids must reach the raw-vector scan as a
    # pushed membership filter
    assert "In(vec_id" in plan or "vec_id IN" in plan


def test_ann_index_cross_sink_guard(spark, tmp_path):
    """Pointing one sink at the other's target must raise: the
    whole-dir atomic swap would otherwise silently DROP the other
    sink's stores (and the next orphan sweep would reclaim their
    pool files) — silent index destruction."""
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    _land(gens[0], landing, "g1.parquet", 1)
    t_ivf, ck1 = str(tmp_path / "t_ivf"), str(tmp_path / "ck1")
    t_pq, ck2 = str(tmp_path / "t_pq"), str(tmp_path / "ck2")
    _run(spark, landing, t_ivf, ck1)
    _pq_run(spark, landing, t_pq, ck2)
    _land(gens[1], landing, "g2.parquet", 2)
    with pytest.raises(Exception, match="raw-vector index"):
        _pq_run(spark, landing, t_ivf, ck1)
    with pytest.raises(Exception, match="PQ-coded index"):
        _run(spark, landing, t_pq, ck2)


def test_ann_index_intra_batch_duplicate_raises(spark, tmp_path):
    """Two rows sharing an id WITHIN one micro-batch (re-delivery
    landing in the same trigger) must raise — the standing-rows join
    cannot see them, and a silent double-append would make serve
    return the vector twice, inflating ranks."""
    gens, e = _gens(spark)
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    dup_batch = gens[0].union(gens[0].limit(1))
    _land(dup_batch, landing, "g1.parquet", 1)
    with pytest.raises(Exception, match="WITHIN this batch"):
        _run(spark, landing, target, str(tmp_path / "ck"))


def test_ann_index_cell_ids_dense_even_for_huge_vec_ids(spark, tmp_path):
    """Trained centroids must carry DENSE 0..k-1 cell ids: Lloyd
    seeds cid from vec_id (BIGINT), and the `_kb` bucket id is an
    int — a bootstrap corpus with vec_id ≥ 2³¹ would otherwise wrap
    the cell id and collide cells between ingest and serve. Shift the
    corpus past 2³¹ and require (a) dense small cids in the frozen
    centroids, and (b) append + serve still exactly equal to the
    from-scratch recompute."""
    gens, e = _gens(spark)
    big = 2**31
    shift = [
        g.withColumn("vec_id", F.col("vec_id") + F.lit(big)) for g in gens
    ]
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    for i, g in enumerate(shift[:2], start=1):
        _land(g, landing, f"g{i}.parquet", i)
        _run(spark, landing, target, ck)
    cids = sorted(
        r.cid
        for r in spark.read.parquet(os.path.join(target, "centroids"))
        .select("cid")
        .collect()
    )
    assert cids == list(range(8))
    landed = shift[0].union(shift[1])
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_index_topk(
            spark,
            target,
            landed.filter(F.col("vec_id") < NQ + big).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("qv"),
            ),
            probe=PROBE,
            k=K,
        ).collect()
    }
    cents = spark.read.parquet(os.path.join(target, "centroids"))
    c = cents.withColumn("cc", V.dot(F.col("c"), F.col("c")))
    ev = landed.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("vv", V.dot(F.col("v"), F.col("v")))
    d2 = (F.col("vv") - 2 * V.dot(F.col("v"), F.col("c"))) + F.col("cc")
    w_a = Window.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cid"))
    assigned = (
        ev.crossJoin(F.broadcast(c))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w_a))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "vv", F.col("cid").alias("cell"))
    )
    q = assigned.filter(F.col("vec_id") < NQ + big).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vv").alias("qq"),
    )
    d2q = (F.col("qq") - 2 * V.dot(F.col("qv"), F.col("c"))) + F.col("cc")
    w_p = Window.partitionBy("query_id").orderBy(F.col("d2q"), F.col("cid"))
    probes = (
        q.crossJoin(F.broadcast(c))
        .withColumn("d2q", d2q)
        .withColumn("rn", F.row_number().over(w_p))
        .filter(F.col("rn") <= PROBE)
        .select("query_id", "qv", "qq", F.col("cid").alias("cell"))
    )
    d2x = F.round(
        ((F.col("qq") - 2 * V.dot(F.col("qv"), F.col("v"))) + F.col("vv"))
        * F.lit(1e9)
    ).cast("bigint")
    w_k = Window.partitionBy("query_id").orderBy("d2_r", "neighbor_id")
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), d2x.alias("d2_r")
        )
        .withColumn("rank", F.row_number().over(w_k).cast("int"))
        .filter(F.col("rank") <= K)
        .collect()
    }
    assert got == want
