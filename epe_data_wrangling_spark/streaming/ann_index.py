"""Incremental ANN index maintenance — IVF index refresh WITHOUT
retrain, the 100 TB serving-side twin of the batch ANN family.

The production shape (FAISS operational practice, and every vector
database's ingestion path): the coarse quantizer is TRAINED ONCE on a
representative corpus, then FROZEN — newly embedded documents are
assigned to their nearest trained centroid on arrival and appended to
the index, because retraining (and re-assigning the whole corpus)
per ingestion batch would cost a corpus-sized job for a delta-sized
change. This module is that contract as a foreachBatch sink over the
repo's manifest store:

- ``centroids/`` — trained on the BOOTSTRAP batch's vectors by the
  shared Lloyd trainer (`operators.kmeans.lloyd_means` — the same
  implementation the batch `kmeans_lloyd_centroids` certifies, so the
  trained/served quantizer cannot drift), then frozen. Deployment
  contract: the first landed drop IS the training corpus.
- ``vectors`` (manifest store) — the index rows (id, vector),
  bucketed by CELL id (``_kb`` = assigned centroid), so a serve-time
  probe reads ONLY the probed cells' files (the manifest layer pushes
  the ``_kb`` filter to the parquet scan) and an ingestion batch
  rewrites only the cells its vectors land in; untouched cells carry
  as manifest rows.

Per batch the work is: one delta × K broadcast argmin (assignment),
one SEGMENT-APPEND manifest commit (`write_store_delta(append=True)`
— the batch's rows land as NEW pool files added to their cells'
entries; standing rows are never read or rewritten on the ingest
path, so a batch costs the batch regardless of index size, and the
file-count growth is absorbed by the store's normal over-threshold
compaction), plus one touched-cell read for the duplicate-id witness
(read-only). Nothing corpus-sized moves after bootstrap. Serve
(`ivf_index_topk`): queries probe their ``probe`` best cells against
the broadcast centroids and scan ~probe/K of the index, exactly the
trained-IVF serve path of `ann_ivf_trained_topk`.

Exactly-once: appends double-count on re-application, so the sink
follows the module discipline — applied batch_id + source-file
provenance committed inside the target in the same atomic swap as
the data; replays skip, new data under a fresh checkpoint raises.
Duplicate-id guard: a batch id that already exists in its assigned
cell raises (exact for the common duplicate-delivery case — an
identical vector re-assigns to the identical cell under the frozen
quantizer; a DIFFERENT vector reusing an id would need a key→cell
locator sidecar, the extension the top-k sinks already demonstrate).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions import vectors as V
from epe_data_wrangling_spark.operators.kmeans import (
    lloyd_means,
    means_to_centroids,
)
from epe_data_wrangling_spark.streaming.manifest import (
    read_manifest,
    read_store,
    write_store_delta,
)
from epe_data_wrangling_spark.streaming.ops import (
    _atomic_swap,
    _batch_provenance,
    _clean_stale_stages,
    _is_committed_replay,
    _read_sink_meta,
    _recover_swap,
    _run_foreach_batch,
)
from epe_data_wrangling_spark.streaming.manifest import sweep_orphans


def _dense_cids(cents: DataFrame) -> DataFrame:
    """Re-key freshly trained centroids to DENSE 0..k-1 cell ids
    (order-preserving, so every later ``orderBy(..., cid)`` tie-break
    compares identically). Lloyd seeds cid from the k lowest
    ``vec_id``s — a BIGINT; ``_assign_cells`` casts the cell id to int
    for the ``_kb`` bucket, so a bootstrap corpus with vec_id ≥ 2³¹
    would silently WRAP the cell id and collide cells between ingest
    and serve. Dense re-keying at bootstrap (K rows, one driver-side
    window) removes the overflow class entirely; the frozen centroids
    parquet then carries only small ints for the index's lifetime."""
    w = Window.orderBy("cid")
    return cents.withColumn(
        "cid", (F.row_number().over(w) - 1).cast("bigint")
    )


def _require_unique_ids(batch: DataFrame, id_col: str, sink: str) -> None:
    """Intra-batch duplicate-id witness: two rows sharing an id WITHIN
    one micro-batch (re-delivery landing in the same trigger) would
    both append silently — the standing-rows join can't see them — and
    serve would then return the vector twice, inflating ranks. One
    delta-sized limit-1 job."""
    dup = (
        batch.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise RuntimeError(
            f"{sink} sink: id {dup[0][0]} appears {dup[0]['n']} times "
            "WITHIN this batch — appending would duplicate it in its "
            "cell; dedup upstream or rebuild the target"
        )


def _assign_cells(batch: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest-trained-centroid assignment (dist² argmin against the
    broadcast centroids — the Lloyd metric, so the index is coherent
    with its trainer). Returns (id, v, _kb = cell, cv = the cell's
    centroid vector — the residual encoders need it; plain callers
    drop it)."""
    c = cents.withColumn("cc", V.dot(F.col("c"), F.col("c")))
    dist2 = (F.col("vv") - 2 * V.dot(F.col("v"), F.col("c"))) + F.col("cc")
    w = Window.partitionBy(id_col).orderBy(F.col("dist2"), F.col("cid"))
    return (
        batch.withColumn("vv", V.dot(F.col("v"), F.col("v")))
        .crossJoin(F.broadcast(c.select("cid", "c", "cc")))
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            id_col, "v", F.col("cid").cast("int").alias("_kb"),
            F.col("c").alias("cv"),
        )
    )


def ivf_index_foreach_batch(
    vectors: DataFrame,
    target_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    train_iters: int = 2,
    timeout_sec: int = 300,
    checkpoint_dir: str | None = None,
) -> None:
    """Maintain the IVF index at ``target_dir`` from an append-only
    vector stream (rows: ``id_col``, ``vec_col`` array<float|double>).
    The bootstrap batch trains the quantizer; every batch (bootstrap
    included) appends its vectors to the cell-bucketed store."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover_swap(target_dir)
        _clean_stale_stages(target_dir)
        sweep_orphans(target_dir)
        meta = _read_sink_meta(target_dir)
        batch_files = _batch_provenance(batch_df)
        applied = set(meta.get("applied_files", []))
        if _is_committed_replay(meta, batch_files, batch_id, "ivf_index"):
            return
        if batch_df.isEmpty():
            return
        if meta.get("pq_layout") is not None:
            # cross-sink witness: the whole-dir atomic swap would
            # silently DROP the PQ target's codes store and codebooks
            # (and the next sweep_orphans would reclaim their pool)
            raise RuntimeError(
                f"ivf_index sink: target {target_dir} is a PQ-coded index "
                "(meta carries pq_layout) — committing raw vectors over it "
                "would destroy the codes store; use "
                "ivfpq_index_foreach_batch or a fresh target"
            )
        committed_k = meta.get("k_cells")
        if committed_k is not None and committed_k != k_cells:
            raise RuntimeError(
                f"ivf_index sink: target was committed with k_cells="
                f"{committed_k} but the sink is configured with "
                f"{k_cells} — the stored cell layout would be misread; "
                "use the committed value or rebuild the target"
            )
        batch = batch_df.select(
            id_col, F.col(vec_col).cast("array<double>").alias("v")
        )
        _require_unique_ids(batch, id_col, "ivf_index")
        cent_dir = os.path.join(target_dir, "centroids")
        manifest = read_manifest(target_dir, "vectors")
        if manifest is None and not os.path.isdir(cent_dir):
            # bootstrap: this batch IS the training corpus; re-key the
            # trained centroids dense 0..k-1 (vec_id-seeded cids can
            # exceed int32 — see _dense_cids)
            ev = batch.withColumn("vv", V.dot(F.col("v"), F.col("v")))
            cents = _dense_cids(
                means_to_centroids(
                    lloyd_means(ev, k_cells, train_iters, id_col=id_col)
                )
            ).localCheckpoint(eager=True)  # barrier: feeds every later job
        else:
            cents = spark.read.parquet(cent_dir)
        delta = _assign_cells(batch, cents, id_col).drop("cv").localCheckpoint(
            eager=True  # assignment feeds the guard, the union, the commit
        )
        touched = sorted(
            int(r["_kb"]) for r in delta.select("_kb").distinct().collect()
        )
        existing = read_store(
            spark, target_dir, "vectors", buckets=touched, manifest=manifest
        )
        if existing is not None:
            # duplicate witness only — the standing rows are never
            # rewritten (segment-append commit below)
            dup = (
                delta.select(id_col)
                .join(existing.select(id_col), id_col)
                .limit(1)
                .collect()
            )
            if dup:
                raise RuntimeError(
                    f"ivf_index sink: id {dup[0][0]} already present in its "
                    "assigned cell — the stream re-delivered a vector outside "
                    "batch replay (appending would duplicate it); dedup "
                    "upstream or rebuild the target"
                )
        stage = f"{target_dir}.stage-{batch_id}"
        os.makedirs(stage, exist_ok=True)
        write_store_delta(
            spark, delta, target_dir, "vectors", stage,
            batch_id=batch_id, touched=touched, manifest=manifest,
            append=True,
        )
        if os.path.isdir(cent_dir):
            # frozen quantizer: byte-identical carry into the stage (no
            # per-batch Spark round-trip, no re-serialization drift)
            import shutil

            shutil.copytree(cent_dir, os.path.join(stage, "centroids"))
        else:
            cents.write.mode("overwrite").parquet(
                os.path.join(stage, "centroids")
            )
        with open(os.path.join(stage, "_ivm_meta.json"), "w") as f:
            json.dump(
                {
                    "last_batch_id": batch_id,
                    "k_cells": k_cells,
                    "applied_files": sorted(applied | batch_files),
                },
                f,
            )
        _atomic_swap(stage, target_dir, batch_id)

    _run_foreach_batch(vectors, _apply, checkpoint_dir, "ivf_index", timeout_sec)


def ivf_index_topk(
    spark,
    target_dir: str,
    queries: DataFrame,
    *,
    probe: int = 4,
    k: int = 3,
) -> DataFrame:
    """Serve cosine-agnostic L2 top-k from the maintained index:
    ``queries`` rows (query_id, qv array<double>) probe their
    ``probe`` nearest trained cells (broadcast centroids) and scan
    ONLY those cells' index files (manifest bucket pruning pushes the
    ``_kb`` filter to the parquet scan). Distances are emitted as
    round(d2·1e9)/1e9 so ranking and values are order-free exact
    cross-engine. Returns (query_id, neighbor_id, rank, l2_dist)."""
    cents = spark.read.parquet(os.path.join(target_dir, "centroids"))
    c = cents.withColumn("cc", V.dot(F.col("c"), F.col("c")))
    q = queries.withColumn("qq", V.dot(F.col("qv"), F.col("qv")))
    d2c = (F.col("qq") - 2 * V.dot(F.col("qv"), F.col("c"))) + F.col("cc")
    w_p = Window.partitionBy("query_id").orderBy(F.col("d2c"), F.col("cid"))
    probes = (
        q.crossJoin(F.broadcast(c.select("cid", "c", "cc")))
        .withColumn("d2c", d2c)
        .withColumn("rn", F.row_number().over(w_p))
        .filter(F.col("rn") <= probe)
        .select("query_id", "qv", "qq", F.col("cid").cast("int").alias("_kb"))
    )
    cells = sorted(
        int(r["_kb"]) for r in probes.select("_kb").distinct().collect()
    )
    manifest = read_manifest(target_dir, "vectors")
    if manifest is None:
        raise RuntimeError(
            f"ivf_index serve: no committed index at {target_dir}"
        )
    vecs = read_store(
        spark, target_dir, "vectors", buckets=cells, manifest=manifest
    )
    if vecs is None:
        # committed index, but every probed cell is vector-empty (a
        # skewed corpus can leave trained cells unpopulated): IVF
        # serve semantics = zero candidates, not an error
        return spark.createDataFrame(
            [],
            "query_id BIGINT, neighbor_id BIGINT, rank INT, l2_dist DOUBLE",
        )
    id_col = [col for col in vecs.columns if col not in ("v", "_kb")][0]
    d2 = F.round(
        (
            (F.col("qq") - 2 * V.dot(F.col("qv"), F.col("v")))
            + V.dot(F.col("v"), F.col("v"))
        )
        * F.lit(1e9)
    ).cast("bigint")
    w_k = Window.partitionBy("query_id").orderBy("d2_r", "neighbor_id")
    return (
        vecs.join(F.broadcast(probes), "_kb")
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            d2.alias("d2_r"),
        )
        .withColumn("rank", F.row_number().over(w_k).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("d2_r").cast("double") / F.lit(1e9), 6).alias(
                "l2_dist"
            ),
        )
    )


def ivfpq_index_foreach_batch(
    vectors: DataFrame,
    target_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    train_iters: int = 2,
    pq_m: int = 4,
    pq_sub: int = 16,
    cbk: int = 32,
    timeout_sec: int = 300,
    checkpoint_dir: str | None = None,
) -> None:
    """PQ-coded twin of `ivf_index_foreach_batch` — the
    billion-scale ingestion form (FAISS IVFPQ, by_residual=true,
    maintained incrementally): the bootstrap batch trains the coarse
    quantizer AND the residual codebooks (both via the shared
    trainers — `operators.kmeans.lloyd_means`,
    `operators.pq.train_residual_codebooks` — so the batch
    `ann_ivfpq_topk` and this sink cannot drift), then BOTH are
    frozen; every batch's vectors are assigned to their cell,
    residual-encoded to ``pq_m`` codebook ids, and the CODES (one
    (id, m, cid) row per subspace — ~``pq_sub``× smaller than the
    float vectors) append into the cell-bucketed manifest store. The
    raw vectors are never stored: serve-time exact re-rank reads them
    from the caller's source table (`ivfpq_index_topk(vectors=...)`),
    which is where they live at 100 TB anyway. Same exactly-once /
    duplicate-id / layout-drift discipline as the raw-vector sink."""

    from epe_data_wrangling_spark.operators.pq import (
        assign_codes,
        split_residual_subspaces,
        train_residual_codebooks,
        with_cc,
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover_swap(target_dir)
        _clean_stale_stages(target_dir)
        sweep_orphans(target_dir)
        meta = _read_sink_meta(target_dir)
        batch_files = _batch_provenance(batch_df)
        applied = set(meta.get("applied_files", []))
        if _is_committed_replay(meta, batch_files, batch_id, "ivfpq_index"):
            return
        if batch_df.isEmpty():
            return
        if meta.get("k_cells") is not None:
            # cross-sink witness (twin of the raw sink's): swapping a
            # PQ commit over a raw-vector target would drop its store
            raise RuntimeError(
                f"ivfpq_index sink: target {target_dir} is a raw-vector "
                "index (meta carries k_cells) — committing codes over it "
                "would destroy the vectors store; use "
                "ivf_index_foreach_batch or a fresh target"
            )
        committed = meta.get("pq_layout")
        layout = [k_cells, pq_m, pq_sub, cbk]
        if committed is not None and committed != layout:
            raise RuntimeError(
                f"ivfpq_index sink: target was committed with "
                f"[k_cells, m, sub, cbk]={committed} but the sink is "
                f"configured with {layout} — the stored cells/codes would "
                "be misread; use the committed layout or rebuild the target"
            )
        batch = batch_df.select(
            id_col, F.col(vec_col).cast("array<double>").alias("v")
        )
        _require_unique_ids(batch, id_col, "ivfpq_index")
        # pq_m*pq_sub must cover the vector exactly — the subspace
        # slices would otherwise silently encode only a PREFIX of each
        # residual (ADC on half the dims = quiet recall collapse, no
        # error anywhere). One delta-sized limit-1 job.
        bad = batch.filter(F.size("v") != pq_m * pq_sub).limit(1).collect()
        if bad:
            raise RuntimeError(
                f"ivfpq_index sink: vector dim {len(bad[0]['v'])} != "
                f"pq_m*pq_sub = {pq_m * pq_sub} — the subspace slices "
                "would drop trailing dimensions; fix the layout"
            )
        cent_dir = os.path.join(target_dir, "centroids")
        cb_dir = os.path.join(target_dir, "codebooks")
        manifest = read_manifest(target_dir, "codes")
        bootstrap = manifest is None and not os.path.isdir(cent_dir)
        if bootstrap:
            # bootstrap: this batch trains BOTH frozen stages; dense
            # cell re-key as in the raw sink (see _dense_cids)
            ev = batch.withColumn("vv", V.dot(F.col("v"), F.col("v")))
            cents = _dense_cids(
                means_to_centroids(
                    lloyd_means(ev, k_cells, train_iters, id_col=id_col)
                )
            ).localCheckpoint(eager=True)
        else:
            cents = spark.read.parquet(cent_dir)
        asg = _assign_cells(batch, cents, id_col)
        res = asg.select(
            id_col, "_kb",
            F.zip_with(F.col("v"), F.col("cv"), lambda a, b: a - b).alias("r"),
        )
        rsub = split_residual_subspaces(res, pq_m, pq_sub, keep=[id_col, "_kb"])
        if bootstrap:
            # the training residuals ARE this batch's residuals — one
            # assignment/split, reused for training and encoding (the
            # bootstrap batch is the largest one by contract)
            rsub = rsub.localCheckpoint(eager=True)
            cb = train_residual_codebooks(
                rsub, cbk, id_col
            ).localCheckpoint(eager=True)
        else:
            cb = with_cc(spark.read.parquet(cb_dir))
        delta = (
            assign_codes(rsub, cb, id_col)
            .select(id_col, "m", "cid", "_kb")
            .localCheckpoint(eager=True)
        )
        touched = sorted(
            int(r["_kb"]) for r in delta.select("_kb").distinct().collect()
        )
        existing = read_store(
            spark, target_dir, "codes", buckets=touched, manifest=manifest
        )
        if existing is not None:
            # duplicate witness only — standing codes never rewritten
            dup = (
                delta.select(id_col)
                .distinct()
                .join(existing.select(id_col).distinct(), id_col)
                .limit(1)
                .collect()
            )
            if dup:
                raise RuntimeError(
                    f"ivfpq_index sink: id {dup[0][0]} already present in "
                    "its assigned cell — the stream re-delivered a vector "
                    "outside batch replay (appending would duplicate its "
                    "codes); dedup upstream or rebuild the target"
                )
        stage = f"{target_dir}.stage-{batch_id}"
        os.makedirs(stage, exist_ok=True)
        write_store_delta(
            spark, delta, target_dir, "codes", stage,
            batch_id=batch_id, touched=touched, manifest=manifest,
            append=True,
        )
        import shutil

        for sub_dir, df_fresh in (("centroids", cents), ("codebooks", cb)):
            committed_dir = os.path.join(target_dir, sub_dir)
            if os.path.isdir(committed_dir):
                # frozen stages: byte-identical carry into the stage
                shutil.copytree(committed_dir, os.path.join(stage, sub_dir))
            else:
                out_df = df_fresh.drop("cc") if sub_dir == "codebooks" else df_fresh
                out_df.write.mode("overwrite").parquet(
                    os.path.join(stage, sub_dir)
                )
        with open(os.path.join(stage, "_ivm_meta.json"), "w") as f:
            json.dump(
                {
                    "last_batch_id": batch_id,
                    "pq_layout": layout,
                    "applied_files": sorted(applied | batch_files),
                },
                f,
            )
        _atomic_swap(stage, target_dir, batch_id)

    _run_foreach_batch(
        vectors, _apply, checkpoint_dir, "ivfpq_index", timeout_sec
    )


def ivfpq_index_topk(
    spark,
    target_dir: str,
    queries: DataFrame,
    vectors: DataFrame,
    *,
    probe: int = 4,
    cand: int = 50,
    k: int = 5,
) -> DataFrame:
    """Serve from the PQ-coded index: queries probe their ``probe``
    nearest cells, build per-(cell, subspace) asymmetric-distance
    tables of their OWN residual against the frozen codebooks
    (broadcast), score the probed cells' CODES by table lookups
    (ADC — the index scan reads codes only, pruned to the probed
    cells), and the ADC top-``cand`` are re-ranked by EXACT L2
    against ``vectors`` (the caller's raw-vector table): the
    ≤ |queries|×cand candidate ids are collected driver-side and
    PUSHED DOWN as an id-membership filter on the vectors scan
    (plan-asserted), so the re-rank reads candidate rows, not the
    corpus. Returns (query_id, neighbor_id, rank, l2_dist),
    BIGINT-staged like the batch twin."""
    from epe_data_wrangling_spark.operators.pq import (
        split_residual_subspaces,
        with_cc,
    )

    meta = _read_sink_meta(target_dir)
    layout = meta.get("pq_layout")
    if layout is None:
        raise RuntimeError(
            f"ivfpq_index serve: no committed index at {target_dir}"
        )
    _k_cells, pq_m, pq_sub, _cbk = layout
    cents = spark.read.parquet(os.path.join(target_dir, "centroids"))
    cb = with_cc(spark.read.parquet(os.path.join(target_dir, "codebooks")))
    c = cents.withColumn("cc", V.dot(F.col("c"), F.col("c")))
    q = queries.withColumn("qq", V.dot(F.col("qv"), F.col("qv")))
    d2c = (F.col("qq") - 2 * V.dot(F.col("qv"), F.col("c"))) + F.col("cc")
    w_p = Window.partitionBy("query_id").orderBy(F.col("d2c"), F.col("cid"))
    probes = (
        q.crossJoin(F.broadcast(c.select("cid", "c", "cc")))
        .withColumn("d2c", d2c)
        .withColumn("rn", F.row_number().over(w_p))
        .filter(F.col("rn") <= probe)
        .select(
            "query_id", "qv", "qq",
            F.col("cid").cast("int").alias("_kb"),
            F.col("c").alias("cv"),
        )
    )
    qres = probes.select(
        "query_id", "_kb",
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a - b).alias("r"),
    )
    qsub = split_residual_subspaces(
        qres, pq_m, pq_sub, keep=["query_id", "_kb"]
    )
    d2q = (F.col("rvv") - 2 * V.dot(F.col("rv"), F.col("c"))) + F.col("cc")
    dtab = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "_kb", "m", "cid",
        F.round(d2q * F.lit(1e9)).cast("bigint").alias("d2_r"),
    )
    cells = sorted(
        int(r["_kb"]) for r in probes.select("_kb").distinct().collect()
    )
    codes = read_store(spark, target_dir, "codes", buckets=cells)
    if codes is None:
        # committed index, but every probed cell is code-empty
        return spark.createDataFrame(
            [],
            "query_id BIGINT, neighbor_id BIGINT, rank INT, l2_dist DOUBLE",
        )
    id_col = [col for col in codes.columns if col not in ("m", "cid", "_kb")][0]
    adc = (
        codes.join(F.broadcast(dtab), ["_kb", "m", "cid"])
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", id_col)
        .agg(F.sum("d2_r").alias("adc_r"))
    )
    w_c = Window.partitionBy("query_id").orderBy("adc_r", id_col)
    cand_df = (
        adc.withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") <= cand)
        .select("query_id", id_col)
    )
    # candidate ids driver-side (≤ |queries|×cand rows — already the
    # size of the final answer×cand) so the raw-vector read is a
    # PUSHED-DOWN membership filter, not a corpus scan
    cand_ids = [
        r[0] for r in cand_df.select(id_col).distinct().collect()
    ]
    ev = vectors.filter(
        vectors[id_col].isin(cand_ids)
    ).withColumn("vv", V.dot(F.col("v"), F.col("v")))
    d2x = F.round(
        (
            (F.col("qq") - 2 * V.dot(F.col("qv"), F.col("v")))
            + F.col("vv")
        )
        * F.lit(1e9)
    ).cast("bigint")
    w_k = Window.partitionBy("query_id").orderBy("d2_r", "neighbor_id")
    return (
        ev.join(F.broadcast(cand_df), ev[id_col] == cand_df[id_col])
        .drop(cand_df[id_col])
        .join(F.broadcast(q.select("query_id", "qv", "qq")), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            d2x.alias("d2_r"),
        )
        .withColumn("rank", F.row_number().over(w_k).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("d2_r").cast("double") / F.lit(1e9), 6).alias(
                "l2_dist"
            ),
        )
    )
