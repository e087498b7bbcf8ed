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
quantizer; a DIFFERENT vector reusing an id is caught exactly by the
CDC sink's locator sidecar below).

**Deletes / upserts** (`ivf_index_changes_foreach_batch`): a
production vector index must also UNLEARN — dedup casualties, GDPR
deletes, re-embedded documents. The CDC sink composes the module's
append discipline with the tombstone + key-locator machinery the
top-k sinks established (`ops._key_index_guard_and_rewrite`):

- ``locator/`` — (id → cell) sidecar, bucketed by ``pmod(hash(id),
  loc_buckets)`` so a change batch reads/rewrites ONLY the key
  buckets its ids hash to. It answers the question a delete arrives
  WITHOUT the answer to: which cell holds this id's standing row
  (the vector is gone client-side; recomputing the cell needs the
  vector). Also makes insert-over-present and delete-of-unknown
  EXACT witnesses at touched-key-bucket cost.
- ``tombs/`` — cell-bucketed tombstones (id, _kb, tgen): a delete or
  upsert APPENDS a tombstone for the retired (id, old-cell) entry —
  standing vector rows are still never read or rewritten on the
  change path (merge-on-read, the lakehouse delete-vector shape).
  Vector rows carry ``_gen`` (a monotone per-target generation,
  `_next_gen` — checkpoint-handoff safe where raw batch ids are
  not); a row is
  dead iff a tombstone with the same (id, cell) and ``tgen > _gen``
  exists, so an upsert landing back in the SAME cell outlives the
  tombstone retiring its predecessor.
- Serve filters the probed cells' tombstones (a broadcast-joined
  max-tgen per retired id — dead-entry-sized, never corpus-sized);
  `ivf_index_vacuum` physically drops dead rows (copy-on-write
  rewrite of exactly the tombstoned cells) and clears their
  tombstones, restoring the pure-append read path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions import vectors as V
from epe_data_wrangling_spark.operators.kmeans import (
    farthest_first_seeds,
    lloyd_means,
    means_to_centroids,
)
from epe_data_wrangling_spark.streaming.manifest import (
    carry_store,
    read_manifest,
    read_store,
    store_has_files,
    write_store_delta,
)
from epe_data_wrangling_spark.streaming.ops import (
    STREAM_TIMEOUT_SEC,
    _atomic_swap,
    _batch_provenance,
    _clean_stale_stages,
    _is_committed_replay,
    _read_sink_meta,
    _recover_swap,
    _run_foreach_batch,
)
from epe_data_wrangling_spark.streaming.manifest import sweep_orphans


def _is_replay_or_handoff(
    meta: dict, batch_files: set, batch_id: int, tag: str,
    adopt: bool = False,
) -> bool:
    """`_is_committed_replay` with one OPT-IN admissible case — the
    CHECKPOINT HANDOFF: batch ids are a per-checkpoint counter, so a
    target adopted by a new stream (a fresh checkpoint over a fresh
    landing dir — exactly how a plain-append index graduates to the
    CDC sink) legitimately arrives with batch_id 0 against a
    committed last_batch_id > 0. When the caller declared the
    handoff (``adopt=True``) and every file in the batch is
    NEVER-applied, the batch cannot be a replay (a replay's files
    are all in applied by definition) — apply it. WITHOUT the
    declaration the shared helper's fresh-checkpoint witness stands:
    the same signature also describes a MISWIRED job (the wrong
    landing dir pointed at an existing target would silently mix two
    corpora under one quantizer), and the sink cannot tell adoption
    from accident — only the operator can, so adoption is explicit.
    A batch MIXING applied and fresh files raises either way."""
    applied = set(meta.get("applied_files", []))
    if (
        adopt
        and batch_id <= meta["last_batch_id"]
        and batch_files
        and not (batch_files & applied)
    ):
        return False
    return _is_committed_replay(meta, batch_files, batch_id, tag)


def _next_gen(meta: dict) -> int:
    """Monotone PER-TARGET generation counter (meta ``last_gen``) for
    the vectors' ``_gen`` / tombstones' ``tgen`` ordering. Raw batch
    ids cannot serve: they restart at 0 on a checkpoint handoff, and
    a tombstone stamped with a regressed id would fail to retire
    standing rows committed under the old checkpoint's higher ids.
    Seeds from last_batch_id when ``last_gen`` is absent (a target
    whose commits all predate the counter ALSO predates the stores'
    ``_gen`` column, and the CDC sinks refuse it — see the
    `_cdc_locate_and_retire` schema witness — so the seed only ever
    bridges metas written mid-upgrade, never reinterprets old
    stores)."""
    return int(meta.get("last_gen", meta.get("last_batch_id", -1))) + 1


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


def _require_gen_schema(manifest: dict | None, store: str, sink: str) -> None:
    """Pre-upgrade-target witness shared by the plain-append sinks
    (the CDC path has its own copy with tombstone-specific wording,
    `_cdc_locate_and_retire`): a store committed before deltas carried
    the ``_gen`` generation column would fail the manifest layer's
    schema check on the next append with a generic "schema drift"
    error — refuse up front with the actionable message instead."""
    if manifest is not None and manifest.get("schema"):
        fields = [
            f["name"] for f in json.loads(manifest["schema"])["fields"]
        ]
        if "_gen" not in fields:
            raise RuntimeError(
                f"{sink} sink: target's {store} store predates the _gen "
                "generation column (committed by a pre-CDC build) — "
                "rebuild the target from the stream to upgrade it"
            )


#: Cell-occupancy skew (max/mean live rows per populated cell) above
#: which the sinks surface a retrain advisory in their meta — the
#: production trigger for re-training the frozen quantizer: a drifted
#: embedding distribution piles new vectors into few cells, serve
#: probes degrade toward scanning those hot cells, and recall on
#: drifted queries decays (measured: tools/supp/ann_index_scale.py
#: --drift; SCALE.md r14). Advisory, never an error: ingestion must
#: not stop because the corpus moved.
OCCUPANCY_SKEW_WARN = 8.0


def _occupancy_meta(
    old_counts: dict, delta_counts, retire_counts=None,
    warn_skew: float = OCCUPANCY_SKEW_WARN,
) -> dict:
    """Fold a batch's per-cell delta (and optional retired counts)
    into the meta-carried live-row occupancy map and attach the skew
    advisory. ``delta_counts``/``retire_counts`` are (cell, n)
    iterables — delta-sized collects the callers already pay."""
    counts = {str(k): int(v) for k, v in (old_counts or {}).items()}
    for b, c in delta_counts:
        counts[str(int(b))] = counts.get(str(int(b)), 0) + int(c)
    for b, c in retire_counts or ():
        counts[str(int(b))] = counts.get(str(int(b)), 0) - int(c)
    counts = {b: c for b, c in counts.items() if c > 0}
    out = {"cell_counts": dict(sorted(counts.items(), key=lambda kv: int(kv[0])))}
    if counts:
        mx = max(counts.values())
        mean = sum(counts.values()) / len(counts)
        skew = mx / mean if mean else 0.0
        out["occupancy_skew"] = round(skew, 3)
        if skew > warn_skew:
            hot = max(counts, key=counts.get)
            out["occupancy_warning"] = {
                "skew": round(skew, 3),
                "threshold": warn_skew,
                "hot_cell": int(hot),
                "hot_rows": counts[hot],
                "action": "embedding distribution has drifted from the "
                "bootstrap training corpus — retrain the quantizer to "
                "restore probe balance (ivf_index_retrain; use "
                "init='spread' for multi-cluster drift — SCALE.md r15 — "
                "or ivfpq_index_rebuild for PQ targets)",
            }
            import warnings

            warnings.warn(
                f"ANN index occupancy skew {skew:.1f} > "
                f"{warn_skew} (hot cell {hot}: {counts[hot]} "
                "rows) — quantizer retrain advised",
                RuntimeWarning,
                stacklevel=3,
            )
    return out


def _assign_cells(batch: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest-trained-centroid assignment (dist² argmin against the
    broadcast centroids — the Lloyd metric, so the index is coherent
    with its trainer). Returns (id, v, _kb = cell, cv = the cell's
    centroid vector — the residual encoders need it; plain callers
    drop it)."""
    # broadcast-array argmin (V.nearest_centroid): same (dist2, cid)
    # winner as the former per-id window over a k-way crossJoin, with
    # the batch scanned once and never shuffled by the assignment
    c = cents.withColumn("cc", V.dot(F.col("c"), F.col("c")))
    cands = V.centroid_array(c.select("cid", "c", "cc"))
    best = V.nearest_centroid(F.col("_cands"), F.col("v"), F.col("vv"))
    return (
        batch.withColumn("vv", V.dot(F.col("v"), F.col("v")))
        .crossJoin(F.broadcast(cands))
        .withColumn("_best", best)
        .filter(F.col("_best").isNotNull())  # empty-centroids parity
        .select(
            id_col, "v", F.col("_best.cid").cast("int").alias("_kb"),
            F.col("_best.c").alias("cv"),
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
    warn_skew: float = OCCUPANCY_SKEW_WARN,
    adopt: bool = False,
    timeout_sec: int = STREAM_TIMEOUT_SEC,
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
        if _is_replay_or_handoff(
            meta, batch_files, batch_id, "ivf_index", adopt
        ):
            return
        if batch_df.isEmpty():
            return
        gen = _next_gen(meta)
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
        if meta.get("cdc"):
            # cross-sink witness: a plain append neither consults nor
            # maintains the CDC target's locator sidecar — its (id →
            # cell) map would silently go stale and every later
            # delete/upsert would retire the wrong (or no) entry
            raise RuntimeError(
                f"ivf_index sink: target {target_dir} is CDC-maintained "
                "(meta carries cdc) — a plain append would leave the "
                "locator sidecar stale; use "
                "ivf_index_changes_foreach_batch (op='I') instead"
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
        _require_gen_schema(manifest, "vectors", "ivf_index")
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
        delta = (
            _assign_cells(batch, cents, id_col)
            .drop("cv")
            # _gen: the committing generation (_next_gen — monotone
            # per target, checkpoint-handoff safe) — inert for a
            # pure-append index, load-bearing the moment the CDC sink
            # tombstones a row (dead iff a (id, cell) tombstone with
            # tgen > _gen exists); written by both sinks so one
            # vectors-store schema serves both lifecycles
            .withColumn("_gen", F.lit(gen).cast("bigint"))
            .localCheckpoint(
                eager=True  # assignment feeds the guard, the commit
            )
        )
        delta_counts = [
            (int(r["_kb"]), int(r["c"]))
            for r in delta.groupBy("_kb")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        touched = sorted(b for b, _ in delta_counts)
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
                    # max(): a checkpoint handoff restarts batch ids at
                    # 0 — the committed high-water mark must not regress
                    "last_batch_id": max(batch_id, meta["last_batch_id"]),
                    "last_gen": gen,
                    "k_cells": k_cells,
                    "applied_files": sorted(applied | batch_files),
                    **_occupancy_meta(
                        meta.get("cell_counts"), delta_counts,
                        warn_skew=warn_skew,
                    ),
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
    id_col = [c for c in vecs.columns if c not in ("v", "_kb", "_gen")][0]
    tombs = read_store(spark, target_dir, "tombs", buckets=cells)
    if tombs is not None:
        # probed-cell tombstones only; vacuum restores the
        # filter-free path (see _live_rows for the liveness rule)
        vecs = _live_rows(vecs, tombs, id_col)
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


def _live_rows(rows: DataFrame, tombs: DataFrame, id_col: str) -> DataFrame:
    """The merge-on-read tombstone filter — THE definition of 'live',
    shared by serve, vacuum and retrain so the three can never
    disagree: a row is dead iff a tombstone for its (id, cell) with
    ``tgen > _gen`` exists (strict, so an upsert re-landing in the
    same cell — same gen as its predecessor's tombstone — survives).
    The dead set is tombstone-sized and broadcast."""
    dead = tombs.groupBy(id_col, "_kb").agg(F.max("tgen").alias("_tg"))
    return (
        rows.join(F.broadcast(dead), [id_col, "_kb"], "left")
        .filter(F.col("_tg").isNull() | (F.col("_gen") >= F.col("_tg")))
        .select(*rows.columns)  # committed column order (schema guard)
    )


def _typed_empty_locator(ops: DataFrame, id_col: str) -> DataFrame:
    return (
        ops.select(id_col)
        .withColumn("cell", F.lit(0).cast("int"))
        .withColumn("_kb", F.lit(0).cast("int"))
        .filter(F.lit(False))
    )


def _cdc_validate_ops(
    batch_df: DataFrame, id_col: str, vec_col: str, op_col: str, tag: str
) -> DataFrame:
    """Normalize + witness a change batch (shared by the raw and PQ
    CDC sinks): op ∈ {I,U,D}, unique ids within the batch, vectors
    present on I/U. Returns the checkpointed (op, id, v) frame."""
    ops = batch_df.select(
        F.upper(F.col(op_col)).alias("op"),
        id_col,
        F.col(vec_col).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=True)  # feeds every witness + commit job
    bad_op = ops.filter(~F.col("op").isin("I", "U", "D")).limit(1).collect()
    if bad_op:
        raise RuntimeError(
            f"{tag} sink: op {bad_op[0]['op']!r} outside " "{'I','U','D'}"
        )
    _require_unique_ids(ops, id_col, tag)
    bad_v = (
        ops.filter(F.col("op").isin("I", "U") & F.col("v").isNull())
        .limit(1)
        .collect()
    )
    if bad_v:
        raise RuntimeError(
            f"{tag} sink: id {bad_v[0][id_col]} has op "
            f"{bad_v[0]['op']} but a null vector — only deletes may "
            "omit the vector"
        )
    return ops


def _cdc_locate_and_retire(
    spark,
    target_dir: str,
    ops: DataFrame,
    id_col: str,
    loc_buckets: int,
    tag: str,
    *,
    store: str,
    store_manifest: dict | None,
    backfill_pairs,
):
    """Shared locator-side machinery of the CDC sinks: resolve the
    batch ids' key buckets, read (or one-time-backfill via
    ``backfill_pairs()`` → (id, cell) rows) the locator, run the
    exact insert-over-present / delete-of-unknown witnesses, compute
    the retired (id, old-cell) entries, and run the locator↔store
    divergence witness against the ``store``'s retired cells.
    Returns (kk expr, touched_kk, loc_manifest, loc_backfill,
    old_loc, retire, retire_counts, retire_cells)."""
    if store_manifest is not None and store_manifest.get("schema"):
        fields = [
            f["name"]
            for f in json.loads(store_manifest["schema"])["fields"]
        ]
        if "_gen" not in fields:
            # a store committed before the generation column cannot
            # order tombstones against its rows: a delete-only batch
            # would commit tombstones that every later serve/vacuum
            # crashes on (unresolved `_gen`), permanently wedging the
            # target — refuse the adoption instead
            raise RuntimeError(
                f"{tag} sink: target's {store} store predates the _gen "
                "generation column — tombstone ordering against its rows "
                "cannot be established; rebuild the target from the stream"
            )
    kk = F.pmod(F.hash(F.col(id_col)), F.lit(loc_buckets)).cast("int")
    touched_kk = sorted(
        int(r["b"]) for r in ops.select(kk.alias("b")).distinct().collect()
    )
    loc_manifest = read_manifest(target_dir, "locator")
    # backfill ONLY for a target the CDC sink has never committed
    # (no locator manifest at all): a committed-but-empty locator
    # (every id deleted) must NOT re-derive entries from the index
    # store, whose rows may all be tombstoned
    loc_backfill = loc_manifest is None and store_manifest is not None
    if store_has_files(loc_manifest):
        old_loc = read_store(
            spark, target_dir, "locator",
            buckets=touched_kk, manifest=loc_manifest,
        )
        if old_loc is None:
            old_loc = _typed_empty_locator(ops, id_col)
    elif loc_backfill:
        # one-time adoption of a plain-append target: derive the full
        # (id → cell) map from the index store (corpus-sized, ONCE; a
        # plain target has no tombstones, so every stored row is
        # live). This batch then commits the FULL locator; later
        # batches are touched-bucket-sized.
        old_loc = backfill_pairs().withColumn("_kb", kk)
    else:
        old_loc = _typed_empty_locator(ops, id_col)
    # witnesses the locator makes EXACT (delta-sized joins; the
    # locator side is touched-bucket pruned, or the one-time full
    # backfill)
    ins_over = (
        ops.filter(F.col("op") == "I")
        .select(id_col)
        .join(old_loc.select(id_col), id_col)
        .limit(1)
        .collect()
    )
    if ins_over:
        raise RuntimeError(
            f"{tag} sink: id {ins_over[0][0]} op=I but the "
            "locator already holds it (possibly with a different "
            "vector in a different cell) — emit U to re-embed (or D, then "
            "I in a LATER batch: one op per id per batch)"
        )
    del_unknown = (
        ops.filter(F.col("op") == "D")
        .select(id_col)
        .join(old_loc.select(id_col), id_col, "left_anti")
        .limit(1)
        .collect()
    )
    if del_unknown:
        raise RuntimeError(
            f"{tag} sink: id {del_unknown[0][0]} op=D but "
            "the locator does not hold it — deleting an absent id is a "
            "pipeline fault (double delete or wrong target), not a no-op"
        )
    # retired entries: U/D ids the locator holds → (id, old cell)
    retire = (
        ops.filter(F.col("op").isin("U", "D"))
        .select(id_col)
        .join(old_loc.select(id_col, "cell"), id_col)
        .localCheckpoint(eager=True)
    )
    retire_counts = [
        (int(r["cell"]), int(r["c"]))
        for r in retire.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    retire_cells = sorted(b for b, _ in retire_counts)
    if retire_cells:
        # locator ↔ store divergence witness: every retired entry
        # must hold a standing row in its located cell (read-only,
        # retired-cells-pruned)
        standing = read_store(
            spark, target_dir, store,
            buckets=retire_cells, manifest=store_manifest,
        )
        missing = (
            retire
            if standing is None
            else retire.join(
                standing.select(
                    id_col, F.col("_kb").alias("cell")
                ).distinct(),
                [id_col, "cell"],
                "left_anti",
            )
        ).limit(1).collect()
        if missing:
            raise RuntimeError(
                f"{tag} sink: locator and {store} store "
                f"DIVERGE — id {missing[0][0]} located in cell "
                f"{missing[0]['cell']} but that cell holds no row for "
                "it; refusing to retire a phantom entry"
            )
    return (
        kk, touched_kk, loc_manifest, loc_backfill,
        old_loc, retire, retire_counts, retire_cells,
    )


def _cdc_commit_tombs_and_locator(
    spark,
    target_dir: str,
    stage: str,
    batch_id: int,
    gen: int,
    id_col: str,
    ops: DataFrame,
    old_loc: DataFrame,
    new_pairs: DataFrame,
    kk,
    touched_kk: list,
    loc_backfill: bool,
    loc_manifest: dict | None,
    retire: DataFrame,
    retire_cells: list,
) -> None:
    """Shared commit tail of the CDC sinks: tombstone append for the
    retired entries + locator rewrite (survivors ⊎ ``new_pairs`` —
    (id, cell) rows of this batch's inserted/upserted entries), both
    into the caller's staging dir."""
    tombs_manifest = read_manifest(target_dir, "tombs")
    if retire_cells:
        tomb_delta = retire.select(
            id_col,
            F.col("cell").cast("int").alias("_kb"),
            F.lit(gen).cast("bigint").alias("tgen"),
        )
        write_store_delta(
            spark, tomb_delta, target_dir, "tombs", stage,
            batch_id=batch_id, touched=retire_cells,
            manifest=tombs_manifest, append=True,
        )
    else:
        carry_store(target_dir, "tombs", stage)
    survivors = old_loc.join(
        F.broadcast(ops.select(id_col)), id_col, "left_anti"
    )
    final_loc = new_pairs.withColumn("_kb", kk)
    new_loc = survivors.select(id_col, "cell", "_kb").unionByName(
        final_loc.select(id_col, "cell", "_kb")
    )
    loc_touched = (
        sorted(
            {
                int(r["_kb"])
                for r in new_loc.select("_kb").distinct().collect()
            }
        )
        if loc_backfill
        else touched_kk
    )
    write_store_delta(
        spark, new_loc, target_dir, "locator", stage,
        batch_id=batch_id, touched=loc_touched,
        manifest=loc_manifest if store_has_files(loc_manifest) else None,
    )


def ivf_index_changes_foreach_batch(
    changes: DataFrame,
    target_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    op_col: str = "op",
    k_cells: int = 8,
    train_iters: int = 2,
    loc_buckets: int = 32,
    warn_skew: float = OCCUPANCY_SKEW_WARN,
    adopt: bool = False,
    timeout_sec: int = STREAM_TIMEOUT_SEC,
    checkpoint_dir: str | None = None,
) -> None:
    """Maintain the IVF index from a CHANGE stream — rows
    (``op_col`` ∈ {'I','U','D'}, ``id_col``, ``vec_col``; D rows may
    carry a null vector, which is the whole point: a delete arrives
    without the vector, so the cell holding its standing row must
    come from the ``locator/`` sidecar). Per batch:

    - inserts/upserts assign against the FROZEN centroids and
      SEGMENT-APPEND into the cell-bucketed vectors store, ``_gen`` =
      batch id (cost: the batch — identical to the append sink);
    - deletes and upserts-over-present APPEND a tombstone (id,
      old-cell, tgen = batch id) retiring the standing entry —
      standing rows are never read or rewritten on the change path;
    - the locator rewrites exactly the key buckets the batch's ids
      hash to (survivors ⊎ final entries — the
      `_key_index_guard_and_rewrite` discipline), in the same atomic
      swap, so (id → cell) and the index can never diverge across a
      crash.

    Witnesses (all delta-sized): op outside {I,U,D}, null vector on
    I/U, duplicate id within the batch, INSERT over a present id
    (exact via the locator — catches a different vector reusing an
    id, the case the append sink's cell-local check cannot see),
    DELETE of an unknown id, and locator↔store divergence (every
    retired (id, cell) must hold a standing row in that cell).

    Bootstrap: a virgin target trains the quantizer on the first
    batch's I/U vectors (dense 0..k-1 cells). A target built by
    `ivf_index_foreach_batch` is adopted — with the EXPLICIT
    ``adopt=True`` declaration, since the adopting stream's fresh
    checkpoint is otherwise indistinguishable from a miswired job
    (`_is_replay_or_handoff`) — by backfilling the locator from the
    full vectors store ONCE (corpus-sized, the one-time adoption
    cost; every later batch is touched-bucket-sized), after which
    the plain append sink refuses the target (meta ``cdc`` flag) —
    the two lifecycles cannot interleave and strand the locator
    stale."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover_swap(target_dir)
        _clean_stale_stages(target_dir)
        sweep_orphans(target_dir)
        meta = _read_sink_meta(target_dir)
        batch_files = _batch_provenance(batch_df)
        applied = set(meta.get("applied_files", []))
        if _is_replay_or_handoff(
            meta, batch_files, batch_id, "ivf_index_changes", adopt
        ):
            return
        if batch_df.isEmpty():
            return
        gen = _next_gen(meta)
        if meta.get("pq_layout") is not None:
            raise RuntimeError(
                f"ivf_index_changes sink: target {target_dir} is a PQ-coded "
                "index (meta carries pq_layout) — committing raw vectors "
                "over it would destroy the codes store; use a fresh target"
            )
        committed_k = meta.get("k_cells")
        if committed_k is not None and committed_k != k_cells:
            raise RuntimeError(
                f"ivf_index_changes sink: target was committed with "
                f"k_cells={committed_k} but the sink is configured with "
                f"{k_cells} — the stored cell layout would be misread; "
                "use the committed value or rebuild the target"
            )
        committed_lb = meta.get("loc_buckets")
        if committed_lb is not None and committed_lb != loc_buckets:
            raise RuntimeError(
                f"ivf_index_changes sink: target's locator was committed "
                f"with loc_buckets={committed_lb} but the sink is "
                f"configured with {loc_buckets} — the key buckets would be "
                "misread; use the committed value or rebuild the target"
            )
        ops = _cdc_validate_ops(
            batch_df, id_col, vec_col, op_col, "ivf_index_changes"
        )
        cent_dir = os.path.join(target_dir, "centroids")
        vec_manifest = read_manifest(target_dir, "vectors")
        present = ops.filter(F.col("op").isin("I", "U")).select(id_col, "v")
        if vec_manifest is None and not os.path.isdir(cent_dir):
            if present.isEmpty():
                raise RuntimeError(
                    "ivf_index_changes sink: virgin target and the first "
                    "batch carries no I/U vectors — nothing to train the "
                    "quantizer on"
                )
            ev = present.withColumn("vv", V.dot(F.col("v"), F.col("v")))
            cents = _dense_cids(
                means_to_centroids(
                    lloyd_means(ev, k_cells, train_iters, id_col=id_col)
                )
            ).localCheckpoint(eager=True)
        else:
            cents = spark.read.parquet(cent_dir)

        def backfill_pairs():
            allv = read_store(
                spark, target_dir, "vectors", manifest=vec_manifest
            )
            return allv.select(id_col, F.col("_kb").alias("cell"))

        (
            kk, touched_kk, loc_manifest, loc_backfill,
            old_loc, retire, retire_counts, retire_cells,
        ) = _cdc_locate_and_retire(
            spark, target_dir, ops, id_col, loc_buckets,
            "ivf_index_changes",
            store="vectors", store_manifest=vec_manifest,
            backfill_pairs=backfill_pairs,
        )
        # --- new rows under the frozen quantizer --------------------
        delta = (
            _assign_cells(present, cents, id_col)
            .drop("cv")
            .withColumn("_gen", F.lit(gen).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        delta_counts = [
            (int(r["_kb"]), int(r["c"]))
            for r in delta.groupBy("_kb")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        touched = sorted(b for b, _ in delta_counts)
        # --- commit: vectors append + tombs append + locator rewrite
        stage = f"{target_dir}.stage-{batch_id}"
        os.makedirs(stage, exist_ok=True)
        if touched:
            write_store_delta(
                spark, delta, target_dir, "vectors", stage,
                batch_id=batch_id, touched=touched, manifest=vec_manifest,
                append=True,
            )
        else:
            carry_store(target_dir, "vectors", stage)
        _cdc_commit_tombs_and_locator(
            spark, target_dir, stage, batch_id, gen, id_col, ops,
            old_loc, delta.select(id_col, F.col("_kb").alias("cell")),
            kk, touched_kk, loc_backfill, loc_manifest,
            retire, retire_cells,
        )
        if os.path.isdir(cent_dir):
            import shutil

            shutil.copytree(cent_dir, os.path.join(stage, "centroids"))
        else:
            cents.write.mode("overwrite").parquet(
                os.path.join(stage, "centroids")
            )
        with open(os.path.join(stage, "_ivm_meta.json"), "w") as f:
            json.dump(
                {
                    "last_batch_id": max(batch_id, meta["last_batch_id"]),
                    "last_gen": gen,
                    "k_cells": k_cells,
                    "loc_buckets": loc_buckets,
                    "cdc": True,
                    "applied_files": sorted(applied | batch_files),
                    **_occupancy_meta(
                        meta.get("cell_counts"), delta_counts, retire_counts,
                        warn_skew=warn_skew,
                    ),
                },
                f,
            )
        _atomic_swap(stage, target_dir, batch_id)

    _run_foreach_batch(
        changes, _apply, checkpoint_dir, "ivf_index_changes", timeout_sec
    )


def ivf_index_vacuum(spark, target_dir: str) -> int:
    """Physically drop dead rows: copy-on-write rewrite of exactly the
    TOMBSTONED cells (live rows survive into fresh pool files; the
    superseded files become orphans for the next sweep), clear those
    cells' tombstones, commit everything in one atomic swap. Serve
    results are invariant by construction — the rewrite keeps
    precisely the rows the serve-time tombstone filter kept — and
    afterwards the probed-cell read path is filter-free again.
    Returns the number of cells vacuumed (0 = nothing dead). The
    maintenance twin of the manifest layer's over-threshold
    compaction: run it when the dead fraction warrants reclaiming
    scan bandwidth, e.g. after a dedup sweep retires a cohort.
    Handles BOTH index forms (raw ``vectors`` and PQ ``codes`` — the
    store is resolved from the committed meta); ``ivfpq_index_vacuum``
    is the same function under the PQ name."""
    import shutil

    _recover_swap(target_dir)
    _clean_stale_stages(target_dir)
    sweep_orphans(target_dir)
    meta = _read_sink_meta(target_dir)
    store = "codes" if meta.get("pq_layout") else "vectors"
    tombs_manifest = read_manifest(target_dir, "tombs")
    if not store_has_files(tombs_manifest):
        return 0
    tombs = read_store(spark, target_dir, "tombs", manifest=tombs_manifest)
    dead_cells = sorted(
        int(r["_kb"]) for r in tombs.select("_kb").distinct().collect()
    )
    vec_manifest = read_manifest(target_dir, store)
    vecs = read_store(
        spark, target_dir, store, buckets=dead_cells,
        manifest=vec_manifest,
    )
    if vecs is None:
        raise RuntimeError(
            f"ivf_index_vacuum: tombstones reference cells {dead_cells[:8]} "
            f"but the {store} store holds no rows there — the stores diverged"
        )
    id_col = [
        c for c in vecs.columns if c not in ("v", "_kb", "_gen", "m", "cid")
    ][0]
    live = _live_rows(vecs, tombs, id_col)
    batch_id = int(meta.get("last_batch_id", 0))
    stage = f"{target_dir}.stage-vacuum-{batch_id}"
    os.makedirs(stage, exist_ok=True)
    write_store_delta(
        spark, live, target_dir, store, stage,
        batch_id=batch_id, touched=dead_cells, manifest=vec_manifest,
    )
    write_store_delta(
        spark, tombs.filter(F.lit(False)), target_dir, "tombs", stage,
        batch_id=batch_id, touched=dead_cells, manifest=tombs_manifest,
    )
    carry_store(target_dir, "locator", stage)
    for sub in ("centroids", "codebooks"):
        committed_dir = os.path.join(target_dir, sub)
        if os.path.isdir(committed_dir):
            shutil.copytree(committed_dir, os.path.join(stage, sub))
    with open(os.path.join(stage, "_ivm_meta.json"), "w") as f:
        json.dump(meta, f)
    _atomic_swap(stage, target_dir, batch_id)
    return len(dead_cells)


#: PQ-name alias — the vacuum resolves the store from the committed
#: meta, so one implementation serves both index forms.
ivfpq_index_vacuum = ivf_index_vacuum


def ivf_index_retrain(
    spark, target_dir: str, *, k_cells: int | None = None,
    train_iters: int = 2, init: str = "lowest",
    warn_skew: float = OCCUPANCY_SKEW_WARN,
) -> int:
    """Re-train the coarse quantizer on the CURRENT live corpus and
    re-assign every live row — the remediation the occupancy-skew
    advisory points at, closing the drift loop (measure → warn →
    retrain): after enough distribution drift the frozen cells stop
    partitioning the corpus (SCALE.md r14: probing 2/8 cells read 80%
    of it) and the fix is a fresh quantizer, not more appends.

    DELIBERATELY corpus-sized — that is what retrain means; it is the
    one operation here allowed to cost the standing index, run at the
    cadence drift warrants (weeks/months), not per batch. One atomic
    swap commits: new dense-cid centroids trained by the SAME shared
    Lloyd trainer (init = current k lowest live ids), the vectors
    store rewritten into the new cells (live rows only — tombstoned
    rows are dropped in the same pass, so a separate vacuum is
    redundant), tombstones cleared, the locator (if the target is
    CDC-maintained) rewritten to the new cells, and occupancy
    counters rebuilt (a standing retrain advisory clears itself by
    construction). Serve needs no change: it reads whatever centroids
    are committed. ``init``: 'lowest' (the certified default — the k
    lowest live ids) or 'spread' (farthest-first seeding, the
    remediation for multi-cluster drift where lowest-id seeding
    structurally cannot rebalance — SCALE.md r15; certified by
    `streaming_ann_index_retrain_spread`). Raw-vector targets only —
    a PQ target stores codes, not vectors, so its retrain is
    `ivfpq_index_rebuild` (the same contract, corpus re-read from the
    caller's system-of-record vectors table). Returns the number of
    live rows re-assigned."""
    import shutil

    if init not in ("lowest", "spread"):
        # before any I/O or side-effectful maintenance: a bad literal
        # is known bad at call time
        raise ValueError(
            f"ivf_index_retrain: init={init!r} — use 'lowest' (the "
            "certified default) or 'spread' (farthest-first seeding "
            "for drifted multi-cluster corpora; see "
            "operators.kmeans.farthest_first_seeds)"
        )
    _recover_swap(target_dir)
    _clean_stale_stages(target_dir)
    sweep_orphans(target_dir)
    meta = _read_sink_meta(target_dir)
    if meta.get("pq_layout"):
        raise RuntimeError(
            "ivf_index_retrain: target is a PQ-coded index — its store "
            "holds codes, not vectors; use ivfpq_index_rebuild with the "
            "system-of-record vectors table instead"
        )
    vec_manifest = read_manifest(target_dir, "vectors")
    if not store_has_files(vec_manifest):
        raise RuntimeError(
            f"ivf_index_retrain: no committed vectors at {target_dir}"
        )
    # same pre-upgrade witness the append sinks carry: retrain reads
    # _gen per live row to preserve CDC ordering, so a pre-_gen target
    # must refuse actionably, not with an unresolved-column error
    _require_gen_schema(vec_manifest, "vectors", "ivf_index_retrain")
    k = int(k_cells or meta.get("k_cells") or 8)
    vecs = read_store(spark, target_dir, "vectors", manifest=vec_manifest)
    id_col = [c for c in vecs.columns if c not in ("v", "_kb", "_gen")][0]
    tombs_manifest = read_manifest(target_dir, "tombs")
    tombs = (
        read_store(spark, target_dir, "tombs", manifest=tombs_manifest)
        if store_has_files(tombs_manifest)
        else None
    )
    live = vecs if tombs is None else _live_rows(vecs, tombs, id_col)
    if live.isEmpty():
        # a fully-tombstoned corpus would train ZERO centroids and
        # commit an empty quantizer — after which every later insert
        # assigns against nothing, emits an empty delta, and records
        # its files as applied: the rows would vanish silently and be
        # unreplayable. Refuse instead.
        raise RuntimeError(
            "ivf_index_retrain: the live corpus is empty (every row "
            "tombstoned) — retraining would commit an empty quantizer "
            "that silently swallows all future inserts; rebuild the "
            "target from the stream instead"
        )
    ev = live.select(id_col, "v").withColumn(
        "vv", V.dot(F.col("v"), F.col("v"))
    )
    if init == "spread":
        # materialize before seeding: the sample draw scans the full
        # corpus once (and Lloyd scans it per iteration below), which
        # would otherwise re-read the vectors store and recompute the
        # tombstone anti-join from scratch; the k-1 argmax passes
        # themselves run on the seeding sample (SPREAD_SAMPLE_CAP)
        ev = ev.localCheckpoint(eager=True)
        seed_df = farthest_first_seeds(ev, k, id_col=id_col)
    else:
        seed_df = None
    cents = _dense_cids(
        means_to_centroids(
            lloyd_means(ev, k, train_iters, id_col=id_col, init=seed_df)
        )
    ).localCheckpoint(eager=True)
    gen_of = live.select(id_col, "_gen")
    reassigned = (
        _assign_cells(live.select(id_col, "v"), cents, id_col)
        .drop("cv")
        .join(gen_of, id_col)
        .select(id_col, "v", "_kb", "_gen")
        .localCheckpoint(eager=True)  # feeds counts, store, locator
    )
    new_counts = [
        (int(r["_kb"]), int(r["c"]))
        for r in reassigned.groupBy("_kb")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    n_rows = sum(c for _, c in new_counts)
    batch_id = int(meta.get("last_batch_id", 0))
    stage = f"{target_dir}.stage-retrain-{batch_id}"
    os.makedirs(stage, exist_ok=True)
    # every committed bucket is replaced (old cells dissolve into the
    # new partitioning)
    old_buckets = sorted(int(b) for b in vec_manifest["buckets"])
    all_touched = sorted(set(old_buckets) | {b for b, _ in new_counts})
    write_store_delta(
        spark, reassigned, target_dir, "vectors", stage,
        batch_id=batch_id, touched=all_touched, manifest=vec_manifest,
    )
    if tombs is not None:
        write_store_delta(
            spark, tombs.filter(F.lit(False)), target_dir, "tombs", stage,
            batch_id=batch_id,
            touched=sorted(int(b) for b in tombs_manifest["buckets"]),
            manifest=tombs_manifest,
        )
    else:
        carry_store(target_dir, "tombs", stage)
    loc_manifest = read_manifest(target_dir, "locator")
    if loc_manifest is not None:
        loc_buckets = int(meta.get("loc_buckets", 32))
        kk = F.pmod(F.hash(F.col(id_col)), F.lit(loc_buckets)).cast("int")
        new_loc = reassigned.select(
            id_col, F.col("_kb").alias("cell")
        ).withColumn("_kb", kk)
        write_store_delta(
            spark, new_loc, target_dir, "locator", stage,
            batch_id=batch_id,
            touched=sorted(
                set(int(b) for b in loc_manifest["buckets"])
                | {
                    int(r["_kb"])
                    for r in new_loc.select("_kb").distinct().collect()
                }
            ),
            manifest=loc_manifest,
        )
    cents.write.mode("overwrite").parquet(os.path.join(stage, "centroids"))
    new_meta = dict(meta)
    new_meta["k_cells"] = k
    new_meta.pop("occupancy_warning", None)
    new_meta.pop("occupancy_skew", None)
    new_meta.pop("cell_counts", None)
    new_meta.update(_occupancy_meta(None, new_counts, warn_skew=warn_skew))
    with open(os.path.join(stage, "_ivm_meta.json"), "w") as f:
        json.dump(new_meta, f)
    _atomic_swap(stage, target_dir, batch_id)
    return n_rows


def _pq_residual_subspaces(batch, cents, id_col, pq_m, pq_sub):
    """Assign ``batch`` (id, v) against the frozen centroids and split
    the residuals into PQ subspaces — the encode front half shared by
    the plain and CDC PQ sinks (one implementation, no drift)."""
    from epe_data_wrangling_spark.operators.pq import (
        split_residual_subspaces,
    )

    asg = _assign_cells(batch, cents, id_col)
    res = asg.select(
        id_col, "_kb",
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: a - b).alias("r"),
    )
    return split_residual_subspaces(res, pq_m, pq_sub, keep=[id_col, "_kb"])


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
    warn_skew: float = OCCUPANCY_SKEW_WARN,
    adopt: bool = False,
    timeout_sec: int = STREAM_TIMEOUT_SEC,
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
        if _is_replay_or_handoff(
            meta, batch_files, batch_id, "ivfpq_index", adopt
        ):
            return
        if batch_df.isEmpty():
            return
        gen = _next_gen(meta)
        if meta.get("cdc"):
            # cross-sink witness (as in the raw sink): a plain append
            # neither consults nor maintains the CDC target's locator
            raise RuntimeError(
                f"ivfpq_index sink: target {target_dir} is CDC-maintained "
                "(meta carries cdc) — a plain append would leave the "
                "locator sidecar stale; use "
                "ivfpq_index_changes_foreach_batch (op='I') instead"
            )
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
        _require_gen_schema(manifest, "codes", "ivfpq_index")
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
        rsub = _pq_residual_subspaces(batch, cents, id_col, pq_m, pq_sub)
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
            .withColumn("_gen", F.lit(gen).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        delta_counts = [
            # codes carry pq_m rows per vector: occupancy counts VECTORS
            (int(r["_kb"]), int(r["c"]) // pq_m)
            for r in delta.groupBy("_kb")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        touched = sorted(b for b, _ in delta_counts)
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
                    "last_batch_id": max(batch_id, meta["last_batch_id"]),
                    "last_gen": gen,
                    "pq_layout": layout,
                    "applied_files": sorted(applied | batch_files),
                    **_occupancy_meta(
                        meta.get("cell_counts"), delta_counts,
                        warn_skew=warn_skew,
                    ),
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
    id_col = [
        c for c in codes.columns if c not in ("m", "cid", "_kb", "_gen")
    ][0]
    tombs = read_store(spark, target_dir, "tombs", buckets=cells)
    if tombs is not None:
        # filtered BEFORE the ADC so retired codes are never scored
        # (see _live_rows for the liveness rule)
        codes = _live_rows(codes, tombs, id_col)
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


def ivfpq_index_changes_foreach_batch(
    changes: DataFrame,
    target_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    op_col: str = "op",
    k_cells: int = 8,
    train_iters: int = 2,
    pq_m: int = 4,
    pq_sub: int = 16,
    cbk: int = 32,
    loc_buckets: int = 32,
    warn_skew: float = OCCUPANCY_SKEW_WARN,
    adopt: bool = False,
    timeout_sec: int = STREAM_TIMEOUT_SEC,
    checkpoint_dir: str | None = None,
) -> None:
    """CDC form of the PQ-coded index — `ivf_index_changes_foreach_
    batch`'s billion-scale twin: I/U vectors are residual-encoded
    under the FROZEN coarse quantizer + codebooks and their CODES
    segment-append; deletes and superseded upserts tombstone the
    retired (id, old-cell) entry via the same locator sidecar, serve
    (`ivfpq_index_topk`) filters probed-cell tombstones before ADC so
    retired codes are never scored, and `ivfpq_index_vacuum`
    physically drops dead code rows. One shared implementation for
    the witnesses, locator, tombstones and vacuum
    (`_cdc_validate_ops` / `_cdc_locate_and_retire` /
    `_cdc_commit_tombs_and_locator`), so the raw and PQ delete
    contracts cannot drift. Re-rank note: serve reads raw vectors
    from the CALLER's vectors table — after an upsert that table must
    reflect the new embedding (it is the system of record; the index
    stores codes only)."""
    from epe_data_wrangling_spark.operators.pq import (
        assign_codes,
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
        if _is_replay_or_handoff(
            meta, batch_files, batch_id, "ivfpq_index_changes", adopt
        ):
            return
        if batch_df.isEmpty():
            return
        gen = _next_gen(meta)
        if meta.get("k_cells") is not None:
            raise RuntimeError(
                f"ivfpq_index_changes sink: target {target_dir} is a "
                "raw-vector index (meta carries k_cells) — committing codes "
                "over it would destroy the vectors store; use "
                "ivf_index_changes_foreach_batch or a fresh target"
            )
        committed = meta.get("pq_layout")
        layout = [k_cells, pq_m, pq_sub, cbk]
        if committed is not None and committed != layout:
            raise RuntimeError(
                f"ivfpq_index_changes sink: target was committed with "
                f"[k_cells, m, sub, cbk]={committed} but the sink is "
                f"configured with {layout} — the stored cells/codes would "
                "be misread; use the committed layout or rebuild the target"
            )
        committed_lb = meta.get("loc_buckets")
        if committed_lb is not None and committed_lb != loc_buckets:
            raise RuntimeError(
                f"ivfpq_index_changes sink: target's locator was committed "
                f"with loc_buckets={committed_lb} but the sink is "
                f"configured with {loc_buckets} — the key buckets would be "
                "misread; use the committed value or rebuild the target"
            )
        ops = _cdc_validate_ops(
            batch_df, id_col, vec_col, op_col, "ivfpq_index_changes"
        )
        present = ops.filter(F.col("op").isin("I", "U")).select(id_col, "v")
        bad = present.filter(F.size("v") != pq_m * pq_sub).limit(1).collect()
        if bad:
            raise RuntimeError(
                f"ivfpq_index_changes sink: vector dim {len(bad[0]['v'])} "
                f"!= pq_m*pq_sub = {pq_m * pq_sub} — the subspace slices "
                "would drop trailing dimensions; fix the layout"
            )
        cent_dir = os.path.join(target_dir, "centroids")
        cb_dir = os.path.join(target_dir, "codebooks")
        codes_manifest = read_manifest(target_dir, "codes")
        bootstrap = codes_manifest is None and not os.path.isdir(cent_dir)
        if bootstrap:
            if present.isEmpty():
                raise RuntimeError(
                    "ivfpq_index_changes sink: virgin target and the first "
                    "batch carries no I/U vectors — nothing to train the "
                    "quantizer/codebooks on"
                )
            ev = present.withColumn("vv", V.dot(F.col("v"), F.col("v")))
            cents = _dense_cids(
                means_to_centroids(
                    lloyd_means(ev, k_cells, train_iters, id_col=id_col)
                )
            ).localCheckpoint(eager=True)
            rsub = _pq_residual_subspaces(
                present, cents, id_col, pq_m, pq_sub
            ).localCheckpoint(eager=True)
            cb = train_residual_codebooks(
                rsub, cbk, id_col
            ).localCheckpoint(eager=True)
        else:
            cents = spark.read.parquet(cent_dir)
            cb = with_cc(spark.read.parquet(cb_dir))
            rsub = _pq_residual_subspaces(
                present, cents, id_col, pq_m, pq_sub
            )

        def backfill_pairs():
            allc = read_store(
                spark, target_dir, "codes", manifest=codes_manifest
            )
            return allc.select(
                id_col, F.col("_kb").alias("cell")
            ).distinct()

        (
            kk, touched_kk, loc_manifest, loc_backfill,
            old_loc, retire, retire_counts, retire_cells,
        ) = _cdc_locate_and_retire(
            spark, target_dir, ops, id_col, loc_buckets,
            "ivfpq_index_changes",
            store="codes", store_manifest=codes_manifest,
            backfill_pairs=backfill_pairs,
        )
        delta = (
            assign_codes(rsub, cb, id_col)
            .select(id_col, "m", "cid", "_kb")
            .withColumn("_gen", F.lit(gen).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        delta_counts = [
            # codes carry pq_m rows per vector: occupancy counts VECTORS
            (int(r["_kb"]), int(r["c"]) // pq_m)
            for r in delta.groupBy("_kb")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        touched = sorted(b for b, _ in delta_counts)
        stage = f"{target_dir}.stage-{batch_id}"
        os.makedirs(stage, exist_ok=True)
        if touched:
            write_store_delta(
                spark, delta, target_dir, "codes", stage,
                batch_id=batch_id, touched=touched, manifest=codes_manifest,
                append=True,
            )
        else:
            carry_store(target_dir, "codes", stage)
        _cdc_commit_tombs_and_locator(
            spark, target_dir, stage, batch_id, gen, id_col, ops,
            old_loc,
            delta.select(id_col, F.col("_kb").alias("cell")).distinct(),
            kk, touched_kk, loc_backfill, loc_manifest,
            retire, retire_cells,
        )
        import shutil

        for sub_dir, df_fresh in (("centroids", cents), ("codebooks", cb)):
            committed_dir = os.path.join(target_dir, sub_dir)
            if os.path.isdir(committed_dir):
                shutil.copytree(committed_dir, os.path.join(stage, sub_dir))
            else:
                out_df = (
                    df_fresh.drop("cc") if sub_dir == "codebooks" else df_fresh
                )
                out_df.write.mode("overwrite").parquet(
                    os.path.join(stage, sub_dir)
                )
        with open(os.path.join(stage, "_ivm_meta.json"), "w") as f:
            json.dump(
                {
                    "last_batch_id": max(batch_id, meta["last_batch_id"]),
                    "last_gen": gen,
                    "pq_layout": layout,
                    "loc_buckets": loc_buckets,
                    "cdc": True,
                    "applied_files": sorted(applied | batch_files),
                    **_occupancy_meta(
                        meta.get("cell_counts"), delta_counts, retire_counts,
                        warn_skew=warn_skew,
                    ),
                },
                f,
            )
        _atomic_swap(stage, target_dir, batch_id)

    _run_foreach_batch(
        changes, _apply, checkpoint_dir, "ivfpq_index_changes", timeout_sec
    )

def ivfpq_index_rebuild(
    spark, target_dir: str, vectors: DataFrame, *,
    id_col: str = "vec_id", k_cells: int | None = None,
    train_iters: int = 2, init: str = "lowest",
    warn_skew: float = OCCUPANCY_SKEW_WARN,
) -> int:
    """Drift remediation for the PQ-CODED index — the rebuild
    `ivf_index_retrain` points PQ targets at: the codes store holds no
    vectors, so re-training means going back to the SYSTEM OF RECORD
    (``vectors``: the caller's raw-vector table, (``id_col``, ``v``
    array<double>) — the same table serve-time exact re-rank already
    reads). The index's own stores contribute exactly one thing: the
    LIVE id set (codes minus tombstones under the shared `_live_rows`
    rule) — which ids the rebuilt index must contain; their vectors
    are fetched from the source table by an id join.

    One atomic swap commits: a fresh coarse quantizer trained on the
    live corpus (shared Lloyd trainer; ``init``: 'lowest' = the k
    lowest live ids, or 'spread' = farthest-first seeding for
    multi-cluster drift — the residual codebooks keep the lowest-id
    init either way, since cell subtraction removes the drift
    component the coarse stage absorbs; dense cids — `_dense_cids`),
    fresh residual codebooks trained on
    the live residuals (shared `operators.pq.train_residual_codebooks`
    — the SAME two trainers the bootstrap path uses, so a rebuilt
    index and a from-scratch bootstrap over the live corpus are the
    same artifact), every live row re-encoded into the new cells
    (per-row ``_gen`` preserved — tombstone ordering for future CDC
    batches stays intact), tombstones cleared, the locator (if the
    target is CDC-maintained) rewritten to the new cells, occupancy
    counters rebuilt. Deliberately corpus-sized, like retrain: run at
    drift cadence (the occupancy advisory's trigger), not per batch.
    Returns the number of live rows re-encoded.

    Witnesses: raw-vector targets refuse (use `ivf_index_retrain` —
    their store IS the corpus); an empty live corpus refuses (the
    empty-quantizer wedge, as in retrain); a live id MISSING from the
    system-of-record table refuses (the source table must cover the
    index — rebuilding without it would silently drop the row);
    duplicate source ids and a source dim != pq_m·pq_sub refuse (the
    plain sink's layout witness, re-checked because the corpus is
    re-read from outside the index)."""
    import shutil

    from epe_data_wrangling_spark.operators.pq import (
        assign_codes,
        train_residual_codebooks,
    )

    if init not in ("lowest", "spread"):
        # before any I/O or side-effectful maintenance: a bad literal
        # is known bad at call time
        raise ValueError(
            f"ivfpq_index_rebuild: init={init!r} — use 'lowest' (the "
            "certified default) or 'spread' (farthest-first coarse "
            "seeding for drifted multi-cluster corpora; the residual "
            "codebooks keep the lowest-id init — cell subtraction "
            "removes the drift component the coarse stage absorbs)"
        )
    _recover_swap(target_dir)
    _clean_stale_stages(target_dir)
    sweep_orphans(target_dir)
    meta = _read_sink_meta(target_dir)
    layout = meta.get("pq_layout")
    if layout is None:
        raise RuntimeError(
            "ivfpq_index_rebuild: target is a raw-vector index (no "
            "pq_layout) — its store holds the vectors themselves; use "
            "ivf_index_retrain"
        )
    _k_old, pq_m, pq_sub, cbk = (int(x) for x in layout)
    k = int(k_cells or _k_old)
    codes_manifest = read_manifest(target_dir, "codes")
    if not store_has_files(codes_manifest):
        raise RuntimeError(
            f"ivfpq_index_rebuild: no committed codes at {target_dir}"
        )
    # same pre-upgrade witness the append sinks carry: the rebuild
    # reads _gen per live code row to preserve CDC ordering, so a
    # pre-_gen target must refuse actionably
    _require_gen_schema(codes_manifest, "codes", "ivfpq_index_rebuild")
    codes = read_store(spark, target_dir, "codes", manifest=codes_manifest)
    tombs_manifest = read_manifest(target_dir, "tombs")
    tombs = (
        read_store(spark, target_dir, "tombs", manifest=tombs_manifest)
        if store_has_files(tombs_manifest)
        else None
    )
    live_codes = codes if tombs is None else _live_rows(codes, tombs, id_col)
    # one (id, _gen) row per live vector (its pq_m code rows share one
    # generation by construction — they land in one commit)
    gen_of = (
        live_codes.groupBy(id_col)
        .agg(F.max("_gen").alias("_gen"))
        .localCheckpoint(eager=True)  # feeds the witness join + encode
    )
    if gen_of.isEmpty():
        raise RuntimeError(
            "ivfpq_index_rebuild: the live corpus is empty (every row "
            "tombstoned) — rebuilding would commit an empty quantizer "
            "that silently swallows all future inserts; rebuild the "
            "target from the stream instead"
        )
    src = vectors.select(id_col, "v")
    missing = gen_of.join(src, id_col, "left_anti").limit(1).collect()
    if missing:
        raise RuntimeError(
            f"ivfpq_index_rebuild: live id {missing[0][0]} is not in the "
            "system-of-record vectors table — the source must cover every "
            "live index row (rebuilding without it would silently drop "
            "the row); fix the source table or delete the id first"
        )
    # no broadcast hint: the live id set is CORPUS-sized (one row per
    # live vector) — at index scale it must shuffle-join against the
    # source table (AQE still broadcasts it when it is actually small)
    live = src.join(gen_of.select(id_col), id_col)
    _require_unique_ids(live, id_col, "ivfpq_index_rebuild")
    bad = (
        live.filter(
            F.col("v").isNull() | (F.size("v") != pq_m * pq_sub)
        )
        .limit(1)
        .collect()
    )
    if bad:
        dim = "NULL" if bad[0]["v"] is None else len(bad[0]["v"])
        raise RuntimeError(
            f"ivfpq_index_rebuild: source vector dim {dim} "
            f"!= pq_m*pq_sub = {pq_m * pq_sub} — the subspace slices "
            "would drop trailing dimensions; fix the source table"
        )
    ev = live.withColumn("vv", V.dot(F.col("v"), F.col("v")))
    if init == "spread":
        # materialize before seeding: the sample draw scans the full
        # live corpus once (and Lloyd scans it per iteration below),
        # which would otherwise re-run the source join from scratch;
        # the k-1 argmax passes run on the seeding sample
        ev = ev.localCheckpoint(eager=True)
        seed_df = farthest_first_seeds(ev, k, id_col=id_col)
    else:
        seed_df = None
    cents = _dense_cids(
        means_to_centroids(
            lloyd_means(ev, k, train_iters, id_col=id_col, init=seed_df)
        )
    ).localCheckpoint(eager=True)
    # one assignment/split feeds BOTH codebook training and encoding —
    # the bootstrap path's idiom (the rebuild corpus IS the training
    # corpus, by definition of rebuild-from-source)
    rsub = _pq_residual_subspaces(
        live, cents, id_col, pq_m, pq_sub
    ).localCheckpoint(eager=True)
    cb = train_residual_codebooks(rsub, cbk, id_col).localCheckpoint(
        eager=True
    )
    recoded = (
        assign_codes(rsub, cb, id_col)
        .select(id_col, "m", "cid", "_kb")
        .join(gen_of, id_col)
        .select(id_col, "m", "cid", "_kb", "_gen")  # committed order
        .localCheckpoint(eager=True)  # feeds counts, store, locator
    )
    delta_counts = [
        # codes carry pq_m rows per vector: occupancy counts VECTORS
        (int(r["_kb"]), int(r["c"]) // pq_m)
        for r in recoded.groupBy("_kb")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    n_rows = sum(c for _, c in delta_counts)
    batch_id = int(meta.get("last_batch_id", 0))
    stage = f"{target_dir}.stage-rebuild-{batch_id}"
    os.makedirs(stage, exist_ok=True)
    # every committed bucket is replaced (old cells dissolve into the
    # new partitioning)
    old_buckets = sorted(int(b) for b in codes_manifest["buckets"])
    all_touched = sorted(set(old_buckets) | {b for b, _ in delta_counts})
    write_store_delta(
        spark, recoded, target_dir, "codes", stage,
        batch_id=batch_id, touched=all_touched, manifest=codes_manifest,
    )
    if tombs is not None:
        write_store_delta(
            spark, tombs.filter(F.lit(False)), target_dir, "tombs", stage,
            batch_id=batch_id,
            touched=sorted(int(b) for b in tombs_manifest["buckets"]),
            manifest=tombs_manifest,
        )
    else:
        carry_store(target_dir, "tombs", stage)
    loc_manifest = read_manifest(target_dir, "locator")
    if loc_manifest is not None:
        loc_buckets = int(meta.get("loc_buckets", 32))
        kk = F.pmod(F.hash(F.col(id_col)), F.lit(loc_buckets)).cast("int")
        new_loc = (
            recoded.select(id_col, F.col("_kb").alias("cell"))
            .distinct()
            .withColumn("_kb", kk)
        )
        write_store_delta(
            spark, new_loc, target_dir, "locator", stage,
            batch_id=batch_id,
            touched=sorted(
                set(int(b) for b in loc_manifest["buckets"])
                | {
                    int(r["_kb"])
                    for r in new_loc.select("_kb").distinct().collect()
                }
            ),
            manifest=loc_manifest,
        )
    cents.write.mode("overwrite").parquet(os.path.join(stage, "centroids"))
    cb.drop("cc").write.mode("overwrite").parquet(
        os.path.join(stage, "codebooks")
    )
    new_meta = dict(meta)
    new_meta["pq_layout"] = [k, pq_m, pq_sub, cbk]
    new_meta.pop("occupancy_warning", None)
    new_meta.pop("occupancy_skew", None)
    new_meta.pop("cell_counts", None)
    new_meta.update(
        _occupancy_meta(None, delta_counts, warn_skew=warn_skew)
    )
    with open(os.path.join(stage, "_ivm_meta.json"), "w") as f:
        json.dump(new_meta, f)
    _atomic_swap(stage, target_dir, batch_id)
    return n_rows

def ann_index_maintain(
    spark, target_dir: str, vectors: DataFrame | None = None, *,
    init: str = "spread", train_iters: int = 2,
) -> dict:
    """The drift loop as ONE operational call — measure → warn →
    remediate, dispatched from the committed meta: if the target's
    last commit carries the occupancy advisory (`_occupancy_meta`),
    run the remediation that fits the index form — `ivf_index_retrain`
    for raw-vector targets (default ``init='spread'``: the advisory
    fires on drifted corpora, exactly where lowest-id seeding cannot
    rebalance — SCALE.md r15), `ivfpq_index_rebuild` for PQ targets
    (requires ``vectors``, the system-of-record table; refuses with
    the actionable message otherwise). A healthy target is a NO-OP —
    safe to call after every ingestion cycle; the corpus-sized work
    runs only when the free per-batch signal says drift warrants it.
    Returns {"action": "none"|"retrain"|"rebuild", "rows": n,
    "skew_before": s, "skew_after": s', "improved": bool|None}. The
    remediation rebuilds the occupancy advisory against the TUNED
    threshold the firing advisory carried (``warning["threshold"]``),
    not the module default — so a target whose sink warns at 1.5
    stays held to 1.5 through the loop.

    Two guards for the call-every-cycle posture: (a) a committed
    ``k_cells`` above `SPREAD_SEED_MAX_K` falls back to
    ``init='lowest'`` with a warning — farthest-first's accumulated
    min-dist expression is O(k) dot products deep and past ~64 terms
    the codegen cost dominates (the scan itself is sample-bounded,
    `SPREAD_SAMPLE_CAP`); (b) if the remediation fails to IMPROVE the
    skew (``skew_after`` ≥ ``skew_before``), a warning fires and
    ``improved=False`` is returned — the advisory may still be
    standing, and a caller loop that re-dispatches on it without
    checking ``improved`` would re-run the corpus-sized remediation
    every cycle for nothing (the corpus is genuinely concentrated;
    raise the threshold or change k instead)."""
    import warnings

    from epe_data_wrangling_spark.operators.kmeans import (
        SPREAD_SEED_MAX_K,
    )
    # the recovery contract every entry point honors: a crash between
    # the two renames of a prior _atomic_swap leaves the committed
    # state in <target>.old-N — reading meta without recovering first
    # would report a half-swapped index as a healthy virgin sink
    _recover_swap(target_dir)
    meta = _read_sink_meta(target_dir)
    store = "codes" if meta.get("pq_layout") else "vectors"
    if not store_has_files(read_manifest(target_dir, store)):
        # refuse loudly like the sibling entry points: a typo'd path
        # in a maintenance loop must not report 'healthy' forever
        raise RuntimeError(
            f"ann_index_maintain: no committed index at {target_dir}"
        )
    warning = meta.get("occupancy_warning")
    if warning is None:
        return {
            "action": "none",
            "rows": 0,
            "skew_before": meta.get("occupancy_skew"),
            "skew_after": meta.get("occupancy_skew"),
            "improved": None,  # nothing ran — same shape as the
            # remediation return so loop callers can key on it safely
        }
    tuned = float(warning.get("threshold", OCCUPANCY_SKEW_WARN))
    layout = meta.get("pq_layout")
    k_committed = int(
        layout[0] if layout is not None else (meta.get("k_cells") or 8)
    )
    if init == "spread" and k_committed > SPREAD_SEED_MAX_K:
        warnings.warn(
            f"ann_index_maintain: committed k_cells={k_committed} exceeds "
            f"the farthest-first seeding bound ({SPREAD_SEED_MAX_K}: the "
            "accumulated min-dist expression is O(k) deep and codegen "
            "cost dominates past it) — falling back to init='lowest' for "
            "this remediation; retrain/rebuild explicitly with a smaller "
            "k_cells to use spread seeding",
            stacklevel=2,
        )
        init = "lowest"
    if layout is not None:
        if vectors is None:
            raise RuntimeError(
                "ann_index_maintain: the PQ target's advisory is firing "
                "but no system-of-record vectors table was passed — the "
                "codes store holds no vectors, so the rebuild needs "
                "vectors=<the table serve-time re-rank already reads>"
            )
        n = ivfpq_index_rebuild(
            spark, target_dir, vectors, init=init,
            train_iters=train_iters, warn_skew=tuned,
        )
        action = "rebuild"
    else:
        n = ivf_index_retrain(
            spark, target_dir, init=init, train_iters=train_iters,
            warn_skew=tuned,
        )
        action = "retrain"
    new_meta = _read_sink_meta(target_dir)
    skew_before = warning["skew"]
    skew_after = new_meta.get("occupancy_skew")
    improved = (
        skew_after < skew_before
        if skew_after is not None and skew_before is not None
        else None
    )
    if improved is False:
        warnings.warn(
            f"ann_index_maintain: {action} did not improve occupancy "
            f"skew ({skew_before:.3g} -> {skew_after:.3g}) — the corpus "
            "is genuinely concentrated at this k; re-dispatching on the "
            "standing advisory would re-run the corpus-sized "
            f"{action} every cycle. Raise the threshold, change "
            "k_cells, or gate the loop on improved=False",
            stacklevel=2,
        )
    return {
        "action": action,
        "rows": n,
        "skew_before": skew_before,
        "skew_after": skew_after,
        "improved": improved,
    }
