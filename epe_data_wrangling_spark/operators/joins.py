"""Join strategy helpers (SURVEY §2.4 — the reference joins nothing;
this is the engine surface the star schema exercises).

Catalyst picks physical join strategies fine on its own; what it
cannot do without help pre-Spark-3 AQE — and what still matters when
AQE's runtime stats arrive too late (first shuffle already skewed) —
is key-skew mitigation. ``salted_join`` implements the classic
explicit treatment: salt the skewed (large) side's key into N
sub-keys, explode the small side N×, join on (key, salt). Logically
identical to the plain join; physically the hot key's rows spread
over N tasks instead of one straggler.

At 100 TB: pick ``n_salts`` ≈ ceil(hot-key rows / target-partition
rows); salting composes with broadcast (broadcast the exploded small
side) so the shuffle disappears entirely for dim joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of (backward) join: for every left row, attach the latest
    right row of the same key with ``right_ts <= left_ts`` — the
    time-series enrichment join Spark has no native operator for.

    Implemented as the union+window idiom: tag both sides, union by
    key, sort by (ts, side) within each key (right-before-left on
    ties so an equal timestamp matches), LOCF-fill the right side's
    values down, keep left rows. Cost: ONE shuffle on the key — the
    same shuffle a plain equi-join would pay — versus the naïve
    per-left-row subquery which is a range join that explodes
    quadratically. Scales to 100 TB the way windows do: per-key
    partitions, no global sort.
    """
    lcols = left.columns
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "_side",
        *lcols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tie: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of (forward / "next event") join: for every left row, attach
    the EARLIEST right row of the same key with ``right_ts >=
    left_ts`` — the mirror of :func:`asof_join_backward`, used for
    "time to next X" analyses (error → next purchase, signal → next
    fill). Optional ``tolerance_seconds`` nulls the match when the
    matched right row is further ahead than the tolerance.

    Same scale shape as the backward variant: tag both sides, union by
    key, sort by (ts, side[, right_tie]) within each key — LEFT before
    RIGHT on timestamp ties so an equal timestamp still matches — and
    take ``first(..., ignorenulls)`` over the current→following frame.
    ONE shuffle on the key, per-key parallel sort, no range join.
    ``right_tie`` (a right-side unique column, e.g. its event id)
    makes tie-breaks among equal-timestamp right rows deterministic.

    The matched right timestamp comes back as ``asof_ts`` (null when
    no match / out of tolerance).
    """
    if right_tie is not None:
        from pyspark.sql.types import NumericType

        tie_type = right.schema[right_tie].dataType
        if not isinstance(tie_type, NumericType):
            raise TypeError(
                f"right_tie column {right_tie!r} must be numeric for a deterministic "
                f"tie-break; got {tie_type.simpleString()} (a silent cast would null "
                "every value and lose the ordering)"
            )
    lcols = left.columns
    l2 = left.select(
        F.col(on).alias("_k"),
        F.unix_micros(F.col(left_ts)).alias("_us"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("long").alias("_r_us"),
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.unix_micros(F.col(right_ts)).alias("_us"),
        F.lit(1).alias("_side"),
        (F.col(right_tie).cast("long") if right_tie else F.lit(0)).cast("long").alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.unix_micros(F.col(right_ts)).alias("_r_us"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy("_k")
        .orderBy("_us", "_side", "_tie")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = u.select(
        "_side",
        "_us",
        *lcols,
        F.first("_r_us", ignorenulls=True).over(w).alias("_m_us"),
        *[F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    out = filled.filter(F.col("_side") == 0)
    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (F.col("_m_us") - F.col("_us")) <= F.lit(int(tolerance_seconds * 1_000_000))
    )
    keep = F.col("_m_us").isNotNull() & in_tol
    return out.select(
        *lcols,
        F.when(keep, F.timestamp_micros(F.col("_m_us"))).alias("asof_ts"),
        *[F.when(keep, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in value_cols],
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
    broadcast_small: bool = True,
) -> DataFrame:
    """Skew-safe equi-join on column ``on`` (same name both sides).

    The large side gets a uniform random-ish salt derived from a hash
    of its whole row via ``pmod(hash(...), n_salts)`` — deterministic
    per row, uniform across rows, so the hot key splits evenly. The
    small side is replicated once per salt value (explode of a
    literal range). Result equals ``large.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (skew lives on the large side)")
    salt = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    salted_large = large.withColumn("_salt", salt)
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    if broadcast_small:
        replicated = F.broadcast(replicated)
    return salted_large.join(replicated, [on, "_salt"], how).drop("_salt")


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``points.ts BETWEEN intervals.start AND
    intervals.end`` within a key) via time binning — the batch form of
    Flink's interval join, and the scale treatment of a predicate
    Spark would otherwise plan as a per-key cartesian range join.

    Each interval is exploded across the fixed-width time bins it
    covers (⌈len/bin⌉ + 1 copies), points are tagged with their bin,
    and the join becomes an EQUI-join on (key, bin) refined by the
    exact BETWEEN predicate. A (point, interval) pair can match in at
    most one bin — the point's — so no dedup is needed. Cost: one
    shuffle on (key, bin) with interval fan-out ~len/bin, versus the
    per-key O(points × intervals) of the naive range join. Pick
    ``bin_seconds`` ≈ the typical interval length so fan-out stays
    small while bins stay selective.

    Column names (besides ``on``) must be disjoint between the two
    inputs; rename before calling.
    """
    if how != "inner":
        raise ValueError("binned_interval_join is inner-only (range semantics)")

    def _bin(ts_col: str) -> Column:
        return F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bin_seconds))

    ib = intervals.withColumn(
        "_bin", F.explode(F.sequence(_bin(start_ts), _bin(end_ts)))
    )
    pb = points.withColumn("_bin", _bin(point_ts))
    return (
        pb.join(ib, [on, "_bin"], "inner")
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bin")
    )


# ---- Bloom-filter join pre-filtering (runtime-filter pattern) --------

BLOOM_M_BITS = 2048  #: default filter size (33 × 63-bit words — see _bloom_word_mask_sql)
BLOOM_K = 3  #: hash functions


def _bloom_pos_sql(key_col: str, m_bits: int, k: int) -> list[str]:
    """k independent bit positions for a key, as SQL expression text:
    first 8 md5 hex digits of 'bloom{j}|<key>' as an integer, mod
    m_bits — the same md5-prefix integer hash family the MinHash/LSH
    operators use (portable: any engine with md5 computes identical
    bits). SQL text rather than Column objects because the shift
    amount below is data-dependent and the Python ``shiftleft``
    wrapper only takes literal shift counts."""
    return [
        f"(CAST(conv(substring(md5(CAST(concat('bloom{j}|', "
        f"CAST({key_col} AS STRING)) AS BINARY)), 1, 8), 16, 10) AS BIGINT) "
        f"% {m_bits})"
        for j in range(k)
    ]


def _bloom_word_mask_sql(p: str) -> tuple[str, str]:
    """(word index, word bitmask) SQL for a bit-position expression.
    Words hold 63 bits, not 64: bit 63 of a signed BIGINT is the sign
    bit and ``1 << 63`` is a checked overflow in DuckDB — the oracle
    side must build the identical filter, so both engines stay on
    shift counts 0..62."""
    w = f"CAST(({p} DIV 63) AS INT)"
    m = f"shiftleft(CAST(1 AS BIGINT), CAST(({p} % 63) AS INT))"
    return w, m


def bloom_build(
    dim: DataFrame, key_col: str, *, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Build a Bloom filter over ``dim[key_col]`` as a (w, m) word
    relation: each key sets ``k`` bits; words are OR-merged with a
    ``bit_or`` aggregate. The build is one shuffle of ≤ ⌈m_bits/63⌉
    groups regardless of dim size — at 100 TB the filter is built by
    partial aggregation (every executor ORs its local bits first),
    which is exactly how engines build runtime filters.

    NULL dim keys are dropped before hashing: a NULL never matches an
    equi-join, and a NULL word index would poison the broadcast map
    (map keys cannot be null)."""
    structs = []
    for p in _bloom_pos_sql(key_col, m_bits, k):
        w, m = _bloom_word_mask_sql(p)
        structs.append(f"struct({w} AS w, {m} AS m)")
    entries = (
        dim.filter(F.col(key_col).isNotNull())
        .selectExpr(f"explode(array({', '.join(structs)})) AS e")
        .select("e.w", "e.m")
    )
    return entries.groupBy("w").agg(F.bit_or("m").alias("m"))


def bloom_flag_fact(
    fact: DataFrame,
    dim: DataFrame,
    *,
    dim_key: str,
    fact_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    flag: str = "_bloom_pass",
) -> DataFrame:
    """Tag every fact row with Bloom membership of ``fact_key`` in the
    dim-side key set — the runtime-filter pattern: the ≤ ⌈m_bits/63⌉-word
    filter is broadcast as ONE map value, membership is a pure
    map-side expression, and ``.filter(flag)`` prunes fact rows
    BEFORE any join shuffle. No false negatives by construction
    (every true key's bits are set); false positives are re-checked
    by the real join that follows, so correctness never depends on
    the filter. Worth it at 100 TB whenever the dim side is too big
    to broadcast as ROWS (forcing a sort-merge join) but its key
    FINGERPRINT still fits in kilobytes — the fact rows that survive
    are the only ones that pay the shuffle. Spark's own
    InjectRuntimeFilter does this automatically when stats allow;
    this operator is the explicit, stats-independent form."""
    bm = bloom_build(dim, dim_key, m_bits=m_bits, k=k).agg(
        F.map_from_entries(F.sort_array(F.collect_list(F.struct("w", "m")))).alias("_bm")
    )
    checks = []
    for p in _bloom_pos_sql(fact_key, m_bits, k):
        w, m = _bloom_word_mask_sql(p)
        checks.append(
            f"((coalesce(element_at(_bm, {w}), CAST(0 AS BIGINT)) & {m}) != 0)"
        )
    # NULL fact keys hash to NULL positions → NULL conjunction; pin
    # them to false (a NULL key can't equi-match, so don't pass it)
    cond = F.coalesce(F.expr(" AND ".join(checks)), F.lit(False))
    return fact.crossJoin(F.broadcast(bm)).withColumn(flag, cond).drop("_bm")
