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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
