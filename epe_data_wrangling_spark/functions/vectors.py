"""Vector math over ``array<float>`` embedding columns.

Built entirely on Spark's higher-order array functions
(``zip_with`` / ``aggregate``) — JVM-side, codegen'd, no UDF — which
is the right default for 100 TB: the dot product is a narrow
per-row expression, so similarity scans parallelize perfectly and
the only shuffle in a top-k search is the final per-query merge.
Accumulation is in double (floats are upcast first) so results are
stable and match the DuckDB oracle's double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
