"""Parquet star-schema sources.

The reference's only source is a single HTTP-fetched ``.xls`` workbook
(`tratamento_epe.R:39-47,57,63`); its workbook ingest lives in
``sources.workbook``. This module is the engine's general tabular
source layer over the driver's TPC-H-ish parquet tables
(TESTDATA.md): plain ``spark.read.parquet`` scans, which at cluster
scale are splittable columnar reads with predicate pushdown and
column pruning handled by Catalyst — the scale-correct analogue of
the reference's eager whole-file reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every table the driver materializes per scale factor.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should broadcast in star joins.
DIMENSIONS: frozenset[str] = frozenset({"region", "nation", "supplier", "customer", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one star-schema table.

    ``events.parquet`` has stored ``ts`` two ways across driver data
    generations; both are normalized to a session-tz TIMESTAMP (LTZ)
    so every consumer (watermarks, ``F.window``, ``unix_micros``)
    sees one type:

    - parquet TIMESTAMP(NANOS) (older corpora): Spark's reader
      rejects it by default; read as raw nanos (``nanosAsLong``) and
      truncated to microseconds — exactly what DuckDB's reader does.
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) (current
      corpora): Spark 4 infers TIMESTAMP_NTZ; cast to LTZ. Under the
      engine's UTC session timezone the cast is value-preserving, so
      the displayed instant matches DuckDB's naive read.

    NOTE (deliberate session-wide side effect): reading ``events``
    sets ``spark.sql.legacy.parquet.nanosAsLong=true`` for the whole
    session, so any OTHER nanos-timestamp parquet read later in the
    same session also surfaces as bigint. The conf cannot be scoped
    per-read (no DataFrameReader option exists, and it is consulted
    again at scan execution, so save/restore around schema inference
    would break collection). Engine policy: nanos columns are always
    read as longs and explicitly truncated to microsecond timestamps,
    as done for ``ts`` below — apply the same pattern to new sources.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so ``spark.sql`` can address them."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
