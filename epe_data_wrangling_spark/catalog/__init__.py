"""Named query catalog — the engine's externally-checkable surface.

Every operator family from SURVEY.md §2 (plus the north-star
extensions) is exposed here as a named query: a PySpark plan builder
``(spark, sf_dir) -> DataFrame`` paired with a DuckDB oracle SQL
string that computes the same result on the same parquet tables.
``__spark_entry__`` re-exports this registry to the driver.

Oracle-parity rules used throughout (see also tools/verify_local.py):

- Alias every computed column identically on both sides; the driver
  sorts columns by name before hashing.
- Money/measure aggregates go through ``decimal(18,6)`` so the sum is
  exact (order-free) on both engines, then cast to double at the end.
  Per-row double arithmetic is written with the same operation tree on
  both sides so IEEE results are bit-identical.
- Anything hashed/sketched uses md5 hex strings (the one hash both
  engines share); see ``functions.hashing``.
- Deterministic total orders everywhere a limit/top-k/rank appears
  (explicit tie-break keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    headline: bool = False  # included in bench.py's headline set


def make_registrar(registry: dict[str, CatalogQuery]):
    """Per-module decorator factory: ``@query('name', oracle=..., headline=...)``."""

    def query(name: str, oracle: str | None = None, headline: bool = False):
        def deco(fn):
            registry[name] = CatalogQuery(name, fn, oracle, fn.__doc__ or "", headline)
            return fn

        return deco

    return query


def all_queries() -> dict[str, CatalogQuery]:
    from epe_data_wrangling_spark.catalog import (
        core,
        curate_q,
        dedup_q,
        epe_q,
        multimodal_q,
        reshape_q,
        similarity_q,
        streaming_q,
        text_q,
        windows_q,
    )

    merged: dict[str, CatalogQuery] = {}
    for mod in (
        core,
        windows_q,
        reshape_q,
        text_q,
        dedup_q,
        similarity_q,
        streaming_q,
        multimodal_q,
        curate_q,
        epe_q,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
