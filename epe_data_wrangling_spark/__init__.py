"""epe_data_wrangling_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``msamuelms/epe_data_wrangling`` (an eager,
single-threaded R/tidyverse ETL pipeline; see SURVEY.md) as an
idiomatic, Catalyst-optimized PySpark library, extended with the
operators a large-scale (100 TB posture) training-data pipeline
needs: deduplication, similarity search, text analysis, multimodal
column plumbing, and structured streaming.

Layout
------
- ``session``     SparkSession builder with scale-tuned defaults.
- ``sources``     Parquet star-schema registry + EPE workbook ingest.
- ``plans``       The EPE normalize/semantic pipeline (reference parity).
- ``functions``   Column-level helpers (cleaning, text, hashing, vectors).
- ``operators``   Dataset-level operators (dedup, similarity, windows,
                  reshape, joins).
- ``catalog``     The named query catalog exposed through
                  ``__spark_entry__.queries()`` / ``oracle_sql()``.
- ``streaming``   Structured Streaming variants of the event operators.
- ``multimodal``  Binary-column (image/audio) plumbing over mapInPandas.

Everything on the data path is DataFrame/Spark-SQL: no RDDs, no
row-at-a-time Python UDFs in the core. The few places that genuinely
need Python (Excel header harvesting, multimodal decode) are either
driver-side plan construction or Arrow-batched ``mapInPandas``.
"""

__version__ = "0.1.0"

from epe_data_wrangling_spark.session import get_spark  # noqa: F401
