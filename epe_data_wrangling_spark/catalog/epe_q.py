"""The EPE reference pipeline itself as an oracle-checked query.

The driver's star-schema tables cannot exercise the EPE
normalize/semantic path, so the catalog runs the pipeline over the
in-package demo workbook (plans.epe_demo — synthetic sheets covering
every structural feature of the reference's source) and checks it
against a frozen golden VALUES oracle (catalog/epe_expected.py, spot
checks hand-verified in tests/test_epe_pipeline.py). This makes the
full `tratamento_epe.R` behavior — ingest naming, junk slicing, LOCF
fills, 12/13-column dispatch, shape-B header harvest, unpivot, the
five semantic branches, chave_seletora — part of the hash-checked
correctness gate rather than pytest-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog.epe_expected import EXPECTED_ROWS

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _expected_values_sql() -> str:
    rows = ",\n      ".join(
        "(" + ", ".join([_sql_lit(c), _sql_lit(m), _sql_lit(d), _sql_lit(cl), _sql_lit(ab),
                         _sql_lit(at), f"DATE {_sql_lit(dt)}", _sql_lit(v)]) + ")"
        for c, m, d, cl, ab, at, dt, v in EXPECTED_ROWS
    )
    return f"""
    SELECT chave_seletora, mercado, dado, classe, abertura, atributo,
           CAST(data AS DATE) AS data, CAST(valor AS DOUBLE) AS valor
    FROM (VALUES
      {rows}
    ) t(chave_seletora, mercado, dado, classe, abertura, atributo, data, valor)
    """


@query("epe_pipeline_demo", oracle=_expected_values_sql())
def epe_pipeline_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full EPE pipeline (ingest → normalize A/B → 5-branch semantic
    map → selector key) over the demo workbook; sf_dir is unused —
    the workbook is the reference's own data shape, not star-schema."""
    from epe_data_wrangling_spark.plans.epe_demo import demo_workbook
    from epe_data_wrangling_spark.plans.epe_pipeline import run_pipeline

    return run_pipeline(spark, demo_workbook(spark))
