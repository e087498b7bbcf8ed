"""Placeholder — populated in a later milestone."""
from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)
