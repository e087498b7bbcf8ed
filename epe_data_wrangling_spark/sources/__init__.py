from epe_data_wrangling_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
)
