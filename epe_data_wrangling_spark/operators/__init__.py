from epe_data_wrangling_spark.operators import (  # noqa: F401
    dedup,
    reshape,
    similarity,
    windows,
)
