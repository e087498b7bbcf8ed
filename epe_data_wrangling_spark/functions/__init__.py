from epe_data_wrangling_spark.functions import (  # noqa: F401
    cleaning,
    hashing,
    text,
    vectors,
)
