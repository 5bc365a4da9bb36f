from etl_data_processor_spark.ops import (  # noqa: F401
    scalar,
    relational,
    arrays,
    text,
)
