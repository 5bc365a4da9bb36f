from etl_data_processor_spark.sources import paged  # noqa: F401
