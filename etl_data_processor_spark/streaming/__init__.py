from etl_data_processor_spark.streaming import windows  # noqa: F401
