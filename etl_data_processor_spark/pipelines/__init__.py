from etl_data_processor_spark.pipelines import medicines  # noqa: F401
