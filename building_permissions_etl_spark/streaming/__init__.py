from building_permissions_etl_spark.streaming import events  # noqa: F401
