from building_permissions_etl_spark.pipeline.cli import main

main()
