"""building_permissions_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference repo ``JakBiel/Building_permissions_ETL``
(an Airflow + pandas + BigQuery ETL), re-expressed as lazy DataFrame/SQL
plans compiled by Catalyst and executed by Tungsten. See ``SURVEY.md``
at the repo root for the full capability blueprint.

Design rules (enforced across the package):
  * lazy DataFrame plans end-to-end; no ``collect()`` inside operators;
  * built-in ``pyspark.sql.functions`` over UDFs — Python enters only via
    Arrow-batched pandas UDFs in the M7 extension operators;
  * small dimensions are broadcast; every shuffle is on an explicit key;
  * explicit StructType schemas, never inferSchema in production paths.
"""

from building_permissions_etl_spark.session import get_spark

__all__ = ["get_spark"]
