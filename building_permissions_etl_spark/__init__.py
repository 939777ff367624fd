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

# The stable public surface: session, catalog, the ETL pipeline stages,
# and the query registry. Operator modules are imported directly
# (building_permissions_etl_spark.operators.<family>) — they are the
# library, this is the front door.
from building_permissions_etl_spark.catalog import load_table, register_views
from building_permissions_etl_spark.plans.registry import oracle_sql, queries

__all__ = [
    "get_spark",
    "load_table",
    "register_views",
    "queries",
    "oracle_sql",
]
