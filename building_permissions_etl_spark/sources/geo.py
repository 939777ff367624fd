"""S3/S10: the geographic dimension source (reference helpers:774-779).

The reference loads a shapefile with geopandas, reprojects to EPSG:4326,
and stores geometry as WKT strings in an all-string table (380 county
rows). Geometry stays a plain ``StringType`` WKT column in the engine —
small enough to broadcast everywhere it is joined (SURVEY.md §1.1).

geopandas/shapely are not installed in this container, so the shapefile
path is import-gated; the always-available path builds the dim from
(code, name, wkt) records — which is also the shape any warehouse extract
of the dim would have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

POWIATY_SCHEMA = StructType([
    StructField("JPT_KOD_JE", StringType()),   # 4-digit county code
    StructField("JPT_NAZWA_", StringType()),   # county name
    StructField("wkt", StringType()),          # geometry as WKT (EPSG:4326)
])


def geo_dim_from_records(
    spark: SparkSession, records: list[tuple[str, str, str]]
) -> DataFrame:
    """Build the dim from (code, name, wkt) tuples — the engine-native
    path; tiny table, created on the driver like the reference's
    GeoDataFrame→BQ load."""
    return spark.createDataFrame(records, POWIATY_SCHEMA)


def geo_dim_from_shapefile(
    spark: SparkSession, shapefile_path: str, crs: str = "EPSG:4326"
) -> DataFrame:
    """Shapefile → reproject → WKT → DataFrame (helpers:774-779 parity).
    Requires geopandas; raises ImportError with guidance if absent."""
    try:
        import geopandas as gpd
    except ImportError as ex:  # pragma: no cover - geopandas not in container
        raise ImportError(
            "geo_dim_from_shapefile needs geopandas; install it or use "
            "geo_dim_from_records with a pre-extracted (code, name, wkt) list"
        ) from ex
    gdf = gpd.read_file(shapefile_path).to_crs(crs)
    records = [
        (str(r["JPT_KOD_JE"]), str(r["JPT_NAZWA_"]), r.geometry.wkt)
        for _, r in gdf.iterrows()
    ]
    return geo_dim_from_records(spark, records)
