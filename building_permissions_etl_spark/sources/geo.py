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


def dissolve_wkt(
    dim: DataFrame,
    code_col: str = "JPT_KOD_JE",
    wkt_col: str = "wkt",
    prefix_len: int = 2,
) -> DataFrame:
    """A10 analog: dissolve county geometries per voivodeship
    (reference: csv_analyze.ipynb cells 21/25, ``dissolve(by=...)``).

    Engine-native path — no geometry library: each county polygon becomes
    a member of the voivodeship's MULTIPOLYGON (WKT string surgery +
    grouped collect). Interior county boundaries are kept, so this is a
    geometry-collection dissolve, which renders the identical region on
    a choropleth; ``dissolve_union`` below removes interior boundaries
    when shapely is available. Members are sorted for determinism. The
    dim is ~380 rows — the aggregation is driver-scale by construction,
    exactly like the reference's GeoDataFrame dissolve.
    """
    from pyspark.sql import functions as F

    member = F.when(
        F.col(wkt_col).startswith("MULTIPOLYGON"),
        # strip the MULTIPOLYGON ( ... ) wrapper, keep the member list
        F.expr(
            f"substring(regexp_replace({wkt_col}, '^MULTIPOLYGON\\\\s*\\\\(', ''), "
            f"1, length(regexp_replace({wkt_col}, '^MULTIPOLYGON\\\\s*\\\\(', '')) - 1)"
        ),
    ).otherwise(F.regexp_replace(F.col(wkt_col), r"^POLYGON\s*", ""))
    return (
        dim.groupBy(F.substring(F.col(code_col), 1, prefix_len).alias("voivodeship"))
        .agg(
            F.concat(
                F.lit("MULTIPOLYGON ("),
                F.concat_ws(", ", F.sort_array(F.collect_list(member))),
                F.lit(")"),
            ).alias("wkt"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("voivodeship")
    )


def dissolve_union(
    dim: DataFrame,
    code_col: str = "JPT_KOD_JE",
    wkt_col: str = "wkt",
    prefix_len: int = 2,
):
    """True geometric dissolve (interior boundaries removed) — the exact
    ``dissolve(by=...)`` semantics, via shapely's unary_union on the
    driver (the dim is tiny; this mirrors the reference doing it in
    geopandas). Import-gated: raises with guidance if shapely is absent.
    Returns a list of (voivodeship, wkt) tuples like the notebook's
    GeoDataFrame."""
    try:
        from shapely import unary_union, wkt as _wkt
    except ImportError as ex:  # pragma: no cover - shapely not in container
        raise ImportError(
            "dissolve_union needs shapely; use dissolve_wkt for the "
            "engine-native geometry-collection dissolve"
        ) from ex
    rows = dim.select(code_col, wkt_col).collect()
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r[0][:prefix_len], []).append(_wkt.loads(r[1]))
    return sorted(
        (voiv, unary_union(geoms).wkt) for voiv, geoms in groups.items()
    )
