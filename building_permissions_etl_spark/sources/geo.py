"""S3/S10: the geographic dimension source (reference helpers:774-779).

The reference loads a shapefile with geopandas, reprojects to EPSG:4326,
and stores geometry as WKT strings in an all-string table (380 county
rows). Geometry stays a plain ``StringType`` WKT column in the engine —
small enough to broadcast everywhere it is joined (SURVEY.md §1.1).

``geo_dim_from_shapefile`` auto-detects its backend (same seam pattern
as the multimodal codec): geopandas when installed, otherwise the
built-in pure-Python reader (``sources/shapefile.py``) plus the
built-in EPSG:2180→WGS84 series transform (``functions/crs.py``) — so
the reference's S3 path runs end-to-end in this container with no geo
library at all. ``geo_dim_from_records`` remains the path for
warehouse extracts that already carry (code, name, wkt).
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


def _detect_source_epsg(shapefile_path: str) -> int:
    """CRS sniff from the sidecar ``.prj`` WKT. Defaults to 2180
    (PUWG 1992) — the CRS the reference's shapefile ships in — when no
    .prj exists; REFUSES a .prj that names any other CRS rather than
    silently running the 2180 inverse on foreign coordinates (which
    would produce plausible-looking garbage)."""
    import os

    prj = shapefile_path[:-4] + ".prj"
    if not os.path.exists(prj):
        return 2180
    with open(prj, encoding="ascii", errors="replace") as f:
        wkt = f.read().upper()
    if "WGS_1984" in wkt or "WGS 84" in wkt or '"4326"' in wkt:
        return 4326
    if ("1992" in wkt or "2180" in wkt or "CS92" in wkt
            or "POLAND" in wkt):
        return 2180
    raise ValueError(
        f"{prj}: unrecognized source CRS ({wkt[:80]!r}...); the built-in "
        f"backend transforms only EPSG:2180 (or passes 4326 through) — "
        f"install geopandas for other source projections"
    )


def geo_dim_from_shapefile(
    spark: SparkSession, shapefile_path: str, crs: str = "EPSG:4326"
) -> DataFrame:
    """Shapefile → reproject → WKT → DataFrame (helpers:774-779 parity).

    Backend auto-detect: geopandas when available (arbitrary CRS pairs);
    otherwise the built-in reader + built-in EPSG:2180→WGS84 transform.
    The built-in path supports exactly the reference's case — target
    EPSG:4326 from a 2180 (or already-4326) source — and says so loudly
    for anything else.
    """
    try:
        import geopandas as gpd
    except ImportError:
        gpd = None
    if gpd is not None:  # pragma: no cover - geopandas not in container
        gdf = gpd.read_file(shapefile_path).to_crs(crs)
        records = [
            (str(r["JPT_KOD_JE"]), str(r["JPT_NAZWA_"]), r.geometry.wkt)
            for _, r in gdf.iterrows()
        ]
        return geo_dim_from_records(spark, records)

    from building_permissions_etl_spark.functions.crs import to_wgs84
    from building_permissions_etl_spark.sources.shapefile import (
        shapefile_records,
    )

    if crs not in ("EPSG:4326", "4326", 4326):
        raise ValueError(
            f"built-in shapefile backend only targets EPSG:4326, got {crs!r}; "
            f"install geopandas for arbitrary reprojection"
        )
    source_epsg = _detect_source_epsg(shapefile_path)
    transform = to_wgs84 if source_epsg == 2180 else None
    return geo_dim_from_records(
        spark, shapefile_records(shapefile_path, transform=transform)
    )


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
