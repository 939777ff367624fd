"""SVG choropleth renderer (operators/choropleth.py) — the matplotlib/
imageio-free rendering tail of reference nb:21/nb:25."""

from __future__ import annotations

import math

import pytest

from building_permissions_etl_spark.operators.choropleth import (
    log_norm,
    parse_wkt,
    render_animation,
    render_choropleth,
    ring_centroid,
    viridis,
)

_SQ = "POLYGON ((0.0 0.0, 0.0 10.0, 10.0 10.0, 10.0 0.0, 0.0 0.0))"
_MP = ("MULTIPOLYGON (((20.0 0.0, 20.0 5.0, 25.0 5.0, 25.0 0.0, 20.0 0.0)), "
       "((30.0 0.0, 30.0 2.0, 32.0 2.0, 32.0 0.0, 30.0 0.0)))")


def test_viridis_endpoints_and_monotone_green():
    assert viridis(0.0) == "#440154"  # published viridis ends
    assert viridis(1.0) == "#fde725"
    # green channel rises monotonically along the ramp
    greens = [int(viridis(t / 10)[3:5], 16) for t in range(11)]
    assert greens == sorted(greens)


def test_log_norm_matches_matplotlib_semantics():
    assert log_norm(1.0) == 0.0
    assert log_norm(6000.0) == 1.0
    assert log_norm(0.0) == 0.0  # clip below vmin
    mid = log_norm(math.sqrt(6000.0))
    assert mid == pytest.approx(0.5, abs=1e-12)


def test_parse_wkt_rings():
    assert parse_wkt(_SQ) == [
        [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    ]
    rings = parse_wkt(_MP)
    assert len(rings) == 2 and rings[1][0] == (30.0, 0.0)
    with pytest.raises(ValueError):
        parse_wkt("LINESTRING (0 0, 1 1)")


def test_centroid_of_square():
    cx, cy = ring_centroid(parse_wkt(_SQ))
    assert (cx, cy) == pytest.approx((5.0, 5.0))


def test_render_choropleth_structure():
    svg = render_choropleth(
        [("02", _SQ, 100.0), ("14", _MP, 4500.0)],
        title="Permits by voivodeship",
    )
    assert svg.startswith("<svg ") and svg.endswith("</svg>")
    assert svg.count("<path ") == 2
    # 2 centroid labels + title + 2 legend ticks + legend label
    assert svg.count("<text ") == 6
    assert "Permits by voivodeship" in svg
    # high value renders nearer the yellow end than the low value
    i100 = svg.index('<title>02: 100</title>')
    i4500 = svg.index('<title>14: 4500</title>')
    fill100 = svg.rfind('fill="#', 0, i100)
    fill4500 = svg.rfind('fill="#', 0, i4500)
    g100 = int(svg[fill100 + 9:fill100 + 11], 16)
    g4500 = int(svg[fill4500 + 9:fill4500 + 11], 16)
    assert g4500 > g100
    assert 'url(#ramp)' in svg  # legend colorbar present


def test_render_animation_cycles_frames():
    frames = [
        ("2023-01", [("02", _SQ, 10.0)]),
        ("2023-02", [("02", _SQ, 100.0)]),
        ("2023-03", [("02", _SQ, 1000.0)]),
    ]
    svg = render_animation(frames, seconds_per_frame=0.5)
    assert svg.count("<animate ") == 3
    assert 'dur="1.5s"' in svg and 'repeatCount="indefinite"' in svg
    assert svg.count('calcMode="discrete"') == 3
    for label in ("2023-01", "2023-02", "2023-03"):
        assert label in svg
    # frames share one projection: identical path geometry across frames
    d0 = svg.split('<path d="')[1].split('"')[0]
    d1 = svg.split('<path d="')[2].split('"')[0]
    assert d0 == d1


def test_dissolve_to_render_pipeline(spark):
    """nb:25 flow on the engine: county dim → voivodeship dissolve →
    per-voivodeship counts → SVG. Uses the engine-native dissolve."""
    from pyspark.sql import functions as F

    from building_permissions_etl_spark.sources.geo import (
        dissolve_wkt,
        geo_dim_from_records,
    )

    dim = geo_dim_from_records(spark, [
        ("0201", "a", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
        ("0202", "b", "POLYGON ((1 0, 1 1, 2 1, 2 0, 1 0))"),
        ("1401", "c", "POLYGON ((5 5, 5 6, 6 6, 6 5, 5 5))"),
    ])
    dissolved = dissolve_wkt(dim).collect()
    counts = {"02": 120.0, "14": 3000.0}
    svg = render_choropleth(
        [(r["voivodeship"], r["wkt"], counts[r["voivodeship"]])
         for r in dissolved],
        title="by voivodeship",
    )
    assert svg.count("<path ") == 2
    assert "<svg " in svg


def test_render_bar_chart_log_scale():
    from building_permissions_etl_spark.operators.choropleth import (
        render_bar_chart,
    )

    items = [("one", 1200.0), ("two", 300.0), ("three", 7.0)]
    svg = render_bar_chart(items, title="Building Permit Categories")
    assert svg.startswith("<svg ") and svg.endswith("</svg>")
    assert svg.count("<rect ") == 1 + 3  # background + 3 bars
    assert "Log Scale" in svg
    # log scale: bar heights ordered by value, and the 1200 bar is far
    # from 1200/7x the height of the 7 bar
    import re

    hs = [float(m) for m in
          re.findall(r'height="([0-9.]+)" fill="#[0-9a-f]{6}">', svg)]
    assert hs[0] > hs[1] > hs[2] > 0
    assert hs[0] / hs[2] < 5  # compressed by log, not linear
    # power-of-ten tick labels as plain numbers
    assert ">1<" in svg and ">10<" in svg and ">100<" in svg and ">1000<" in svg


def test_bar_chart_from_value_counts(spark):
    """nb:9 flow: value_counts on the engine → bar chart markup."""
    from building_permissions_etl_spark.operators.aggregates import (
        value_counts,
    )
    from building_permissions_etl_spark.operators.choropleth import (
        render_bar_chart,
    )

    docs = spark.createDataFrame(
        [("en",), ("en",), ("de",), ("en",), ("fr",)], ["lang"]
    )
    rows = value_counts(docs, "lang").collect()
    svg = render_bar_chart([(r[0], float(r["cnt"])) for r in rows],
                           log_scale=False)
    assert svg.count("<rect ") == 1 + 3
    assert "Log Scale" not in svg
