"""Choropleth rendering without matplotlib/imageio (reference nb:21,
nb:25 parity).

The reference draws voivodeship maps with geopandas/matplotlib (viridis
colormap, LogNorm(1, 6000), black edges, count labels at polygon
centroids) and stitches per-month PNGs into a GIF with imageio. None of
those libraries exist in this container, so the renderer emits SVG —
the same visual (paths, fills, labels, legend) as vector markup, and
the GIF analog as a single SMIL-animated SVG cycling one frame per
month. Everything is driver-side string work over the ~16-row dissolved
dim, exactly where the reference does its rendering; the DATA behind
the plot (dissolve, rollups, dim joins, lookback filters) is the
engine's job and is oracle-checked elsewhere.

Viridis is sampled at 9 anchor points (the published colormap values,
public domain) and linearly interpolated — indistinguishable at
choropleth granularity.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

_VIRIDIS = [
    (68, 1, 84), (72, 40, 120), (62, 74, 137), (49, 104, 142),
    (38, 130, 142), (31, 158, 137), (53, 183, 121), (109, 205, 89),
    (253, 231, 37),
]


def viridis(t: float) -> str:
    """t ∈ [0, 1] → '#rrggbb' on the interpolated viridis ramp."""
    t = min(1.0, max(0.0, t))
    pos = t * (len(_VIRIDIS) - 1)
    i = min(int(pos), len(_VIRIDIS) - 2)
    frac = pos - i
    rgb = tuple(
        round(a + (b - a) * frac)
        for a, b in zip(_VIRIDIS[i], _VIRIDIS[i + 1])
    )
    return "#{:02x}{:02x}{:02x}".format(*rgb)


def log_norm(v: float, vmin: float = 1.0, vmax: float = 6000.0) -> float:
    """matplotlib.colors.LogNorm semantics: log-position of v in
    [vmin, vmax], clipped to [0, 1]."""
    if v <= vmin:
        return 0.0
    if v >= vmax:
        return 1.0
    return (math.log(v) - math.log(vmin)) / (math.log(vmax) - math.log(vmin))


def parse_wkt(wkt: str) -> list[list[tuple[float, float]]]:
    """POLYGON/MULTIPOLYGON WKT → flat list of rings (outer + holes)."""
    body = wkt.strip()
    for prefix in ("MULTIPOLYGON", "POLYGON"):
        if body.startswith(prefix):
            body = body[len(prefix):].strip()
            break
    else:
        raise ValueError(f"unsupported WKT: {wkt[:40]!r}")
    # rings are exactly the innermost parenthesized segments
    rings: list[list[tuple[float, float]]] = []
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            start = i + 1
        elif ch == ")":
            if start is not None:
                coords = []
                for pair in body[start:i].split(","):
                    x, y = pair.split()
                    coords.append((float(x), float(y)))
                rings.append(coords)
            start = None
    return rings


def ring_centroid(rings: list[list[tuple[float, float]]]) -> tuple[float, float]:
    """Area-weighted centroid of the largest ring (label anchor, like
    ``geometry.centroid`` in the notebook)."""
    best, best_area = None, -1.0
    for ring in rings:
        a = cx = cy = 0.0
        for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
            cross = x1 * y2 - x2 * y1
            a += cross
            cx += (x1 + x2) * cross
            cy += (y1 + y2) * cross
        area = abs(a) / 2.0
        if area > best_area and a != 0:
            best_area = area
            best = (cx / (3.0 * a), cy / (3.0 * a))
    if best is None:  # degenerate: mean of first ring
        pts = rings[0]
        best = (sum(p[0] for p in pts) / len(pts),
                sum(p[1] for p in pts) / len(pts))
    return best


def _bounds(features):
    xs, ys = [], []
    for _, rings, _ in features:
        for ring in rings:
            xs.extend(p[0] for p in ring)
            ys.extend(p[1] for p in ring)
    return min(xs), min(ys), max(xs), max(ys)


def _project(features, width, height, pad):
    x0, y0, x1, y1 = _bounds(features)
    sx = (width - 2 * pad) / (x1 - x0 or 1.0)
    sy = (height - 2 * pad) / (y1 - y0 or 1.0)
    s = min(sx, sy)

    def to_px(x, y):  # SVG y grows downward
        return (pad + (x - x0) * s, height - pad - (y - y0) * s)

    return to_px


def _feature_markup(features, to_px, vmin, vmax, label_fmt):
    parts = []
    features = [f for f in features if f[1]]  # skip EMPTY geometries
    for code, rings, value in features:
        d = ""
        for ring in rings:
            pts = [to_px(x, y) for x, y in ring]
            d += "M " + " L ".join(f"{px:.2f} {py:.2f}" for px, py in pts) + " Z "
        fill = viridis(log_norm(value, vmin, vmax))
        parts.append(
            f'<path d="{d.strip()}" fill="{fill}" stroke="black" '
            f'stroke-width="0.8"><title>{code}: {value:g}</title></path>'
        )
    for code, rings, value in features:
        cx, cy = to_px(*ring_centroid(rings))
        parts.append(
            f'<text x="{cx:.2f}" y="{cy:.2f}" font-size="11" '
            f'text-anchor="middle" fill="white" stroke="black" '
            f'stroke-width="0.25">{label_fmt(value)}</text>'
        )
    return parts


def _legend(width, height, vmin, vmax, legend_label):
    parts = [f'<defs><linearGradient id="ramp" x1="0" y1="1" x2="0" y2="0">']
    for i in range(9):
        t = i / 8.0
        parts.append(f'<stop offset="{t:.3f}" stop-color="{viridis(t)}"/>')
    parts.append("</linearGradient></defs>")
    x = width - 46
    parts.append(
        f'<rect x="{x}" y="40" width="14" height="{height - 110}" '
        f'fill="url(#ramp)" stroke="black" stroke-width="0.5"/>'
    )
    parts.append(
        f'<text x="{x + 18}" y="52" font-size="10">{vmax:g}</text>'
    )
    parts.append(
        f'<text x="{x + 18}" y="{height - 66}" font-size="10">{vmin:g}</text>'
    )
    parts.append(
        f'<text x="{x + 7}" y="{height - 44}" font-size="10" '
        f'text-anchor="middle">{legend_label}</text>'
    )
    return parts


def render_choropleth(
    features: Sequence[tuple[str, str, float]],
    title: str = "",
    vmin: float = 1.0,
    vmax: float = 6000.0,
    width: int = 640,
    height: int = 640,
    legend_label: str = "Number of Records",
    label_fmt=lambda v: f"{int(v)}",
) -> str:
    """(code, wkt, value) rows → complete SVG document: viridis-filled
    log-normalized polygons, black edges, centroid value labels, vertical
    colorbar legend — the nb:25 figure as vector markup."""
    feats = [(c, parse_wkt(w), float(v)) for c, w, v in features]
    if not any(rings for _, rings, _ in feats):
        raise ValueError(
            "render_choropleth: no features with geometry to render "
            "(empty dim or all-EMPTY WKT)"
        )
    to_px = _project(feats, width, height, pad=24)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="20" font-size="15" '
        f'text-anchor="middle">{title}</text>',
    ]
    parts += _feature_markup(feats, to_px, vmin, vmax, label_fmt)
    parts += _legend(width, height, vmin, vmax, legend_label)
    parts.append("</svg>")
    return "\n".join(parts)


def render_animation(
    frames: Sequence[tuple[str, Sequence[tuple[str, str, float]]]],
    seconds_per_frame: float = 1.0,
    **kwargs,
) -> str:
    """[(frame_label, features)] → ONE SMIL-animated SVG cycling the
    frames — the GIF analog of nb:25's imageio loop, with a shared
    coordinate system and color scale so frames are comparable."""
    vmin = kwargs.pop("vmin", 1.0)
    vmax = kwargs.pop("vmax", 6000.0)
    width = kwargs.pop("width", 640)
    height = kwargs.pop("height", 640)
    title = kwargs.pop("title", "")
    label_fmt = kwargs.pop("label_fmt", lambda v: f"{int(v)}")
    legend_label = kwargs.pop("legend_label", "Number of Records")

    parsed = [
        (label, [(c, parse_wkt(w), float(v)) for c, w, v in feats])
        for label, feats in frames
    ]
    all_feats = [f for _, feats in parsed for f in feats]
    if not any(rings for _, rings, _ in all_feats):
        raise ValueError(
            "render_animation: no frames with geometry to render"
        )
    to_px = _project(all_feats, width, height, pad=24)
    n = len(parsed)
    total = n * seconds_per_frame
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="20" font-size="15" '
        f'text-anchor="middle">{title}</text>',
    ]
    for i, (label, feats) in enumerate(parsed):
        t0, t1 = i / n, (i + 1) / n
        # calcMode="discrete": value k holds over [keyTime_k, keyTime_k+1)
        if i == 0:
            key_times, values = f"0;{t1:.4f};1", "1;0;0"
        elif i == n - 1:
            key_times, values = f"0;{t0:.4f};1", "0;1;1"
        else:
            key_times, values = f"0;{t0:.4f};{t1:.4f};1", "0;1;0;0"
        parts.append(f'<g opacity="{1 if i == 0 else 0}">')
        if n > 1:
            parts.append(
                f'<animate attributeName="opacity" dur="{total}s" '
                f'repeatCount="indefinite" calcMode="discrete" '
                f'keyTimes="{key_times}" values="{values}"/>'
            )
        parts += _feature_markup(feats, to_px, vmin, vmax, label_fmt)
        parts.append(
            f'<text x="{width / 2:.0f}" y="{height - 8}" font-size="13" '
            f'text-anchor="middle">{label}</text>'
        )
        parts.append("</g>")
    parts += _legend(width, height, vmin, vmax, legend_label)
    parts.append("</svg>")
    return "\n".join(parts)


def render_bar_chart(
    items: Sequence[tuple[str, float]],
    title: str = "",
    ylabel: str = "Number of Occurrences",
    log_scale: bool = True,
    width: int = 760,
    height: int = 420,
) -> str:
    """(label, value) rows → SVG bar chart matching the notebook's bar
    plots (nb:9, nb:11, nb:13, nb:21): viridis gradient over
    linspace(0.45, 0.9, n) like ``plt.cm.viridis``, optional log-scale
    y-axis with plain-number tick labels (the notebook's FuncFormatter),
    45°-rotated category labels."""
    pad_l, pad_r, pad_t, pad_b = 64, 16, 40, 96
    plot_w, plot_h = width - pad_l - pad_r, height - pad_t - pad_b
    vals = [max(float(v), 0.0) for _, v in items]
    vmax = max(vals) if vals else 1.0
    floor = 1.0  # log scale needs a positive floor, like the notebook's
    top = max(vmax, floor * 10.0)

    def y_of(v):
        if log_scale:
            t = (0.0 if v <= floor
                 else (math.log(v) - math.log(floor))
                 / (math.log(top) - math.log(floor)))
        else:
            t = v / top
        return pad_t + plot_h * (1.0 - min(t, 1.0))

    n = max(len(items), 1)
    bw = plot_w / n
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="22" font-size="15" '
        f'text-anchor="middle">{title}</text>',
        f'<text x="16" y="{pad_t + plot_h / 2:.0f}" font-size="11" '
        f'text-anchor="middle" transform="rotate(-90 16 '
        f'{pad_t + plot_h / 2:.0f})">{ylabel}'
        f'{" (Log Scale)" if log_scale else ""}</text>',
        f'<line x1="{pad_l}" y1="{pad_t + plot_h}" x2="{width - pad_r}" '
        f'y2="{pad_t + plot_h}" stroke="black" stroke-width="1"/>',
    ]
    # y ticks: powers of 10 on log scale, 5 even ticks otherwise
    ticks = ([10.0 ** e for e in range(0, int(math.log10(top)) + 1)]
             if log_scale else [top * i / 4 for i in range(5)])
    for tv in ticks:
        y = y_of(tv)
        parts.append(
            f'<line x1="{pad_l - 4}" y1="{y:.1f}" x2="{pad_l}" '
            f'y2="{y:.1f}" stroke="black" stroke-width="1"/>'
        )
        parts.append(
            f'<text x="{pad_l - 8}" y="{y + 4:.1f}" font-size="10" '
            f'text-anchor="end">{tv:.0f}</text>'
        )
    for i, (label, v) in enumerate(items):
        # plt.cm.viridis(np.linspace(0.45, 0.9, n)) — the notebook ramp
        t = 0.45 + (0.45 * i / (n - 1) if n > 1 else 0.0)
        x = pad_l + i * bw + bw * 0.1
        y = y_of(max(float(v), 0.0))
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw * 0.8:.1f}" '
            f'height="{pad_t + plot_h - y:.1f}" fill="{viridis(t)}">'
            f'<title>{label}: {v:g}</title></rect>'
        )
        lx, ly = pad_l + (i + 0.5) * bw, pad_t + plot_h + 12
        parts.append(
            f'<text x="{lx:.1f}" y="{ly:.1f}" font-size="10" '
            f'text-anchor="end" transform="rotate(-45 {lx:.1f} '
            f'{ly:.1f})">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)
