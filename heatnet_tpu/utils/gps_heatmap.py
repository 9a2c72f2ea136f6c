"""GPS track heatmaps + UTM conversion, dependency-free.

Rebuilds the reference's GPS side of the capture stack without the
``utm``/``gmplot`` packages (neither installable here, and gmplot's output
needs Google-Maps network access anyway):

- UTM ↔ WGS84 lat/lon (``utm.from_latlon``/``to_latlon`` replacement, the
  classic Krüger series — bag_parser.py:306 converts odometry+origin to
  lat/lon on zone 32U)
- ``save_heat_stats`` — the ``"lat lon\\n"`` text format of
  bag_parser.py:562-565 (``saveHeatStats``)
- ``collect_heat_stats`` — recursive ``heat_stats_*`` harvest of
  plot_gm.py:17-36
- ``write_heatmap_html`` — the ``gmplot.heatmap(...).draw(...)``
  equivalent (plot_gm.py:38-41, bag_parser.py:551-555): a self-contained
  HTML file with a gaussian-splatted density raster over the track's
  bounding box (matplotlib Agg, embedded base64 PNG — no network tiles).
"""

from __future__ import annotations

import base64
import fnmatch
import io
import math
import os
from typing import Iterable, List, Sequence, Tuple

import numpy as np

# WGS84
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)              # first eccentricity squared
_EP2 = _E2 / (1 - _E2)           # second eccentricity squared
_K0 = 0.9996

_ZONE_LETTERS = "CDEFGHJKLMNPQRSTUVWXX"


def latlon_to_utm(lat: float, lon: float
                  ) -> Tuple[float, float, int, str]:
    """(easting, northing, zone_number, zone_letter) — utm.from_latlon."""
    if not -80.0 <= lat <= 84.0:
        raise ValueError("latitude out of UTM range")
    lat_r = math.radians(lat)
    zone = int((lon + 180) / 6) + 1
    # Norway/Svalbard exceptions (match the utm package)
    if 56 <= lat < 64 and 3 <= lon < 12:
        zone = 32
    if 72 <= lat <= 84 and lon >= 0:
        if lon < 9:
            zone = 31
        elif lon < 21:
            zone = 33
        elif lon < 33:
            zone = 35
        elif lon < 42:
            zone = 37
    letter = _ZONE_LETTERS[int((lat + 80) / 8)]

    lon0 = math.radians((zone - 1) * 6 - 180 + 3)
    n = _A / math.sqrt(1 - _E2 * math.sin(lat_r) ** 2)
    t = math.tan(lat_r) ** 2
    c = _EP2 * math.cos(lat_r) ** 2
    a = math.cos(lat_r) * (math.radians(lon) - lon0)

    m = _A * ((1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256) * lat_r
              - (3 * _E2 / 8 + 3 * _E2 ** 2 / 32
                 + 45 * _E2 ** 3 / 1024) * math.sin(2 * lat_r)
              + (15 * _E2 ** 2 / 256
                 + 45 * _E2 ** 3 / 1024) * math.sin(4 * lat_r)
              - (35 * _E2 ** 3 / 3072) * math.sin(6 * lat_r))

    easting = _K0 * n * (a + (1 - t + c) * a ** 3 / 6
                         + (5 - 18 * t + t ** 2 + 72 * c - 58 * _EP2)
                         * a ** 5 / 120) + 500000.0
    northing = _K0 * (m + n * math.tan(lat_r)
                      * (a ** 2 / 2
                         + (5 - t + 9 * c + 4 * c ** 2) * a ** 4 / 24
                         + (61 - 58 * t + t ** 2 + 600 * c - 330 * _EP2)
                         * a ** 6 / 720))
    if lat < 0:
        northing += 10000000.0
    return easting, northing, zone, letter


def utm_to_latlon(easting: float, northing: float, zone_number: int,
                  zone_letter: str = "U") -> Tuple[float, float]:
    """(lat, lon) — utm.to_latlon replacement (bag_parser.py:441)."""
    northern = zone_letter.upper() >= "N"
    x = easting - 500000.0
    y = northing if northern else northing - 10000000.0

    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256))
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    phi1 = (mu
            + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * math.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * math.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * math.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * math.sin(8 * mu))

    sin1, cos1, tan1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    c1 = _EP2 * cos1 ** 2
    t1 = tan1 ** 2
    n1 = _A / math.sqrt(1 - _E2 * sin1 ** 2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1 ** 2) ** 1.5
    d = x / (n1 * _K0)

    lat = phi1 - (n1 * tan1 / r1) * (
        d ** 2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * _EP2) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * _EP2
           - 3 * c1 ** 2) * d ** 6 / 720)
    lon = (d - (1 + 2 * t1 + c1) * d ** 3 / 6
           + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * _EP2
              + 24 * t1 ** 2) * d ** 5 / 120) / cos1
    lon0 = math.radians((zone_number - 1) * 6 - 180 + 3)
    return math.degrees(lat), math.degrees(lon) + math.degrees(lon0)


# ---------------------------------------------------------------------------
# heat_stats files (bag_parser.saveHeatStats / plot_gm.py harvest)
# ---------------------------------------------------------------------------


def save_heat_stats(lat: Sequence[float], lon: Sequence[float],
                    filename: str) -> None:
    """Append "lat lon" lines (bag_parser.py:562-565 format, space-sep)."""
    with open(filename, "a") as f:
        for la, lo in zip(lat, lon):
            f.write(f"{la} {lo}\n")


def collect_heat_stats(core_dir: str, pattern: str = "heat_stats_*"
                       ) -> Tuple[List[float], List[float]]:
    """Recursively read every heat_stats_* file (plot_gm.py:17-36)."""
    lats: List[float] = []
    lons: List[float] = []
    for root, _dirs, filenames in os.walk(core_dir):
        for filename in fnmatch.filter(filenames, pattern):
            with open(os.path.join(root, filename)) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    la, lo = line.split(" ")
                    lats.append(float(la))
                    lons.append(float(lo))
    return lats, lons


def _density_raster(lats: np.ndarray, lons: np.ndarray, bins: int = 256,
                    sigma_px: float = 4.0):
    """Gaussian-splatted 2D density over the padded bounding box."""
    pad_lat = max((lats.max() - lats.min()) * 0.1, 1e-4)
    pad_lon = max((lons.max() - lons.min()) * 0.1, 1e-4)
    extent = (lons.min() - pad_lon, lons.max() + pad_lon,
              lats.min() - pad_lat, lats.max() + pad_lat)
    hist, _, _ = np.histogram2d(
        lats, lons, bins=bins,
        range=[[extent[2], extent[3]], [extent[0], extent[1]]])
    # separable gaussian blur (no scipy needed)
    r = int(3 * sigma_px)
    k = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma_px) ** 2)
    k /= k.sum()
    blurred = np.apply_along_axis(
        lambda row: np.convolve(row, k, mode="same"), 1, hist)
    blurred = np.apply_along_axis(
        lambda col: np.convolve(col, k, mode="same"), 0, blurred)
    return blurred, extent


def write_heatmap_html(lats: Sequence[float], lons: Sequence[float],
                       out_path: str, title: str = "GPS heatmap") -> str:
    """Render a self-contained HTML heatmap of GPS points.

    The offline stand-in for ``gmplot.GoogleMapPlotter.heatmap + draw``:
    density raster + track scatter on lat/lon axes, embedded as a base64
    PNG so the HTML needs no tiles, JS, or network.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lats = np.asarray(list(lats), np.float64)
    lons = np.asarray(list(lons), np.float64)
    if lats.size == 0:
        raise ValueError("no GPS points to plot")

    density, extent = _density_raster(lats, lons)
    fig, ax = plt.subplots(figsize=(8, 8 * (extent[3] - extent[2])
                                    / max(extent[1] - extent[0], 1e-9)))
    ax.imshow(density, origin="lower", extent=extent, cmap="hot",
              aspect="auto")
    ax.plot(lons, lats, ".", ms=1.5, color="cyan", alpha=0.5)
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    ax.set_title(f"{title} ({lats.size} points)")
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    plt.close(fig)
    png_b64 = base64.b64encode(buf.getvalue()).decode("ascii")

    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body>"
        f"<h3>{title} — {lats.size} points</h3>"
        f"<img alt='heatmap' src='data:image/png;base64,{png_b64}'/>"
        "</body></html>")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path
