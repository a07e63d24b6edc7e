"""Angle math, geodesy, map projections, point-in-polygon — all vectorized.

Reference semantics:
  - normalize/diff of angles: /root/reference/Demeton/Geometry/Common.fs:90-118
  - mean of circular values:  /root/reference/Demeton/Geometry/Common.fs:139-156
  - haversine approx:         /root/reference/Demeton/Projections/Common.fs:98-107
  - Mercator projection:      /root/reference/Demeton/Projections/Mercator.fs
  - map scale factor:         /root/reference/Demeton/Projections/Common.fs:50-62
  - point-in-polygon:         crossing-number equivalent of the orientation
                              machinery in Demeton/Geometry/Funcs.fs:9-33

All functions accept scalars or numpy arrays (no per-row Python in the
Spark hot path — these run inside Arrow-batched pandas UDFs).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

EARTH_RADIUS_M = 6_371_000.0  # Projections/Common.fs:10
INCHES_PER_METER = 39.3701  # Projections/Common.fs:16

#: Mercator latitude clamp in radians (Mercator.fs:8-12).
MERCATOR_MAX_LAT = 1.48442222974533


def deg_to_rad(deg):
    return np.multiply(deg, math.pi / 180.0)


def rad_to_deg(rad):
    return np.multiply(rad, 180.0 / math.pi)


def normalize_angle(angle, normalizer):
    """Normalize into [0, normalizer) (Geometry/Common.fs:90-99).

    Uses C-style remainder (sign of dividend) then corrects negatives,
    exactly like the F# ``%``.
    """
    rem = np.fmod(angle, normalizer)
    return np.where(rem < 0.0, rem + normalizer, rem)


def difference_between_angles(angle1, angle2, normalizer):
    """Absolute circular difference (Geometry/Common.fs:104-118)."""
    diff = np.abs(normalize_angle(angle1, normalizer) - normalize_angle(angle2, normalizer))
    return np.where(diff > normalizer / 2.0, normalizer - diff, diff)


def mean_of_angles(angles: np.ndarray, tolerance: float = 1e-10) -> float:
    """Circular mean (Geometry/Common.fs:139-156); NaN when undefined."""
    angles = np.asarray(angles, dtype=np.float64)
    if angles.size == 0:
        return float("nan")
    total_x = float(np.sum(np.cos(angles)))
    total_y = float(np.sum(np.sin(angles)))
    if abs(total_x) < tolerance and abs(total_y) < tolerance:
        return float("nan")
    mean = math.atan2(total_y, total_x)
    return 0.0 if abs(mean) < tolerance else mean


def geodetic_distance_approx(lon1, lat1, lon2, lat2):
    """Approximate geodesic distance in meters; args in **radians**.

    Vectorized haversine identical to Projections/Common.fs:98-107.
    """
    dlat2 = (np.asarray(lat2) - lat1) / 2.0
    dlon2 = (np.asarray(lon2) - lon1) / 2.0
    a = (
        np.sin(dlat2) * np.sin(dlat2)
        + np.cos(lat1) * np.cos(lat2) * np.sin(dlon2) * np.sin(dlon2)
    )
    c = 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
    return EARTH_RADIUS_M * c


# ---------------------------------------------------------------------------
# map projections (forward/inverse closures over numpy arrays)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MapScale:
    """Map scale → projection scale factor (Projections/Common.fs:50-62)."""

    map_scale: float
    dpi: float

    @property
    def projection_scale_factor(self) -> float:
        return EARTH_RADIUS_M / self.map_scale * INCHES_PER_METER * self.dpi

    @classmethod
    def scale_of_1(cls) -> "MapScale":
        return cls(map_scale=1.0, dpi=1.0 / (EARTH_RADIUS_M * INCHES_PER_METER))


class Mercator:
    """Web-Mercator-style projection on the sphere (Mercator.fs:18-45).

    ``project`` returns (x, y, valid_mask); latitudes outside the clamp
    are invalid (reference returns None → pixels left untouched).
    All angles in radians; vectorized.
    """

    def __init__(self, map_scale: MapScale):
        self.scale_factor = map_scale.projection_scale_factor

    def project(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        valid = (lat >= -MERCATOR_MAX_LAT) & (lat <= MERCATOR_MAX_LAT)
        x = lon * self.scale_factor
        with np.errstate(invalid="ignore", divide="ignore"):
            y = np.log(np.tan(math.pi / 4.0 + lat / 2.0)) * self.scale_factor
        return x, np.where(valid, y, np.nan), valid

    def invert(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lon = x / self.scale_factor
        lat = 2.0 * np.arctan(np.exp(y / self.scale_factor)) - math.pi / 2.0
        return lon, lat


# ---------------------------------------------------------------------------
# point-in-polygon (vectorized crossing number, reproduces the reference's
# orientation-test semantics for simple polygons)
# ---------------------------------------------------------------------------

def points_in_polygon(
    px: np.ndarray, py: np.ndarray, poly_x: np.ndarray, poly_y: np.ndarray
) -> np.ndarray:
    """Boolean mask: which points fall inside the polygon.

    Crossing-number (even-odd) rule, vectorized over points; edges on the
    boundary count per the half-open rule, which matches how the reference
    clips rasters to geo bounds (Demeton/Geometry/Funcs.fs:9-33 orientation
    tests feed the same decision for simple polygons).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly_x = np.asarray(poly_x, dtype=np.float64)
    poly_y = np.asarray(poly_y, dtype=np.float64)
    n = len(poly_x)
    inside = np.zeros(px.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        xi, yi = poly_x[i], poly_y[i]
        xj, yj = poly_x[j], poly_y[j]
        crosses = (yi > py) != (yj > py)
        with np.errstate(invalid="ignore", divide="ignore"):
            x_at = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= crosses & (px < x_at)
        j = i
    return inside


def bounds_contains(min_lon, min_lat, max_lon, max_lat, lon, lat):
    """Inclusive bbox containment (Geometry/Bounds.fs:25-26)."""
    return (lon >= min_lon) & (lon <= max_lon) & (lat >= min_lat) & (lat <= max_lat)
