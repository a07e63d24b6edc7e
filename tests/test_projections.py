"""LCC projection vs the reference's control data
(/root/reference/Demeton.Tests/Projections/LCC tests.fs:77-116, sourced
from cs2cs), PROJ parsing, and DEM-level selection."""

import math

import numpy as np
import pytest

from demeton_spark.geometry import INCHES_PER_METER, MapScale, Mercator
from demeton_spark import projections as P

#: map scale with projection scaleFactor == 1 (LCC tests.fs:95-96)
SCALE1 = MapScale(map_scale=1.0, dpi=1.0 / INCHES_PER_METER)


# control data: +proj=lcc +ellps=WGS84 +lat_1=25 +lat_2=55
LCC_GOLDEN = [
    (0.0, 15.0, 25.0, 55.0, 0.0, 1872030.82778),
    (0.0, 45.0, 25.0, 55.0, 0.0, 5172085.53971),
    (10.0, 45.0, 25.0, 55.0, 762227.613999, 5215404.28979),
    (0.0, 60.0, 25.0, 55.0, 0.0, 6828656.81024),
]


@pytest.mark.parametrize("lon,lat,lat1,lat2,ex,ey", LCC_GOLDEN)
def test_lcc_forward_golden(lon, lat, lat1, lat2, ex, ey):
    proj = P.LambertConformalConic(
        P.LccParameters(lat1=lat1, lat2=lat2, ellipsoid=P.WGS84), SCALE1
    )
    x, y, valid = proj.project(math.radians(lon), math.radians(lat))
    assert valid
    assert abs(float(x) - ex) < 0.005
    assert abs(float(y) - ey) < 0.005


@pytest.mark.parametrize("lon,lat,lat1,lat2,ex,ey", LCC_GOLDEN)
def test_lcc_roundtrip(lon, lat, lat1, lat2, ex, ey):
    proj = P.LambertConformalConic(
        P.LccParameters(lat1=lat1, lat2=lat2, ellipsoid=P.WGS84), SCALE1
    )
    x, y, _ = proj.project(math.radians(lon), math.radians(lat))
    lon2, lat2_, valid = proj.invert(x, y)
    assert valid
    assert abs(math.degrees(float(lon2)) - lon) < 1e-6
    assert abs(math.degrees(float(lat2_)) - lat) < 1e-6


def test_lcc_vectorized_matches_scalar():
    proj = P.LambertConformalConic(
        P.LccParameters(lat1=25.0, lat2=55.0, ellipsoid=P.WGS84), SCALE1
    )
    lons = np.radians(np.array([0.0, 10.0, -20.0, 100.0]))
    lats = np.radians(np.array([15.0, 45.0, 30.0, -10.0]))
    xv, yv, _ = proj.project(lons, lats)
    for i in range(len(lons)):
        xs, ys, _ = proj.project(lons[i], lats[i])
        assert float(xs) == pytest.approx(float(xv[i]))
        assert float(ys) == pytest.approx(float(yv[i]))


def test_lcc_validation():
    with pytest.raises(ValueError):
        P.LccParameters(lat1=10.0, lat2=-10.0).validate()


def test_proj_parsing_defaults_and_params():
    name, params = P.parse_proj_spec("+proj=lcc")
    assert name == "lcc" and params == {}
    proj = P.create_projection(
        "+proj=lcc +lon_0=123 +lat_0=10.2 +lat_1=-11 +lat_2=0.1 "
        "+x_0=-123 +y_0=44 +k_0=78. +ellps=wgs84",
        SCALE1,
    )
    assert proj.params.lon0 == 123 and proj.params.k0 == 78.0
    assert proj.params.ellipsoid is P.WGS84

    with pytest.raises(ValueError, match="numeric"):
        P.create_projection("+proj=lcc +lat_0=something", SCALE1)
    merc = P.create_projection("+proj=merc", MapScale(1_000_000, 96))
    assert isinstance(merc, Mercator)


def test_min_lon_lat_delta_and_level():
    scale = MapScale(1_500_000, 96)
    merc = Mercator(scale)

    def invert(x, y):
        lon, lat = merc.invert(x, y)
        return lon, lat, np.ones(np.shape(lon), dtype=bool)

    # a raster around lat 46°N at 1:1.5M — the reference tutorial setup
    x0, y0, _ = merc.project(math.radians(13.6), math.radians(46.4))
    delta = P.min_lon_lat_delta(int(x0), int(y0), 650, 488, invert)
    assert delta > 0
    level = P.lon_lat_delta_to_dem_level(3600, delta)
    assert 0 <= level <= P.MAX_DEM_LEVEL
    # the minimum over the grid must be <= any sampled point's delta
    lon0, lat0, _ = invert(np.array([x0 + 10]), np.array([y0 + 10]))
    lon1, lat1, _ = invert(np.array([x0 + 11]), np.array([y0 + 11]))
    point_delta = min(abs(lon1[0] - lon0[0]), abs(lat1[0] - lat0[0]))
    assert delta <= point_delta + 1e-15


def test_level_boundaries():
    # delta exactly one cell → level 0; 2 cells → level 1; huge → capped
    cell = math.radians(1.0 / 3600)
    assert P.lon_lat_delta_to_dem_level(3600, cell) == 0
    assert P.lon_lat_delta_to_dem_level(3600, 2 * cell) == 1
    assert P.lon_lat_delta_to_dem_level(3600, 1000 * cell) == P.MAX_DEM_LEVEL


def test_phi2z_per_lane_batch_invariance():
    """phi2z converges PER LANE (Common.fs:178-199 is a scalar loop):
    a value's result must not depend on what else shares its batch —
    the property the recursive-CTE oracle twin of shade_raster_lcc
    relies on."""
    proj = P.LambertConformalConic(
        P.LccParameters(lat1=45.25, lat2=46.75, ellipsoid=P.GRS80), SCALE1
    )
    e = proj.e
    # ts values spanning fast- and slow-converging latitudes
    ts = np.array([0.9, 0.5, 0.1, 0.01, 0.999999])
    batched = P._phi2z(e, ts)
    solo = np.array([float(P._phi2z(e, np.array([t]))[0]) for t in ts])
    assert np.array_equal(batched, solo)  # bit-exact, not approx
