"""Distributed bilinear point sampling (geo_point_elevation) vs the
single-node kernels.bilinear_interpolate oracle over the assembled
contract world."""

import math

import numpy as np

from demeton_spark.kernels import bilinear_interpolate
from demeton_spark.queries import _pelev_points, q_geo_point_elevation
from demeton_spark.synth import WorldSpec, expected_world_heights

SF_DIR = "/root/testdata/sf0.001"
SPEC = WorldSpec(
    lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2, tile_size=60, block_size=20
)


def test_matches_bilinear_kernel(spark):
    got = {
        r["event_id"]: (r["lon"], r["lat"], r["elev"])
        for r in q_geo_point_elevation(spark, SF_DIR).collect()
    }
    assert len(got) > 100

    world = expected_world_heights(SPEC).astype(np.float64)
    world[world == -32768] = np.nan
    ts = SPEC.tile_size

    lons = np.array([v[0] for v in got.values()])
    lats = np.array([v[1] for v in got.values()])
    elevs = np.array(
        [v[2] if v[2] is not None else np.nan for v in got.values()]
    )
    x = (lons - SPEC.lon0) * ts
    y = (lats - SPEC.lat0) * ts
    want = bilinear_interpolate(world, x, y)

    # convention difference only at exactly-integral lattice coords
    # (kernel uses ceil → dx=0 self-corner; the query uses floor+1):
    # exclude those knife-edge points, compare everything else
    frac_x = x - np.floor(x)
    frac_y = y - np.floor(y)
    generic = (frac_x > 0) & (frac_y > 0)
    assert generic.sum() > 100

    both = generic & ~np.isnan(want) & ~np.isnan(elevs)
    assert np.allclose(elevs[both], want[both], atol=1e-5)
    # null iff the kernel says NaN (missing corner / out of world)
    assert np.array_equal(np.isnan(elevs[generic]), np.isnan(want[generic]))


def test_holes_produce_nulls(spark):
    # sf0.01: 10k points — enough samples to land corners on hole cells
    rows = q_geo_point_elevation(spark, "/root/testdata/sf0.01").collect()
    n_null = sum(1 for r in rows if r["elev"] is None)
    # the synthetic world has hole blocks: some sampled points must land
    # on a missing corner, and most must not
    assert 0 < n_null < 0.2 * len(rows)


def test_points_cover_all_tiles(spark):
    pts = _pelev_points(spark, SF_DIR).collect()
    tiles = {(math.floor(p["lon"]), math.floor(p["lat"])) for p in pts}
    assert tiles == {(13, 45), (13, 46), (14, 45), (14, 46)}
