"""Zonal statistics (raster↔vector aggregate join) — tiled Spark result
vs the single-node numpy oracle, plus edge geometry cases."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from demeton_spark.synth import WorldSpec, expected_world_heights
from demeton_spark.zonal import (
    zonal_demo_polygons,
    zonal_stats,
    zonal_stats_numpy,
)

SPEC = WorldSpec(
    lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2, tile_size=60, block_size=20
)


def _tiles_df(spark, spec=SPEC):
    world = expected_world_heights(spec)
    ts = spec.tile_size
    rows = []
    for j in range(spec.n_tiles_y):
        for i in range(spec.n_tiles_x):
            block = world[j * ts : (j + 1) * ts, i * ts : (i + 1) * ts]
            rows.append(
                (spec.lon0 + i, spec.lat0 + j,
                 bytearray(np.ascontiguousarray(block).tobytes()))
            )
    return (
        spark.createDataFrame(rows, "tile_x int, tile_y int, heights binary"),
        world,
    )


def test_demo_polygons_match_numpy_oracle(spark):
    tiles, world = _tiles_df(spark)
    polys = zonal_demo_polygons()
    got = {
        r["poly_id"]: (r["n_px"], r["n_valid"], r["sum_h"], r["min_h"], r["max_h"])
        for r in zonal_stats(tiles, SPEC.tile_size, polys).collect()
    }
    want = zonal_stats_numpy(world, SPEC.lon0, SPEC.lat0, SPEC.tile_size, polys)
    assert got == want
    # every demo polygon is non-degenerate: contains valid pixels
    assert all(v[1] > 0 for v in got.values())


def test_polygon_straddles_tiles(spark):
    """A polygon centered on the 14°E/46°N corner covers all 4 tiles and
    still matches the untiled oracle (partials combine correctly)."""
    tiles, world = _tiles_df(spark)
    k, r = 8, 0.5
    verts = [
        (14.0 + r * math.cos(2 * math.pi * i / k + 0.3),
         46.0 + r * math.sin(2 * math.pi * i / k + 0.3))
        for i in range(k)
    ]
    polys = [(0, verts)]
    res = zonal_stats(tiles, SPEC.tile_size, polys).collect()[0]
    want = zonal_stats_numpy(
        world, SPEC.lon0, SPEC.lat0, SPEC.tile_size, polys
    )[0]
    assert (res["n_px"], res["n_valid"], res["sum_h"],
            res["min_h"], res["max_h"]) == want
    assert res["n_px"] > 0


def test_polygon_overhangs_world_edge(spark):
    """Only in-raster pixels count: a polygon half outside the world
    aggregates exactly the in-world intersection."""
    tiles, world = _tiles_df(spark)
    verts = [(14.7, 45.2), (15.6, 45.3), (15.4, 45.9), (14.8, 45.8)]
    polys = [(0, verts)]
    res = zonal_stats(tiles, SPEC.tile_size, polys).collect()[0]
    want = zonal_stats_numpy(
        world, SPEC.lon0, SPEC.lat0, SPEC.tile_size, polys
    )[0]
    assert (res["n_px"], res["n_valid"], res["sum_h"],
            res["min_h"], res["max_h"]) == want
    # sanity: the overhang clipped something (full MBR would be larger)
    assert 0 < res["n_px"] < 0.9 * (15.6 - 14.7) * (45.9 - 45.2) * 60 * 60


def test_disjoint_polygon_yields_zero_row(spark):
    tiles, _ = _tiles_df(spark)
    verts = [(20.0, 50.0), (21.0, 50.0), (20.5, 51.0)]
    res = zonal_stats(tiles, SPEC.tile_size, [(7, verts)]).collect()
    assert len(res) == 1
    r = res[0]
    assert (r["poly_id"], r["n_px"], r["n_valid"], r["sum_h"]) == (7, 0, 0, 0)
    assert r["min_h"] is None and r["max_h"] is None


def test_missing_pixels_excluded_from_min_max(spark):
    """A tile of all-missing heights under the polygon: n_px counts the
    cells, n_valid/sum are 0, min/max null."""
    ts = 16
    blob = bytearray(
        np.full((ts, ts), -32768, dtype=np.int16).tobytes()
    )
    tiles = spark.createDataFrame(
        [(0, 0, blob)], "tile_x int, tile_y int, heights binary"
    )
    verts = [(-0.1, -0.1), (1.1, -0.1), (1.1, 1.1), (-0.1, 1.1)]
    r = zonal_stats(tiles, ts, [(0, verts)]).collect()[0]
    assert r["n_px"] == ts * ts
    assert r["n_valid"] == 0 and r["sum_h"] == 0
    assert r["min_h"] is None and r["max_h"] is None


def test_broadcast_cover_join_in_plan(spark):
    """The polygon cover side is broadcast — the raster never shuffles
    before the partial pass."""
    tiles, _ = _tiles_df(spark)
    df = zonal_stats(tiles, SPEC.tile_size, zonal_demo_polygons())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
