"""Projected-raster rendering — the reference ``shade`` command's
pipeline as a Spark job: bbox + map scale → projected raster MBR →
raster tiles → per-tile inverse projection into the DEM tile mosaic →
shading → PNG tiles.

Reference lifecycle reproduced (SURVEY.md §3.1):
  - raster MBR from projected coverage points, rounded outward
    (/root/reference/Demeton/Commands/ShadeCommand.fs:336-353)
  - split into raster tiles (:371-400, default 1000 px)
  - per tile: invert corners + 1 px buffer → lon/lat bounds → covering
    DEM tiles (:457-471 + Dem/Funcs.fs:262-308) — this becomes the
    assignment JOIN: a small broadcast relation (raster tile × DEM tile
    key) against the big DEM tile table, grouped by raster tile
  - per pixel: inverse-project the 3×3 pixel neighborhood, bilinear
    heights (Dem/Types.fs:143-155), Horn p/q with per-pixel geodesic
    grid sizes (Shaders/Hillshading.fs:30-60,81-157), shade, Y-flip

Where the reference walks pixels in a Parallel.For, every raster tile
is one Spark task and all per-pixel math is vectorized numpy over row
bands (9 inverse projections per band; coords stay float64 — cell
indices reach 6.5e5 where float32 resolution would corrupt bilinear
fractions).

At scale: raster tiles are the parallelism unit (millions of tasks for
a world render); the assignment relation stays tiny (tens of DEM keys
per raster tile) and broadcasts, so the only wide operation is the
groupBy that co-locates each raster tile's covering DEM tiles.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec, kernels, pipeline
from .geometry import MapScale, Mercator
from .tiles import DEM_HEIGHT_NONE, bounds_to_tiles, cells_per_degree

RENDERED_SCHEMA = (
    "rt_x int, rt_y int, min_x long, min_y long, width int, height int, "
    "png binary, shaded_px long, total_px long, n_dem_tiles int"
)

RENDER_BAND_ROWS = 128


def raster_mbr(proj, coverage_points_deg) -> tuple[int, int, int, int]:
    """Projected MBR of coverage points, rounded outward
    (ShadeCommand.fs:336-353).  Returns (min_x, min_y, max_x, max_y)."""
    xs, ys = [], []
    for lon_deg, lat_deg in coverage_points_deg:
        x, y, valid = proj.project(
            math.radians(lon_deg), math.radians(lat_deg)
        )
        if np.all(valid):
            xs.append(float(x))
            ys.append(float(y))
    if not xs:
        raise ValueError("no projectable coverage points")
    return (
        int(math.floor(min(xs))),
        int(math.floor(min(ys))),
        int(math.ceil(max(xs))),
        int(math.ceil(max(ys))),
    )


def split_into_tiles(mbr, tile_px: int):
    """Raster MBR → [(xi, yi, min_x, min_y, w, h)] (ShadeCommand
    splitIntoIntervals semantics, :315-328)."""
    min_x, min_y, max_x, max_y = mbr
    tiles = []
    yi = 0
    y = min_y
    while y < max_y:
        h = min(tile_px, max_y - y)
        xi = 0
        x = min_x
        while x < max_x:
            w = min(tile_px, max_x - x)
            tiles.append((xi, yi, x, y, w, h))
            xi += 1
            x += w
        yi += 1
        y += h
    return tiles


def covering_dem_tiles(proj, rect, tile_size: int, buffer_px: int = 1):
    """Invert the raster rect corners (+buffer) → lon/lat bounds →
    covering level-0 DEM tile keys (ShadeCommand.fs:457-471)."""
    xi, yi, min_x, min_y, w, h = rect
    xs = np.array(
        [min_x - buffer_px, min_x - buffer_px,
         min_x + w + buffer_px, min_x + w + buffer_px], dtype=np.float64
    )
    ys = np.array(
        [min_y - buffer_px, min_y + h + buffer_px,
         min_y - buffer_px, min_y + h + buffer_px], dtype=np.float64
    )
    lon, lat = _invert(proj, xs, ys)
    lon_deg, lat_deg = np.degrees(lon), np.degrees(lat)
    return bounds_to_tiles(
        tile_size, 0,
        float(lon_deg.min()), float(lat_deg.min()),
        float(lon_deg.max()), float(lat_deg.max()),
    )


def _invert(proj, x, y):
    """Uniform (lon, lat) radians from a projection's invert (Mercator
    returns 2-tuple, LCC a 3-tuple with validity)."""
    out = proj.invert(x, y)
    return out[0], out[1]


def render_shaded_raster(
    spark: SparkSession,
    dem_tiles: DataFrame,
    coverage_points_deg,
    map_scale: MapScale,
    script: str = pipeline.DEFAULT_SCRIPT,
    tile_size: int = 3600,
    raster_tile_px: int = 1000,
    projection=None,
    png_level: int | None = None,
) -> DataFrame:
    """The ``shade`` command: DEM tile table + bbox + scale → projected
    shaded raster tiles.

    ``dem_tiles`` rows: (tile_x, tile_y, heights binary) at level 0 with
    ``tile_size`` cells per degree.  Returns one row per raster tile.
    """
    proj = projection or Mercator(map_scale)
    steps = pipeline.parse_script(script)
    registry = dict(pipeline.SHADER_REGISTRY)  # driver snapshot for executors
    lvl = codec.RGBA_PNG_LEVEL if png_level is None else png_level
    mbr = raster_mbr(proj, coverage_points_deg)
    raster_tiles = split_into_tiles(mbr, raster_tile_px)

    # assignment relation: raster tile × covering DEM tile key (driver-
    # side: |raster tiles| × ~4 rows — broadcast against the DEM table)
    assign_rows = []
    for rect in raster_tiles:
        for tx, ty in covering_dem_tiles(proj, rect, tile_size):
            assign_rows.append((*rect, tx, ty))
    assign = spark.createDataFrame(
        assign_rows,
        "rt_x int, rt_y int, min_x long, min_y long, w int, h int, "
        "tile_x int, tile_y int",
    )
    joined = F.broadcast(assign).join(
        dem_tiles, on=["tile_x", "tile_y"], how="inner"
    )

    cpd = cells_per_degree(tile_size, 0)

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        rect = (
            int(pdf["rt_x"].iloc[0]), int(pdf["rt_y"].iloc[0]),
            int(pdf["min_x"].iloc[0]), int(pdf["min_y"].iloc[0]),
            int(pdf["w"].iloc[0]), int(pdf["h"].iloc[0]),
        )
        _, _, min_x, min_y, w, h = rect
        # mosaic the group's DEM tiles into one array (J2 merge)
        txs = pdf["tile_x"].astype(int)
        tys = pdf["tile_y"].astype(int)
        cell_x0 = int(txs.min()) * tile_size
        cell_y0 = int(tys.min()) * tile_size
        merged = np.full(
            ((int(tys.max()) - int(tys.min()) + 1) * tile_size,
             (int(txs.max()) - int(txs.min()) + 1) * tile_size),
            DEM_HEIGHT_NONE, dtype=np.int16,
        )
        for tx, ty, buf in sorted(
            zip(txs, tys, pdf["heights"]), key=lambda r: (r[1], r[0])
        ):
            oy = (int(ty) * tile_size) - cell_y0
            ox = (int(tx) * tile_size) - cell_x0
            merged[oy : oy + tile_size, ox : ox + tile_size] = np.frombuffer(
                buf, dtype="<i2"
            ).reshape(tile_size, tile_size)
        merged_f = kernels.heights_to_float(merged)

        out = np.empty((h, w, 4), dtype=np.uint8)
        shaded = 0
        xs = np.arange(min_x, min_x + w, dtype=np.float64)
        for r0 in range(0, h, RENDER_BAND_ROWS):
            r1 = min(r0 + RENDER_BAND_ROWS, h)
            ys = np.arange(min_y + r0, min_y + r1, dtype=np.float64)
            gx, gy = np.meshgrid(xs, ys)
            # 3×3 neighborhood: inverse-project, bilinear heights
            hgt = {}
            coords = {}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    lon, lat = _invert(proj, gx + dx, gy + dy)
                    coords[(dx, dy)] = (lon, lat)
                    cell_x = np.degrees(lon) * cpd - cell_x0
                    cell_y = np.degrees(lat) * cpd - cell_y0
                    hgt[(dx, dy)] = kernels.bilinear_interpolate(
                        merged_f, cell_x, cell_y
                    )
            # per-pixel geodesic grid size (Hillshading.fs:30-38):
            # width = dist(NW, N), height = dist(NW, W); DEM row order has
            # y-1 = south — the reference's coords[0],[1],[3] map to
            # (x-1,y-1), (x,y-1), (x-1,y)
            lon0, lat0 = coords[(-1, -1)]
            lon1, lat1 = coords[(0, -1)]
            lon3, lat3 = coords[(-1, 0)]
            from .geometry import geodetic_distance_approx

            grid_w = geodetic_distance_approx(lon0, lat0, lon1, lat1)
            grid_h = geodetic_distance_approx(lon0, lat0, lon3, lat3)
            # Horn p/q exactly as calculatePQ (Hillshading.fs:40-60)
            p = (
                (hgt[(1, 1)] + 2.0 * hgt[(1, 0)] + hgt[(1, -1)])
                - (hgt[(-1, 1)] + 2.0 * hgt[(-1, 0)] + hgt[(-1, -1)])
            ) / (8.0 * grid_w)
            q = (
                (hgt[(1, 1)] + 2.0 * hgt[(0, 1)] + hgt[(-1, 1)])
                - (hgt[(1, -1)] + 2.0 * hgt[(0, -1)] + hgt[(-1, -1)])
            ) / (8.0 * grid_h)
            slope, aspect = kernels.slope_and_aspect(p, q)
            ctx = pipeline.ShadeContext(
                heights=hgt[(0, 0)], slope=slope, aspect=aspect
            )
            rgba = pipeline.evaluate_steps(steps, ctx, registry=registry)
            shaded += int(np.count_nonzero(rgba[..., 3] > 0))
            out[r0:r1] = rgba
        return pd.DataFrame(
            {
                "rt_x": [rect[0]],
                "rt_y": [rect[1]],
                "min_x": [min_x],
                "min_y": [min_y],
                "width": [w],
                "height": [h],
                "png": [codec.encode_rgba_png(out[::-1, :, :], lvl)],
                "shaded_px": [shaded],
                "total_px": [w * h],
                "n_dem_tiles": [len(pdf)],
            }
        )

    return joined.groupBy("rt_x", "rt_y", "min_x", "min_y", "w", "h").applyInPandas(
        render, schema=RENDERED_SCHEMA
    )


def georef_sidecars(rendered: DataFrame, scale: MapScale) -> DataFrame:
    """World-file georeferencing sidecar per rendered raster tile.

    The reference roadmap's "Georeferencing metadata" item
    (/root/reference/docs/Roadmap.md): each PNG tile gets the six-line
    ESRI world-file affine (meters in the projection plane, y up):

        A (m/px east), D (0), B (0), E (−m/px north),
        C (x of top-left pixel CENTER), F (y of top-left pixel center)

    Projected pixel coords are ``x_px = x_unit · projection_scale_factor``
    on the unit sphere, so ground meters per pixel =
    ``EARTH_RADIUS / projection_scale_factor`` = map_scale/(inches/m ·
    dpi).  Pure column expressions — no Python in the plan.
    """
    from .geometry import EARTH_RADIUS_M

    m_per_px = EARTH_RADIUS_M / scale.projection_scale_factor
    c = (F.col("min_x") + F.lit(0.5)) * m_per_px
    f = (F.col("min_y") + F.col("height") - F.lit(0.5)) * m_per_px
    nl = F.lit("\n")
    world_file = F.concat(
        F.lit(f"{m_per_px!r}"), nl, F.lit("0.0"), nl, F.lit("0.0"), nl,
        F.lit(f"{-m_per_px!r}"), nl,
        c.cast("string"), nl, f.cast("string"), nl,
    )
    return rendered.select(
        "rt_x", "rt_y", world_file.alias("world_file"),
        F.lit(m_per_px).alias("meters_per_px"),
        c.alias("origin_x_m"), f.alias("origin_y_m"),
    )
