"""Projected-raster rendering (the reference ``shade`` command path):
constant-world elecolor coverage, flat-terrain igor transparency,
raster-tiling invariance, and out-of-coverage transparency."""

import numpy as np
import pytest

from demeton_spark import codec, render
from demeton_spark.geometry import INCHES_PER_METER, MapScale
from demeton_spark.tiles import DEM_HEIGHT_NONE

TS = 60  # cells per degree in the test world
SCALE = MapScale(5_000_000, 96)
#: 2°×2° world at lon [13,15), lat [45,47)
BBOX_PTS = [(13.2, 45.2), (14.8, 45.2), (13.2, 46.8), (14.8, 46.8)]


def _dem_df(spark, height=1000, holes=False):
    rows = []
    for ty in (45, 46):
        for tx in (13, 14):
            tile = np.full((TS, TS), height, dtype=np.int16)
            if holes and tx == 13 and ty == 45:
                tile[10:20, 10:20] = DEM_HEIGHT_NONE
            rows.append((tx, ty, bytearray(tile.tobytes())))
    return spark.createDataFrame(
        rows, "tile_x int, tile_y int, heights binary"
    )


def _assemble(rows):
    """Stitch rendered raster tiles back into one RGBA image (global
    raster coords; returns (img, min_x, min_y))."""
    min_x = min(r["min_x"] for r in rows)
    min_y = min(r["min_y"] for r in rows)
    max_x = max(r["min_x"] + r["width"] for r in rows)
    max_y = max(r["min_y"] + r["height"] for r in rows)
    img = np.zeros((max_y - min_y, max_x - min_x, 4), dtype=np.uint8)
    for r in rows:
        rgba = codec.decode_rgba_png(bytes(r["png"]))[::-1]  # back to south-up
        y0, x0 = r["min_y"] - min_y, r["min_x"] - min_x
        img[y0 : y0 + r["height"], x0 : x0 + r["width"]] = rgba
    return img, min_x, min_y


def test_constant_world_elecolor_covers_and_igor_transparent(spark):
    dem = _dem_df(spark, height=1000)
    rows = render.render_shaded_raster(
        spark, dem, BBOX_PTS, SCALE, script="elecolor", tile_size=TS
    ).collect()
    assert rows
    img, _, _ = _assemble(rows)
    interior = img[2:-2, 2:-2]
    # "elevation colorer colors all pixels": constant 1000 m maps to one
    # color between the 700/1500 Maperitive marks, fully opaque
    assert (interior[..., 3] == 255).all()
    colors = np.unique(interior.reshape(-1, 4), axis=0)
    assert len(colors) == 1
    assert 189 <= colors[0][2] <= 196  # blue channel between the marks

    igor_rows = render.render_shaded_raster(
        spark, dem, BBOX_PTS, SCALE, script="igor", tile_size=TS
    ).collect()
    img2, _, _ = _assemble(igor_rows)
    # flat terrain → zero darkness → fully transparent hillshade
    assert (img2[2:-2, 2:-2, 3] == 0).all()


def test_raster_tiling_invariance(spark):
    """Rendering with one big raster tile == many small tiles, pixel for
    pixel (the distribution-correctness property: raster tiling is an
    implementation detail)."""
    rng = np.random.default_rng(11)
    rows = []
    for ty in (45, 46):
        for tx in (13, 14):
            tile = rng.integers(0, 3000, (TS, TS)).astype(np.int16)
            rows.append((tx, ty, bytearray(tile.tobytes())))
    dem = spark.createDataFrame(rows, "tile_x int, tile_y int, heights binary")

    big = render.render_shaded_raster(
        spark, dem, BBOX_PTS, SCALE, tile_size=TS, raster_tile_px=1000
    ).collect()
    small = render.render_shaded_raster(
        spark, dem, BBOX_PTS, SCALE, tile_size=TS, raster_tile_px=37
    ).collect()
    assert len(big) == 1 and len(small) > 4
    img_a, ax, ay = _assemble(big)
    img_b, bx, by = _assemble(small)
    assert (ax, ay) == (bx, by)
    assert np.array_equal(img_a, img_b)


def test_out_of_coverage_pixels_transparent(spark):
    """Coverage beyond the DEM world: missing tiles yield unshaded
    (transparent) pixels, shaded_px < total_px."""
    dem = _dem_df(spark, height=1000, holes=True)
    pts = [(12.5, 45.2), (14.8, 45.2), (12.5, 46.8), (14.8, 46.8)]
    rows = render.render_shaded_raster(
        spark, dem, pts, SCALE, script="elecolor", tile_size=TS,
        raster_tile_px=1000,
    ).collect()
    img, _, _ = _assemble(rows)
    total_shaded = sum(r["shaded_px"] for r in rows)
    total_px = sum(r["total_px"] for r in rows)
    assert 0 < total_shaded < total_px
    # western strip (lon < 13) has no DEM tile → transparent
    assert (img[:, :5, 3] == 0).all()
    # the hole block is transparent too (elecolor none-color)
    assert (img[..., 3] == 0).sum() == total_px - total_shaded


def test_render_with_lcc_projection(spark):
    """The render path is projection-generic: LCC centered on the test
    world produces the same constant-color coverage as Mercator."""
    from demeton_spark.projections import LambertConformalConic, LccParameters, WGS84

    dem = _dem_df(spark, height=1000)
    scale1 = MapScale(map_scale=1.0, dpi=1.0 / INCHES_PER_METER)

    class Scaled:
        """LCC at a render-friendly scale: wrap with a pixel scale."""

        def __init__(self):
            self.lcc = LambertConformalConic(
                LccParameters(lon0=14, lat0=46, lat1=45, lat2=47,
                              ellipsoid=WGS84),
                scale1,
            )
            self.k = 1 / 1500.0  # meters → pixels

        def project(self, lon, lat):
            x, y, v = self.lcc.project(lon, lat)
            return x * self.k, y * self.k, v

        def invert(self, x, y):
            lon, lat, v = self.lcc.invert(
                np.asarray(x) / self.k, np.asarray(y) / self.k
            )
            return lon, lat

    rows = render.render_shaded_raster(
        spark, dem, BBOX_PTS, SCALE, script="elecolor", tile_size=TS,
        projection=Scaled(),
    ).collect()
    assert rows
    img, _, _ = _assemble(rows)
    interior = img[3:-3, 3:-3]
    assert (interior[..., 3] == 255).all()
    assert len(np.unique(interior.reshape(-1, 4), axis=0)) == 1


def test_georef_sidecar_world_file(spark):
    """World-file affine recovers each tile's projected-meter placement:
    parsing the six lines back must reproduce meters_per_px and the
    top-left pixel-center origin."""
    from demeton_spark.geometry import EARTH_RADIUS_M
    from demeton_spark.render import georef_sidecars

    scale = SCALE
    rendered = render.render_shaded_raster(
        spark, _dem_df(spark), BBOX_PTS, scale,
        script="elecolor|+igor", tile_size=TS, raster_tile_px=80,
    )
    side = {
        (r["rt_x"], r["rt_y"]): r
        for r in georef_sidecars(rendered, scale).collect()
    }
    rows = {(r["rt_x"], r["rt_y"]): r for r in rendered.collect()}
    assert set(side) == set(rows)
    m_px = EARTH_RADIUS_M / scale.projection_scale_factor
    for k, s in side.items():
        lines = s["world_file"].strip().splitlines()
        assert len(lines) == 6
        a, d, b, e, c, f = (float(x) for x in lines)
        assert a == pytest.approx(m_px) and e == pytest.approx(-m_px)
        assert d == b == 0.0
        r = rows[k]
        assert c == pytest.approx((r["min_x"] + 0.5) * m_px)
        assert f == pytest.approx((r["min_y"] + r["height"] - 0.5) * m_px)
