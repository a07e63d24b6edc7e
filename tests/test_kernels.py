"""Kernel golden + property tests ported from the reference suite.

Sources:
  - slope/aspect goldens:
    /root/reference/Demeton.Tests/Shaders/Hillshading/Calculating aspect and slope.fs:17-111
  - igor shader properties:
    /root/reference/Demeton.Tests/Shaders/Hillshading/Igor's shading method.fs:21-116
  - downsampling semantics: /root/reference/Demeton/Srtm/Downsampling.fs:67-100
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demeton_spark import kernels
from demeton_spark.colors import MAPERITIVE_SCALE
from demeton_spark.geometry import (
    EARTH_RADIUS_M,
    deg_to_rad,
    difference_between_angles,
    geodetic_distance_approx,
    normalize_angle,
    rad_to_deg,
)
from demeton_spark.tiles import DEM_HEIGHT_NONE


def slope_aspect_for_3x3(heights_north_up):
    """Port of slopeAndAspectForHeights (Calculating aspect and slope.fs:17-43).

    ``heights_north_up`` is the 9-element row-major array with row 0 at the
    north; the reference flips it into DEM (south-up) order, places the
    cells 500 m apart at lon 16° lat 45°, and runs calculatePQ.
    """
    h = np.array(heights_north_up, dtype=np.float64).reshape(3, 3)
    dem = h[::-1, :]  # south-up
    lon = deg_to_rad(16.0)
    lat = deg_to_rad(45.0)
    dx = 500.0 / (math.cos(lat) * EARTH_RADIUS_M)
    # gridSize from coords exactly as the reference (Hillshading.fs:30-38)
    grid_w = geodetic_distance_approx(lon - dx, lat + dx, lon, lat + dx)
    grid_h = geodetic_distance_approx(lon - dx, lat + dx, lon - dx, lat)
    padded = np.full((5, 5), np.nan)
    padded[1:4, 1:4] = dem
    p, q = kernels.horn_pq(padded, np.full((3, 3), grid_w), np.full((3, 3), grid_h))
    slope, aspect = kernels.slope_and_aspect(p, q)
    return slope[1, 1], aspect[1, 1]


def test_north_facing_face():
    slope, aspect = slope_aspect_for_3x3([0, 0, 0, 500, 500, 500, 1000, 1000, 1000])
    assert aspect == pytest.approx(0.0, abs=1e-12)
    assert rad_to_deg(slope) == pytest.approx(35.26438968, abs=1e-6)


def test_east_facing_face():
    slope, aspect = slope_aspect_for_3x3([1000, 500, 0] * 3)
    assert aspect == pytest.approx(math.radians(90.0), abs=1e-12)
    assert rad_to_deg(slope) == pytest.approx(45.00317994, abs=1e-6)


def test_south_facing_face():
    slope, aspect = slope_aspect_for_3x3([1000, 1000, 1000, 500, 500, 500, 0, 0, 0])
    assert rad_to_deg(normalize_angle(aspect, 2 * math.pi)) == pytest.approx(180.0)
    assert rad_to_deg(slope) == pytest.approx(35.26438968, abs=1e-6)


def test_west_facing_face():
    slope, aspect = slope_aspect_for_3x3([0, 500, 1000] * 3)
    assert rad_to_deg(normalize_angle(aspect, 2 * math.pi)) == pytest.approx(270.0)
    assert rad_to_deg(slope) == pytest.approx(45.00317994, abs=1e-6)


def test_missing_neighbor_gives_nan_pq():
    padded = np.full((5, 5), 100.0)
    padded[0, 0] = np.nan
    p, q = kernels.horn_pq(padded, np.ones((3, 3)), np.ones((3, 3)))
    assert np.isnan(p[0, 0]) and np.isnan(q[0, 0])
    assert not np.isnan(p[2, 2])


# --- igor shader properties (Igor's shading method.fs:21-116) --------------

def _igor_alpha(slope, aspect, sun_az):
    out = kernels.shade_igor(
        np.array([[slope]]), np.array([[aspect]]), sun_azimuth_rad=sun_az
    )
    return int(out[0, 0, 3])


def test_igor_flat_face_has_zero_darkness():
    for aspect in [0.0, 1.0, 4.0]:
        assert _igor_alpha(0.0, aspect, math.radians(-45.0)) == 0


@settings(max_examples=200, deadline=None)
@given(
    sun_az=st.floats(0, 2 * math.pi),
    aspect1=st.floats(0, math.pi / 2),
    aspect2=st.floats(0, math.pi / 2),
)
def test_igor_aspect_closer_to_sun_is_not_darker(sun_az, aspect1, aspect2):
    slope45 = math.radians(45.0)
    d1 = _igor_alpha(slope45, aspect1, sun_az)
    d2 = _igor_alpha(slope45, aspect2, sun_az)
    diff1 = difference_between_angles(aspect1, sun_az, 2 * math.pi)
    diff2 = difference_between_angles(aspect2, sun_az, 2 * math.pi)
    if diff1 <= diff2:
        assert d1 <= d2
    else:
        assert d1 >= d2


@settings(max_examples=200, deadline=None)
@given(sun_az=st.floats(0, 2 * math.pi), aspect=st.floats(0, 2 * math.pi))
def test_igor_symmetric_aspects_equal_darkness(sun_az, aspect):
    slope45 = math.radians(45.0)
    diff = difference_between_angles(aspect, sun_az, 2 * math.pi)
    one = _igor_alpha(slope45, sun_az - diff, sun_az)
    other = _igor_alpha(slope45, sun_az + diff, sun_az)
    assert abs(one - other) <= 1


def test_igor_nan_aspect_is_transparent():
    out = kernels.shade_igor(np.array([[np.nan]]), np.array([[np.nan]]))
    assert tuple(out[0, 0]) == (0, 0, 0, 0)


# --- lambert sanity ---------------------------------------------------------

def test_lambert_flat_face_at_45_altitude():
    # flat face: luminance = sin(45°)·1 ≈ 0.707 → darkness ≈ 0.293
    out = kernels.shade_lambert(np.array([[0.0]]), np.array([[0.0]]))
    expected = int((1.0 - math.sin(math.radians(45.0))) * 255.0)
    assert abs(int(out[0, 0, 3]) - expected) <= 1


# --- downsampling (Downsampling.fs:67-100) ----------------------------------

def test_downsample_average_basic():
    block = np.array([[10, 20], [30, 40]], dtype=np.int16)
    out = kernels.downsample_average_2x2(block)
    assert out.shape == (1, 1)
    assert out[0, 0] == 25


def test_downsample_average_ignores_missing():
    block = np.array([[10, DEM_HEIGHT_NONE], [30, DEM_HEIGHT_NONE]], dtype=np.int16)
    out = kernels.downsample_average_2x2(block)
    assert out[0, 0] == 20


def test_downsample_average_all_missing():
    block = np.full((2, 2), DEM_HEIGHT_NONE, dtype=np.int16)
    out = kernels.downsample_average_2x2(block)
    assert out[0, 0] == DEM_HEIGHT_NONE


def test_downsample_half_to_even_rounding():
    # (1+2+3+3)/4 = 2.25 → 2 ; (1+2)/2 = 1.5 → round-half-even → 2
    block = np.array([[1, 2], [3, 3]], dtype=np.int16)
    assert kernels.downsample_average_2x2(block)[0, 0] == 2
    block2 = np.array([[1, 2], [DEM_HEIGHT_NONE, DEM_HEIGHT_NONE]], dtype=np.int16)
    assert kernels.downsample_average_2x2(block2)[0, 0] == 2
    block3 = np.array([[3, 2], [DEM_HEIGHT_NONE, DEM_HEIGHT_NONE]], dtype=np.int16)
    assert kernels.downsample_average_2x2(block3)[0, 0] == 2  # 2.5 → 2


# --- bilinear interpolation (Dem/Types.fs:21-33) ----------------------------

def test_bilinear_interpolate():
    grid = kernels.heights_to_float(
        np.array([[0, 100], [200, 300]], dtype=np.int16)
    )
    out = kernels.bilinear_interpolate(grid, np.array([0.5]), np.array([0.5]))
    assert out[0] == pytest.approx(150.0)


def test_bilinear_missing_corner_propagates():
    grid = kernels.heights_to_float(
        np.array([[0, DEM_HEIGHT_NONE], [200, 300]], dtype=np.int16)
    )
    out = kernels.bilinear_interpolate(grid, np.array([0.5]), np.array([0.5]))
    assert np.isnan(out[0])
    # integer coords on a valid cell still work
    out2 = kernels.bilinear_interpolate(grid, np.array([0.0]), np.array([0.0]))
    assert out2[0] == pytest.approx(0.0)


# --- compositing ------------------------------------------------------------

def test_composite_over_fast_paths():
    src = np.zeros((1, 3, 4), dtype=np.uint8)
    dst = np.zeros((1, 3, 4), dtype=np.uint8)
    src[0, 0] = [10, 20, 30, 0]  # transparent src → dest
    dst[0, 0] = [1, 2, 3, 200]
    src[0, 1] = [10, 20, 30, 255]  # opaque src → src
    dst[0, 1] = [1, 2, 3, 200]
    src[0, 2] = [10, 20, 30, 100]  # transparent dest → src
    dst[0, 2] = [0, 0, 0, 0]
    out = kernels.composite_over(src, dst)
    assert tuple(out[0, 0]) == (1, 2, 3, 200)
    assert tuple(out[0, 1]) == (10, 20, 30, 255)
    assert tuple(out[0, 2]) == (10, 20, 30, 100)


def test_composite_over_blend_against_scalar_reference():
    # scalar port of pixelOver (AlphaCompositing.fs:35-72)
    def scalar_over(s, d):
        sa, da = s[3] / 255.0, d[3] / 255.0
        sp = [v / 255.0 * sa for v in s[:3]]
        dp = [v / 255.0 * da for v in d[:3]]
        op = [a + b * (1 - sa) for a, b in zip(sp, dp)]
        oa = sa + da * (1 - sa)
        rgb = [
            min(max(int(np.round(v / oa * 255.0)), 0), 255) for v in op
        ]
        return (*rgb, min(max(int(np.round(oa * 255.0)), 0), 255))

    rng = np.random.default_rng(42)
    src = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    dst = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    # avoid fast-path alphas so the blend branch is exercised
    src[..., 3] = np.clip(src[..., 3], 1, 254)
    dst[..., 3] = np.clip(dst[..., 3], 1, 254)
    out = kernels.composite_over(src, dst)
    for y in range(4):
        for x in range(4):
            assert tuple(out[y, x]) == scalar_over(src[y, x], dst[y, x])


def test_composite_darken():
    src = np.array([[[9, 9, 9, 255]]], dtype=np.uint8)
    dst = np.array([[[7, 7, 7, 128]]], dtype=np.uint8)
    out = kernels.composite_darken(src, dst)
    assert tuple(out[0, 0]) == (0, 0, 0, 255)


# --- misc kernels ------------------------------------------------------------

def test_sum_cells_9():
    grid = np.arange(9, dtype=np.int16).reshape(3, 3)
    out = kernels.sum_cells_9(grid)
    # center: sum of all 9 (=36) + center again (4) = 40
    assert out[1, 1] == 40


def test_value_histogram():
    grid = np.array([[1, 1, 2], [3, 3, 3]], dtype=np.int16)
    assert kernels.value_histogram(grid) == {1: 2, 2: 1, 3: 3}


def test_resample_area_weighted_identity_and_downscale():
    grid = np.arange(16, dtype=np.int16).reshape(4, 4) * 100
    same = kernels.resample_area_weighted(grid, 4, 4)
    assert np.array_equal(same, grid)
    half = kernels.resample_area_weighted(grid, 2, 2)
    expected = kernels.downsample_average_2x2(grid)
    assert np.array_equal(half, expected)


def test_resample_majority_binary():
    mask = np.array([[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], dtype=np.int16)
    out = kernels.resample_majority_binary(mask, 2, 2)
    assert out[0, 0] == 1 and out[0, 1] == 0 and out[1, 0] == 0 and out[1, 1] == 0


def test_fused_igor_over_opaque_identical_to_unfused():
    """The evaluate_steps fused branch must be byte-identical to the
    unfused shade_igor + composite_over composition, including NaN
    aspect (transparent igor pixels leave the base untouched)."""
    import math

    from demeton_spark import pipeline as P

    rng = np.random.default_rng(7)
    h, w = 64, 64
    slope = rng.uniform(0, math.pi / 2, (h, w))
    aspect = rng.uniform(0, 2 * math.pi, (h, w))
    aspect[5:9, 5:9] = np.nan
    slope[5:9, 5:9] = np.nan
    heights = rng.uniform(0, 3000, (h, w))
    ctx = P.ShadeContext(heights=heights, slope=slope, aspect=aspect)

    for params in ({}, {"sunaz": "135"}, {"intensity": "0.7"}):
        steps = [P.Step("elecolor", {}), P.Step("igor", dict(params))]
        fused = P.evaluate_steps(steps, ctx)
        base = kernels.shade_elevation(heights, MAPERITIVE_SCALE)
        layer = kernels.shade_igor(
            slope, aspect,
            sun_azimuth_rad=math.radians(float(params.get("sunaz", -45.0))),
            intensity=float(params.get("intensity", 1.0)),
        )
        unfused = kernels.composite_over(layer, base)
        assert np.array_equal(fused, unfused), params

    # non-black shading color must NOT take the fused branch
    steps = [P.Step("elecolor", {}), P.Step("igor", {"shadcol": "#336699"})]
    fused = P.evaluate_steps(steps, ctx)
    layer = kernels.shade_igor(
        slope, aspect, shading_color=(0x33, 0x66, 0x99, 0)
    )
    base = kernels.shade_elevation(heights, MAPERITIVE_SCALE)
    assert np.array_equal(fused, kernels.composite_over(layer, base))


def test_igor_override_beats_fusion():
    """register_shader('igor', custom) must win even when the base layer
    is fully opaque and shadcol is black — the fused fast path only
    applies while 'igor' still maps to the built-in shader."""
    from demeton_spark import pipeline as P

    h, w = 8, 8
    heights = np.full((h, w), 1000.0)
    ctx = P.ShadeContext(
        heights=heights, slope=np.full((h, w), 0.3), aspect=np.zeros((h, w))
    )

    def custom_igor(c, params):
        out = np.zeros((h, w, 4), dtype=np.uint8)
        out[..., 1] = 123  # green — nothing the builtin would produce
        out[..., 3] = 255
        return out

    steps = [P.Step("elecolor", {}), P.Step("igor", {})]
    builtin = P.evaluate_steps(steps, ctx)
    assert not (builtin[..., 1] == 123).all()
    reg = dict(P.SHADER_REGISTRY)
    reg["igor"] = custom_igor
    overridden = P.evaluate_steps(steps, ctx, registry=reg)
    assert (overridden[..., 1] == 123).all() and (overridden[..., 3] == 255).all()
