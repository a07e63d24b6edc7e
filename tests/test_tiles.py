"""Tile-math golden tests ported from the reference test suite.

Sources:
  - name↔id round-trips + global cell coords:
    /root/reference/Demeton.Tests/Dem/DEM tile tests.fs:15-95
  - bbox→tiles cases:
    /root/reference/Demeton.Tests/Srtm/Bounds to SRTM tiles.fs:11-141
"""

import math

import pytest

from demeton_spark import tiles


# --- tile names (DEM tile tests.fs:15-43) ---------------------------------

@pytest.mark.parametrize(
    "level,tx,ty,name",
    [
        (0, 10, 0, "N00E010"),
        (0, 10, -1, "S01E010"),
        (0, -1, 10, "N10W001"),
        (0, 80, -22, "S22E080"),
        (1, 6, 24, "l1e06n24"),
        (2, -3, -12, "l2w03s12"),
    ],
)
def test_tile_name_round_trip(level, tx, ty, name):
    assert tiles.tile_name(level, tx, ty) == name
    assert tiles.parse_tile_name(name) == (level, tx, ty)


def test_tile_key_round_trip():
    for level, tx, ty in [(0, 0, 0), (0, -180, -90), (6, 179, 89), (3, -1, 1)]:
        key = tiles.tile_key(level, tx, ty)
        assert tiles.tile_key_decode(key) == (level, tx, ty)


# --- global cell coords (DEM tile tests.fs:51-66) --------------------------

@pytest.mark.parametrize(
    "name,tile_size,expected",
    [
        ("N90W179", 1, (-179, 90)),
        ("N00W179", 3600, (-644400, 0)),
        ("S22E080", 3600, (288000, -79200)),
    ],
)
def test_tile_min_cell(name, tile_size, expected):
    level, tx, ty = tiles.parse_tile_name(name)
    assert tiles.tile_min_cell(tile_size, tx, ty) == expected


def test_fractional_cell_coords():
    # DEM tile tests.fs:68-94: (lon 46.557611, lat 15.6455, ts 3600)
    cpd = tiles.cells_per_degree(3600, 0)
    cx = tiles.longitude_to_cell_x(cpd, 46.557611)
    cy = tiles.latitude_to_cell_y(cpd, 15.6455)
    assert cx == pytest.approx(167607.3996, abs=1e-4)
    assert cy == pytest.approx(56323.8, abs=1e-4)


# --- bbox covers (Bounds to SRTM tiles.fs:11-141) ---------------------------

def test_bounds_to_tiles_single_tile():
    cover = tiles.bounds_to_tiles(3600, 0, 16.1, 46.1, 16.9, 46.9)
    assert cover == [(16, 46)]


def test_bounds_to_tiles_multiple():
    cover = tiles.bounds_to_tiles(3600, 0, 15.5, 45.5, 17.5, 46.5)
    assert cover == [(15, 45), (16, 45), (17, 45), (15, 46), (16, 46), (17, 46)]


def test_bounds_to_tiles_exact_alignment_does_not_overcover():
    # the ceil-1 rule (Dem/Funcs.fs:284-298)
    cover = tiles.bounds_to_tiles(3600, 0, 16.0, 46.0, 17.0, 47.0)
    assert cover == [(16, 46)]


def test_bounds_to_tiles_negative_coords():
    cover = tiles.bounds_to_tiles(3600, 0, -0.5, -0.5, 0.5, 0.5)
    assert cover == [(-1, -1), (0, -1), (-1, 0), (0, 0)]


def test_bounds_to_tiles_higher_level():
    # at level 1 a tile covers 2 degrees
    cover = tiles.bounds_to_tiles(3600, 1, 12.0, 46.0, 16.0, 48.0)
    assert cover == [(6, 23), (7, 23)]


def test_tile_lon_lat_bounds_inverse():
    for name in ["N46E013", "S22E080", "N10W001"]:
        level, tx, ty = tiles.parse_tile_name(name)
        min_lon, min_lat, max_lon, max_lat = tiles.tile_lon_lat_bounds(
            3600, level, tx, ty
        )
        assert max_lon - min_lon == pytest.approx(1.0)
        assert max_lat - min_lat == pytest.approx(1.0)
        # the cover of a tile's own bounds is exactly that tile
        assert tiles.bounds_to_tiles(3600, level, min_lon, min_lat, max_lon, max_lat) == [
            (tx, ty)
        ]


def test_tile_of_lon_lat():
    assert tiles.tile_of_lon_lat(3600, 0, 13.5, 46.2) == (13, 46)
    assert tiles.tile_of_lon_lat(3600, 0, -0.1, -0.1) == (-1, -1)
    assert tiles.tile_of_lon_lat(3600, 1, 13.5, 46.2) == (6, 23)


def test_pyramid_parent_children():
    t = tiles.TileId(1, 6, 24)
    kids = t.children()
    assert [(k.level, k.tile_x, k.tile_y) for k in kids] == [
        (0, 12, 48),
        (0, 13, 48),
        (0, 12, 49),
        (0, 13, 49),
    ]
    for k in kids:
        assert (k.parent().tile_x, k.parent().tile_y) == (6, 24)


def test_cells_per_degree_levels():
    assert tiles.cells_per_degree(3600, 0) == 3600.0
    assert tiles.cells_per_degree(3600, 3) == 450.0
    assert tiles.cells_per_degree(3600, 6) == 56.25
