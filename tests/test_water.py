"""Water-body operators: labeling vs BFS oracle, stats, visibility rule,
outline rings, and the tiled == untiled cross-tile union property
(reference semantics: /root/reference/Demeton/WaterBodies/Coloring.fs,
Outlining.fs, Shaders/WaterBodies/WaterBodiesShaders.fs:29-35)."""

from collections import deque

import numpy as np
import pandas as pd
import pytest

from demeton_spark import water
from demeton_spark.tiles import DEM_HEIGHT_NONE


def bfs_labels(mask: np.ndarray) -> np.ndarray:
    """Simple 4-connected BFS oracle, labels in first-pixel order."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    nxt = 1
    for y in range(h):
        for x in range(w):
            if mask[y, x] and labels[y, x] == 0:
                q = deque([(y, x)])
                labels[y, x] = nxt
                while q:
                    cy, cx = q.popleft()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx_ = cy + dy, cx + dx
                        if (
                            0 <= ny < h and 0 <= nx_ < w
                            and mask[ny, nx_] and labels[ny, nx_] == 0
                        ):
                            labels[ny, nx_] = nxt
                            q.append((ny, nx_))
                nxt += 1
    return labels


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("density", [0.2, 0.5, 0.8])
def test_label_components_matches_bfs(seed, density):
    rng = np.random.default_rng(seed)
    mask = rng.random((37, 23)) < density
    got = water.label_components(mask)
    want = bfs_labels(mask)
    assert np.array_equal(got, want)


def test_label_components_spiral_and_u_shapes():
    # U shape: left arm seen first, right arm must union through the base
    mask = np.zeros((5, 5), dtype=bool)
    mask[0:4, 1] = True
    mask[0:4, 3] = True
    mask[3, 1:4] = True
    got = water.label_components(mask)
    assert got.max() == 1
    assert np.array_equal(got > 0, mask)


def test_component_stats_and_visibility():
    mask = np.zeros((60, 60), dtype=bool)
    mask[2:5, 2:5] = True          # label 1: area 9, bbox 9    → too small
    mask[10:50, 10:50] = True      # label 2: area 1600, ratio 1 → visible
    mask[55, 0:59] = True          # label 3: area 59, ratio 1   → too small
    labels = water.label_components(mask)
    stats = water.component_stats(labels)
    assert list(stats["label"]) == [1, 2, 3]
    assert list(stats["area"]) == [9, 1600, 59]
    row2 = stats[stats["label"] == 2].iloc[0]
    assert (row2["min_x"], row2["min_y"], row2["max_x"], row2["max_y"]) == (
        10, 10, 49, 49,
    )
    vis = water.visible_water_bodies(stats)
    assert list(vis["label"]) == [2]

    # sparse diagonal-ish body: large area but bbox/area ratio >= 10
    mask2 = np.zeros((300, 300), dtype=bool)
    for i in range(0, 300, 2):  # connected comb: area 1650, bbox 3000
        mask2[i, 0:10] = True
        if i + 1 < 300:
            mask2[i + 1, 0] = True
    labels2 = water.label_components(mask2)
    stats2 = water.component_stats(labels2)
    assert len(stats2) == 1
    area = int(stats2["area"].iloc[0])
    bbox = 300 * 10
    assert area >= 1250 and bbox / area < 10  # sanity: this one IS visible
    vis2 = water.visible_water_bodies(stats2)
    assert len(vis2) == 1


def test_outline_distance_rings():
    mask = np.zeros((9, 9), dtype=bool)
    mask[1:8, 1:8] = True
    dist = water.outline_distance(mask, max_dist=3)
    assert dist[1, 1] == 1 and dist[1, 4] == 1          # shore ring
    assert dist[2, 2] == 2 and dist[2, 4] == 2
    assert dist[3, 3] == 3 and dist[4, 3] == 3
    assert dist[4, 4] == 0                               # deeper than 3
    assert (dist[~mask] == 0).all()
    # water touching the array edge is shore (unknown beyond the block)
    mask_edge = np.ones((4, 4), dtype=bool)
    dist_edge = water.outline_distance(mask_edge, max_dist=3)
    assert (dist_edge[0, :] == 1).all() and (dist_edge[:, 0] == 1).all()
    assert dist_edge[1, 1] == 2


def test_water_mask_excludes_missing():
    heights = np.array([[-5, 5], [DEM_HEIGHT_NONE, 0]], dtype=np.int16)
    mask = water.water_mask_from_heights(heights, sea_level=0)
    assert mask.tolist() == [[True, False], [False, True]]


# ---------------------------------------------------------------------------
# Spark: cross-tile union property
# ---------------------------------------------------------------------------


def _world_with_lakes(ts: int, nx: int, ny: int) -> np.ndarray:
    """Terrain with lakes (h<=0) crafted to straddle tile boundaries."""
    h, w = ny * ts, nx * ts
    world = np.full((h, w), 100, dtype=np.int16)
    # lake A: crosses the vertical boundary between tiles
    world[5 : ts - 5, ts - 4 : ts + 6] = -10
    # lake B: crosses the horizontal boundary
    world[ts - 3 : ts + 4, 8:20] = -20
    # lake C: inside one tile
    world[2 * ts - 12 : 2 * ts - 2, 2 * ts - 12 : 2 * ts - 2] = -5
    # lake D: corner-only touch across tiles (diagonal — must NOT merge)
    world[ts - 2 : ts, ts + 20 : ts + 22] = -7
    world[ts : ts + 2, ts + 22 : ts + 24] = -7
    # a hole (missing) inside lake A must not count as water
    world[10, ts] = DEM_HEIGHT_NONE
    return world


def _tiles_df(spark, world: np.ndarray, ts: int, tx0: int = 0, ty0: int = 0):
    ny, nx = world.shape[0] // ts, world.shape[1] // ts
    rows = []
    for by in range(ny):
        for bx in range(nx):
            block = world[by * ts : (by + 1) * ts, bx * ts : (bx + 1) * ts]
            rows.append(
                (tx0 + bx, ty0 + by, bytearray(np.ascontiguousarray(block).tobytes()))
            )
    return spark.createDataFrame(rows, "tile_x int, tile_y int, heights binary")


def test_global_components_match_untiled(spark):
    ts = 40
    world = _world_with_lakes(ts, 3, 2)
    tiles = _tiles_df(spark, world, ts)

    got = water.global_water_components(tiles, ts).collect()
    got_set = {
        (r["area"], r["min_cx"], r["min_cy"], r["max_cx"], r["max_cy"])
        for r in got
    }

    labels = water.label_components(
        water.water_mask_from_heights(world, sea_level=0)
    )
    stats = water.component_stats(labels)
    want_set = {
        (int(r.area), int(r.min_x), int(r.min_y), int(r.max_x), int(r.max_y))
        for r in stats.itertuples()
    }
    assert got_set == want_set
    # lakes A, B, C + the diagonal-touch pair D (stays split: 4-connectivity)
    assert len(got) == len(want_set) == 5


def test_visible_components_dataframe(spark):
    ts = 64
    world = np.full((ts, ts), 100, dtype=np.int16)
    world[2:60, 2:60] = -1        # big visible lake (area 3364)
    df = water.global_water_components(_tiles_df(spark, world, ts), ts)
    vis = water.visible_components(df).collect()
    assert len(vis) == 1 and vis[0]["area"] == 58 * 58


def test_water_shader_steps():
    from demeton_spark import pipeline

    heights = np.array([[1.0, -2.0], [np.nan, -3.0]])
    ctx = pipeline.ShadeContext(
        heights=heights,
        slope=np.zeros((2, 2)),
        aspect=np.zeros((2, 2)),
    )
    steps = pipeline.parse_script("water(color=#112233)")
    img = pipeline.evaluate_steps(steps, ctx)
    assert img[0, 1].tolist() == [0x11, 0x22, 0x33, 255]
    assert img[0, 0, 3] == 0 and img[1, 0, 3] == 0  # land + missing transparent

    steps2 = pipeline.parse_script("solid(color=#ffffff)|+wateroutline")
    img2 = pipeline.evaluate_steps(steps2, ctx)
    assert img2.shape == (2, 2, 4)


def test_build_xth_tiles_end_to_end(spark):
    """WorldCover-style classes → majority-resampled water → XTH pack →
    decode round-trip, including the all-land left-join fallback — and
    the packed tiles feed run_tile_shade."""
    from demeton_spark import codec, engine
    from demeton_spark.kernels import resample_majority_binary

    ts, ws = 8, 16
    heights = np.arange(ts * ts, dtype=np.int16).reshape(ts, ts)
    classes = np.zeros((ws, ws), dtype=np.uint8)
    classes[0:8, 0:8] = 80          # water quarter (class 80)
    classes[0, 8] = 80              # minority pixel → no water after resample
    dem = spark.createDataFrame(
        [
            (0, 0, bytearray(heights.tobytes())),
            (1, 0, bytearray(heights.tobytes())),  # no water row → all land
        ],
        "tile_x int, tile_y int, heights binary",
    )
    wc = spark.createDataFrame(
        [(0, 0, bytearray(classes.tobytes()))],
        "tile_x int, tile_y int, classes binary",
    )
    out = {
        (r["tile_x"], r["tile_y"]): bytes(r["xth"])
        for r in water.build_xth_tiles(dem, wc, ts, ws).collect()
    }
    h0, w0 = codec.decode_xth(out[(0, 0)], ts)
    assert np.array_equal(h0, heights)
    want_mask = resample_majority_binary(
        (classes == 80).astype(np.int16), ts, ts
    ).astype(bool)
    assert np.array_equal(w0, want_mask)
    assert want_mask[:4, :4].all() and not want_mask[0, 4]
    h1, w1 = codec.decode_xth(out[(1, 0)], ts)
    assert np.array_equal(h1, heights) and not w1.any()

    # chain: the produced XTH tiles shade end-to-end with water coloring
    xdf = spark.createDataFrame(
        [(tx, ty, bytearray(b)) for (tx, ty), b in out.items()],
        "tile_x int, tile_y int, xth binary",
    )
    shaded = engine.run_tile_shade(
        spark, xdf, ts,
        script="solid(color=#ffffff)|+igor(compose=darken)|+water",
    ).collect()
    assert len(shaded) == 2
    for r in shaded:
        rgba = codec.decode_rgba_png(bytes(r["png"]))
        n_water_px = int(
            (rgba == np.array([73, 126, 173, 255])).all(axis=-1).sum()
        )
        want = int(want_mask.sum()) if r["tile_x"] == 0 else 0
        assert n_water_px == want
