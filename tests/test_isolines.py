"""Marching-squares isolines: endpoint-on-crossing-edge property, loop
closure for interior isolines, saddle handling, NaN suppression, and
the Spark per-tile operator."""

import numpy as np
import pytest

from demeton_spark import isolines
from demeton_spark.tiles import DEM_HEIGHT_NONE


def _endpoints_on_crossing_edges(heights, level, segs):
    """Every endpoint must sit on a grid edge whose corner values
    straddle the level."""
    h, w = heights.shape
    for x0, y0, x1, y1 in segs:
        for x, y in ((x0, y0), (x1, y1)):
            on_vert = abs(x - round(x)) < 1e-12
            on_horz = abs(y - round(y)) < 1e-12
            assert on_vert or on_horz, (x, y)
            if on_vert and not on_horz:
                xi, yi = int(round(x)), int(np.floor(y))
                a, b = heights[yi, xi], heights[yi + 1, xi]
            elif on_horz and not on_vert:
                xi, yi = int(np.floor(x)), int(round(y))
                a, b = heights[yi, xi], heights[yi, xi + 1]
            else:  # exactly on a corner: level == corner value
                xi, yi = int(round(x)), int(round(y))
                assert heights[yi, xi] == level
                continue
            assert (a >= level) != (b >= level) or a == level or b == level


def test_single_peak_closed_loop():
    y, x = np.mgrid[0:20, 0:20]
    heights = 100.0 - ((x - 10.0) ** 2 + (y - 10.0) ** 2)
    # off-grid level: exact corner hits are the degenerate case, tested
    # separately via the step/plateau cases
    segs = isolines.isoline_segments(heights, 50.5)
    assert len(segs) > 0
    _endpoints_on_crossing_edges(heights, 50.5, segs)
    # interior isoline: every endpoint appears exactly twice → one loop
    chains = isolines.chain_segments(segs)
    assert len(chains) == 1
    assert np.allclose(chains[0][0], chains[0][-1])


def test_plateau_cross_section():
    # vertical step: column x<5 low, x>=5 high → one straight isoline
    heights = np.zeros((6, 10))
    heights[:, 5:] = 10.0
    segs = isolines.isoline_segments(heights, 5.0)
    # crossing between x=4 and x=5 at t=0.5 for every row pair
    assert len(segs) == 5
    assert np.allclose(segs[:, 0], 4.5) and np.allclose(segs[:, 2], 4.5)
    chains = isolines.chain_segments(segs)
    assert len(chains) == 1 and len(chains[0]) == 6  # clipped chain


def test_saddle_emits_two_segments():
    heights = np.array([[1.0, 0.0], [0.0, 1.0]])
    segs = isolines.isoline_segments(heights, 0.5)
    assert len(segs) == 2
    heights2 = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert len(isolines.isoline_segments(heights2, 0.5)) == 2


def test_nan_suppresses_cells():
    heights = np.full((4, 4), 10.0)
    heights[1, 1] = np.nan
    heights[:, 2:] = 0.0
    segs = isolines.isoline_segments(heights, 5.0)
    # cells touching the NaN corner (x∈[0,2], y∈[0,2]) emit nothing:
    # only the top cell column crossing (1.5, y∈[2,3]) survives
    assert len(segs) == 1
    assert np.allclose(segs[0], [1.5, 2.0, 1.5, 3.0]) or np.allclose(
        segs[0], [1.5, 3.0, 1.5, 2.0]
    )


def test_all_below_or_above_empty():
    flat = np.full((5, 5), 1.0)
    assert len(isolines.isoline_segments(flat, 5.0)) == 0
    assert len(isolines.isoline_segments(flat, -5.0)) == 0


def test_tile_isolines_spark(spark):
    ts = 32
    y, x = np.mgrid[0:ts, 0:ts]
    cone = (500.0 - 10.0 * np.hypot(x - 16, y - 16)).astype(np.int16)
    flat = np.full((ts, ts), 100, dtype=np.int16)
    flat[5, 5] = DEM_HEIGHT_NONE
    df = spark.createDataFrame(
        [
            (0, 0, bytearray(cone.tobytes())),
            (1, 0, bytearray(flat.tobytes())),
        ],
        "tile_x int, tile_y int, heights binary",
    )
    got = {
        (r["tile_x"], r["level"]): r
        for r in isolines.tile_isolines(df, ts, [405.0, 1000.0]).collect()
    }
    cone_r = got[(0, 405.0)]
    want = isolines.isoline_segments(cone.astype(float), 405.0)
    assert cone_r["n_segments"] == len(want) > 0
    assert cone_r["n_closed"] == 1 and cone_r["n_clipped"] == 0
    assert got[(0, 1000.0)]["n_segments"] == 0  # above the peak
    assert got[(1, 405.0)]["n_segments"] == 0  # flat tile


def test_tile_posterize_partitions_pixels(spark):
    """Posterized classes partition every tile's pixels; per-class counts
    match a whole-world numpy oracle; class boundaries carry the
    marching-squares chains of their threshold."""
    from demeton_spark import synth
    from demeton_spark.isolines import posterize_classes, tile_posterize
    from demeton_spark.synth import WorldSpec
    from demeton_spark import kernels

    spec = WorldSpec(
        lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2, tile_size=30,
        block_size=10,
    )
    world = synth.expected_world_heights(spec)
    ts = spec.tile_size
    thresholds = [550.0, 650.0]
    rows = []
    for ty_i in range(spec.n_tiles_y):
        for tx_i in range(spec.n_tiles_x):
            tile = world[ty_i * ts : (ty_i + 1) * ts, tx_i * ts : (tx_i + 1) * ts]
            rows.append((spec.lon0 + tx_i, spec.lat0 + ty_i,
                         bytearray(tile.tobytes())))
    tiles = spark.createDataFrame(rows, "tile_x int, tile_y int, heights binary")
    got = tile_posterize(tiles, ts, thresholds).collect()

    # partition: per-tile n_px sums to ts*ts
    import collections
    per_tile = collections.Counter()
    for r in got:
        per_tile[(r["tile_x"], r["tile_y"])] += r["n_px"]
    assert all(v == ts * ts for v in per_tile.values())

    # class counts match the whole-world oracle
    oracle = posterize_classes(kernels.heights_to_float(world), thresholds)
    import numpy as np
    world_counts = collections.Counter()
    for r in got:
        world_counts[r["class_id"]] += r["n_px"]
    for cid in np.unique(oracle):
        assert world_counts[int(cid)] == int((oracle == cid).sum())
    # at least one non-trivial boundary vectorized
    assert any(r["n_boundary_chains"] > 0 and r["boundary_len"] > 0 for r in got)
    # class intervals are well-formed
    for r in got:
        if r["class_id"] >= 0:
            assert r["lo"] < r["hi"] or r["class_id"] in (0, len(thresholds))


def test_move_encoding_round_trip_closed():
    """Interior blob → one closed isoline; moves→points inverts encode
    (the reference's steps↔moves round-trip property,
    IsolineMoves.fs)."""
    from demeton_spark import isolines as iso

    mask = np.zeros((8, 8), dtype=bool)
    mask[2:6, 2:6] = True
    enc = iso.mask_isoline_moves(mask)
    assert len(enc) == 1 and enc[0]["kind"] == "closed"
    segs = iso.isoline_segments(mask.astype(np.float64), 0.5)
    chains = iso.chain_segments(segs)
    decoded = iso.decode_chain_moves(enc[0])
    assert np.allclose(decoded, chains[0])
    # closed loop: decoded path returns to its start
    assert np.allclose(decoded[0], decoded[-1])
    # RLE counts sum to the number of steps
    assert sum(c for _, c in enc[0]["moves"]) == len(chains[0]) - 1


def test_move_encoding_clipped_edges():
    """A band touching two array edges → clipped isolines with start/end
    ClippingEdge metadata."""
    from demeton_spark import isolines as iso

    mask = np.zeros((6, 9), dtype=bool)
    mask[0:3, :] = True  # southern band across the full width
    enc = iso.mask_isoline_moves(mask)
    clipped = [e for e in enc if e["kind"] == "clipped"]
    assert clipped, enc
    for e in clipped:
        sides = {e["start_edge"][0], e["end_edge"][0]}
        assert sides <= {"left", "right", "top", "bottom"}
        assert np.allclose(iso.decode_chain_moves(e),
                           iso.decode_chain_moves(e))
    # the band's contour runs straight west-east: one long RLE move
    longest = max(clipped, key=lambda e: sum(c for _, c in e["moves"]))
    dirs = [d for d, _ in longest["moves"]]
    assert len(dirs) <= 3 and ("E" in dirs or "W" in dirs)


def test_move_encoding_rle_and_diagonals():
    """A diagonal staircase mask produces alternating diagonal moves;
    round-trip stays exact."""
    from demeton_spark import isolines as iso

    mask = np.zeros((7, 7), dtype=bool)
    for i in range(6):
        mask[i, : i + 1] = True
    enc = iso.mask_isoline_moves(mask)
    segs = iso.isoline_segments(mask.astype(np.float64), 0.5)
    chains = iso.chain_segments(segs)
    assert len(enc) == len(chains)
    for e, ch in zip(enc, chains):
        assert np.allclose(iso.decode_chain_moves(e), ch)
        assert any(d in ("NE", "NW", "SE", "SW") for d, _ in e["moves"])
