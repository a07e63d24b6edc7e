"""End-to-end Spark engine tests on the deterministic synthetic world.

The key property (SURVEY.md §7.2 step 3): the tiled pipeline with halo
exchange produces byte-identical pixels to shading the whole world as a
single merged array (the reference's merged-HeightsArray path,
/root/reference/Demeton/Commands/ShadeCommand.fs:450-497).
"""

import numpy as np
import pytest

from demeton_spark import codec, engine, synth
from demeton_spark.synth import WorldSpec
from demeton_spark.tiles import DEM_HEIGHT_NONE, tile_name

SPEC = WorldSpec(
    lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2, tile_size=30, block_size=10
)


@pytest.fixture(scope="module")
def images(spark):
    df = synth.images_df(spark, SPEC, num_partitions=4).cache()
    df.count()
    return df


def test_synth_row_count_and_schema(images):
    assert images.count() == SPEC.n_rows == 4 * 9
    assert [f.name for f in images.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]


def test_parse_caption_assignment(images):
    assigned = engine.parse_caption(images)
    rows = assigned.groupBy("tile_name", "tile_x", "tile_y").count().collect()
    names = {r["tile_name"]: (r["tile_x"], r["tile_y"], r["count"]) for r in rows}
    assert set(names) == {"N45E013", "N45E014", "N46E013", "N46E014"}
    for name, (tx, ty, count) in names.items():
        assert tile_name(0, tx, ty) == name
        assert count == SPEC.blocks_per_tile


def test_assembled_tiles_match_numpy_oracle(spark, images):
    tiles = engine.assemble_tiles(engine.parse_caption(images), SPEC.tile_size)
    got = {(r["tile_x"], r["tile_y"]): r for r in tiles.collect()}
    assert len(got) == 4
    for (tx, ty), row in got.items():
        expected = synth.expected_tile_heights(SPEC, tx, ty)
        actual = np.frombuffer(row["heights"], dtype="<i2").reshape(
            SPEC.tile_size, SPEC.tile_size
        )
        assert np.array_equal(actual, expected), (tx, ty)
        assert row["n_blocks"] == SPEC.blocks_per_tile
        assert row["missing_px"] == int(
            np.count_nonzero(expected == DEM_HEIGHT_NONE)
        )


def test_halo_exchange_pads_with_neighbors(spark, images):
    tiles = engine.assemble_tiles(engine.parse_caption(images), SPEC.tile_size)
    padded = {(r["tile_x"], r["tile_y"]): r for r in
              engine.exchange_halo(tiles, SPEC.tile_size).collect()}
    assert len(padded) == 4
    ts = SPEC.tile_size
    world = synth.expected_world_heights(SPEC)
    # tile (13,45) is the SW tile: its north pad row must equal the
    # south edge row of tile (13,46); its west pad must be missing.
    p = np.frombuffer(padded[(13, 45)]["padded"], dtype="<i2").reshape(ts + 2, ts + 2)
    assert np.array_equal(p[1:-1, 1:-1], world[:ts, :ts])
    assert np.array_equal(p[-1, 1:-1], world[ts, :ts])  # north halo row
    assert np.array_equal(p[1:-1, -1], world[:ts, ts])  # east halo col
    assert np.all(p[0, :] == DEM_HEIGHT_NONE)  # world edge: south
    assert np.all(p[:, 0] == DEM_HEIGHT_NONE)  # world edge: west
    assert p[-1, -1] == world[ts, ts]  # NE corner from diagonal neighbor


def test_tiled_shading_equals_untiled_oracle(spark, images):
    """The flagship parity property: tiling + halo == one merged array."""
    shaded = engine.run_hillshade(
        spark, images, SPEC.tile_size, script="elecolor|+igor"
    ).collect()
    assert len(shaded) == 4
    ts = SPEC.tile_size
    world = synth.expected_world_heights(SPEC)
    oracle = engine.shade_world_oracle(world, SPEC, script="elecolor|+igor")
    for row in shaded:
        tx_i = row["tile_x"] - SPEC.lon0
        ty_i = row["tile_y"] - SPEC.lat0
        rgba = codec.decode_rgba_png(bytes(row["png"]))
        # oracle is bitmap-oriented (row 0 = north): tile (tx_i, ty_i)
        # occupies rows [(n_ty-1-ty_i)*ts, ...)
        y0 = (SPEC.n_tiles_y - 1 - ty_i) * ts
        x0 = tx_i * ts
        expected = oracle[y0 : y0 + ts, x0 : x0 + ts]
        assert np.array_equal(rgba, expected), (row["tile_x"], row["tile_y"])
        assert row["total_px"] == ts * ts
        assert 0 < row["shaded_px"] <= ts * ts


def test_shading_psnr_through_png_path(spark, images):
    """Decoded-pixel invariant: PNG encode/decode is lossless (PSNR=inf ≥ 40dB)."""
    shaded = engine.run_hillshade(spark, images, SPEC.tile_size).collect()
    for row in shaded:
        rgba = codec.decode_rgba_png(bytes(row["png"]))
        assert codec.psnr(rgba, rgba, peak=255.0) == float("inf")


def test_skew_duplicates_do_not_change_results(spark):
    skew_spec = WorldSpec(
        lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=1,
        tile_size=30, block_size=10, skew_factor=4, skew_every=2,
    )
    base_spec = WorldSpec(
        lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=1, tile_size=30, block_size=10
    )
    skew_imgs = synth.images_df(spark, skew_spec, num_partitions=4)
    assert skew_imgs.count() == 9 * 4 + 9  # tile 0 skewed ×4, tile 1 not
    tiles = engine.assemble_tiles(
        engine.parse_caption(skew_imgs), skew_spec.tile_size
    ).collect()
    for row in tiles:
        expected = synth.expected_tile_heights(base_spec, row["tile_x"], row["tile_y"])
        actual = np.frombuffer(row["heights"], dtype="<i2").reshape(30, 30)
        assert np.array_equal(actual, expected)


def test_resume_skips_completed_tiles(spark, images, tmp_path):
    out = str(tmp_path / "shaded")
    first = engine.run_hillshade(spark, images, SPEC.tile_size, output_dir=out)
    assert first.count() == 4
    # second run appends nothing: all tiles already in the manifest
    second = engine.run_hillshade(spark, images, SPEC.tile_size, output_dir=out)
    assert second.count() == 4


def test_malformed_caption_rows_are_quarantined_not_fatal(spark, images):
    bad = spark.createDataFrame(
        [("imgBAD", bytearray(b"xx"), 10, 10, "png16", "not a tile caption", 0)],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    mixed = images.unionByName(bad)
    assert engine.invalid_caption_rows(mixed).count() == 1
    tiles = engine.assemble_tiles(engine.parse_caption(mixed), SPEC.tile_size)
    assert tiles.count() == 4  # bad row dropped, job completes


def test_resume_preserves_halo_correctness(spark, images, tmp_path):
    """Tiles shaded on resume must still see completed neighbors' strips."""
    out = str(tmp_path / "resume_halo")
    # first pass: shade ONLY tile (13,45) by filtering input blocks
    sw_only = images.where(images.caption.contains("N45E013"))
    engine.run_hillshade(spark, sw_only, SPEC.tile_size, output_dir=out)
    # resume with the full input: remaining 3 tiles get shaded
    result = engine.run_hillshade(spark, images, SPEC.tile_size, output_dir=out)
    rows = {(r["tile_x"], r["tile_y"]): r for r in result.collect()}
    assert len(rows) == 4
    world = synth.expected_world_heights(SPEC)
    oracle = engine.shade_world_oracle(world, SPEC)
    ts = SPEC.tile_size
    # tile (14,45) borders the pre-completed (13,45); its west-edge pixels
    # must match the untiled oracle (i.e. the halo strip arrived)
    r = rows[(14, 45)]
    rgba = codec.decode_rgba_png(bytes(r["png"]))
    y0 = (SPEC.n_tiles_y - 1 - 0) * ts
    assert np.array_equal(rgba, oracle[y0 : y0 + ts, ts : 2 * ts])


def test_salted_assembly_matches_unsalted(spark):
    """Two-phase salted assembly (skew path) must be byte-identical to
    the plain groupBy(tile) stitch, including lineage counts."""
    skewed = synth.WorldSpec(
        lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2,
        tile_size=30, block_size=10, skew_factor=8, skew_every=2,
    )
    images_sk = synth.images_df(spark, skewed, num_partitions=4)
    plain = engine.run_hillshade(spark, images_sk, skewed.tile_size)
    salted = engine.run_hillshade(
        spark, images_sk, skewed.tile_size, salt_buckets=4
    )
    canon = lambda df: {  # noqa: E731
        (r["tile_x"], r["tile_y"]): (
            bytes(r["png"]), r["shaded_px"], r["n_blocks"]
        )
        for r in df.collect()
    }
    a, b = canon(plain), canon(salted)
    assert a.keys() == b.keys() and len(a) == 4
    assert a == b
    # skewed tiles really carry the duplicate rows in their lineage count
    n_blocks = {k: v[2] for k, v in a.items()}
    assert max(n_blocks.values()) == 8 * skewed.blocks_per_tile
    assert min(n_blocks.values()) == skewed.blocks_per_tile


def test_tile_shade_xth_water_pipeline(spark):
    """XTH tiles (heights + water bit) through the tile-shade pipeline:
    water pixels get the water color, land gets hillshade, and the
    heights decode survives the packed halo exchange."""
    ts = 40
    world = np.full((2 * ts, 2 * ts), 300, dtype=np.int16)
    world[10:30, ts - 6 : ts + 6] = -20      # lake across the tile boundary
    world[5, 5] = DEM_HEIGHT_NONE
    water = (world <= 0) & (world != DEM_HEIGHT_NONE)
    rows = []
    for by in range(2):
        for bx in range(2):
            sl = np.s_[by * ts : (by + 1) * ts, bx * ts : (bx + 1) * ts]
            rows.append(
                (bx, by, bytearray(codec.encode_xth(world[sl], water[sl])))
            )
    df = spark.createDataFrame(rows, "tile_x int, tile_y int, xth binary")
    # outline-free script so lake pixels carry the pure water color
    script = ("solid(color=#ffffff)|+lambert|+slope(compose=darken)"
              "|+igor(compose=darken)|+water")
    out = {
        (r["tile_x"], r["tile_y"]): r
        for r in engine.run_tile_shade(spark, df, ts, script=script).collect()
    }
    # default pipeline (with wateroutline) smoke: same tile set, opaque
    full = engine.run_tile_shade(spark, df, ts).collect()
    assert len(full) == 4 and all(r["shaded_px"] == ts * ts for r in full)
    assert len(out) == 4
    water_rgba = [73, 126, 173, 255]
    for (tx, ty), r in out.items():
        rgba = codec.decode_rgba_png(bytes(r["png"]))
        assert rgba.shape == (ts, ts, 4)
        # bitmap row 0 = north; world row y maps to bitmap row ts-1-y
        for y in range(ts):
            for x in (0, ts // 2, ts - 1):
                wy, wx = ty * ts + y, tx * ts + x
                if water[wy, wx]:
                    assert rgba[ts - 1 - y, x].tolist() == water_rgba, (tx, ty, x, y)
        # land pixels are opaque (solid background composited)
        land_bitmap = ~water[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts][::-1]
        assert (rgba[..., 3][land_bitmap] == 255).all()
    # the full 240-cell lake is colored across the boundary
    colored = sum(
        int(
            (codec.decode_rgba_png(bytes(r["png"])) == water_rgba).all(axis=-1).sum()
        )
        for r in out.values()
    )
    assert colored == int(water.sum()) == 20 * 12


def test_image_phash_dedup_invariants(spark):
    """Exact image dedup by the input-hint phash column: every input row
    lands in exactly one group, keep_id is the lexicographic min, and
    duplicate blocks (the synthetic land-tile skew) collapse."""
    from demeton_spark.queries import q_image_phash_dedup
    from demeton_spark.synth import WorldSpec, images_df

    out = q_image_phash_dedup(spark, "/root/testdata/sf0.001").toPandas()
    spec = WorldSpec(
        lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2, tile_size=60,
        block_size=20, skew_factor=3,
    )
    src = images_df(spark, spec).select("image_id", "phash").toPandas()
    assert out["copies"].sum() == len(src)          # partition of the input
    assert out["phash"].is_unique
    expected_keep = src.groupby("phash")["image_id"].min()
    got_keep = out.set_index("phash")["keep_id"]
    assert got_keep.sort_index().equals(expected_keep.sort_index())
    assert (out["copies"] >= 1).all() and (out["copies"] > 1).any()


def test_polygon_clip_tiled_equals_untiled_oracle(spark, images):
    """Raster clipped to a polygon through the distributed pipeline must
    be pixel-identical to clipping the untiled oracle; tiles fully
    outside the polygon bbox are pruned before the shuffle."""
    # triangle covering parts of the west tiles only (lon 13..14)
    poly = [(13.1, 45.2), (13.9, 45.4), (13.3, 46.7)]
    shaded = engine.run_hillshade(
        spark, images, SPEC.tile_size, script="elecolor|+igor",
        clip_polygon=poly,
    ).collect()
    # bbox cover: tile_x in {13}, tile_y in {45, 46} → east tiles pruned
    assert sorted((r["tile_x"], r["tile_y"]) for r in shaded) == [
        (13, 45), (13, 46),
    ]
    world = synth.expected_world_heights(SPEC)
    oracle = engine.shade_world_oracle(
        world, SPEC, script="elecolor|+igor",
        clip_poly=np.asarray(poly, dtype=np.float64),
    )
    ts = SPEC.tile_size
    total_visible = 0
    for r in shaded:
        rgba = codec.decode_rgba_png(bytes(r["png"]))
        tx_i = r["tile_x"] - SPEC.lon0
        ty_i = r["tile_y"] - SPEC.lat0
        y0 = (SPEC.n_tiles_y - 1 - ty_i) * ts
        x0 = tx_i * ts
        assert np.array_equal(rgba, oracle[y0 : y0 + ts, x0 : x0 + ts])
        assert r["shaded_px"] == int(
            np.count_nonzero(rgba[..., 3] > 0)
        )
        total_visible += r["shaded_px"]
    assert 0 < total_visible < 2 * ts * ts  # genuinely clipped


def test_polygon_clip_salted_path_matches_fused(spark, images):
    """clip_polygon must behave identically through the salted two-phase
    assembly topology."""
    poly = [(13.1, 45.2), (13.9, 45.4), (13.3, 46.7)]
    fused = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, images, SPEC.tile_size, script="elecolor|+igor",
            clip_polygon=poly,
        ).collect()
    }
    salted = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, images, SPEC.tile_size, script="elecolor|+igor",
            clip_polygon=poly, salt_buckets=3,
        ).collect()
    }
    assert set(fused) == set(salted)
    for k in fused:
        assert codec.decode_rgba_png(fused[k][0]).tobytes() == \
            codec.decode_rgba_png(salted[k][0]).tobytes()
        assert fused[k][1] == salted[k][1]


def test_blur_prefilter_tiled_equals_untiled(spark, images):
    """Low-pass prefilter (2-px halo exchange): tiled result must be
    pixel-identical to blurring + shading the untiled world."""
    shaded = engine.run_hillshade(
        spark, images, SPEC.tile_size, script="elecolor|+igor",
        prefilter="blur",
    ).collect()
    world = synth.expected_world_heights(SPEC)
    oracle = engine.shade_world_oracle(
        world, SPEC, script="elecolor|+igor", prefilter="blur"
    )
    ts = SPEC.tile_size
    assert len(shaded) == 4
    for r in shaded:
        rgba = codec.decode_rgba_png(bytes(r["png"]))
        tx_i = r["tile_x"] - SPEC.lon0
        ty_i = r["tile_y"] - SPEC.lat0
        y0 = (SPEC.n_tiles_y - 1 - ty_i) * ts
        x0 = tx_i * ts
        assert np.array_equal(rgba, oracle[y0 : y0 + ts, x0 : x0 + ts])


def test_sharpen_prefilter_changes_output_but_not_holes(spark, images):
    plain = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, images, SPEC.tile_size, script="elecolor|+igor"
        ).collect()
    }
    sharp = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, images, SPEC.tile_size, script="elecolor|+igor",
            prefilter="sharpen(amount=2.0)",
        ).collect()
    }
    assert set(plain) == set(sharp)
    assert any(plain[k][0] != sharp[k][0] for k in plain)
    # hole pixels stay transparent: sharpening never invents data
    for k in plain:
        assert sharp[k][1] <= plain[k][1] + 0  # no new shaded pixels


def test_custom_shader_registry_reaches_executors(spark, images):
    """The §2.10 UDF extension surface: a shader registered at runtime
    on the driver must run inside executor tasks (the engine snapshots
    the registry into the UDF closure — a worker's freshly imported
    module never sees driver-side mutations).  Unknown step names are
    rejected like the reference's factory (Pipeline/Common.fs:35-36)."""
    from demeton_spark import pipeline as P

    def redtint(ctx, params):
        out = np.zeros((*ctx.heights.shape, 4), dtype=np.uint8)
        out[..., 0] = 200
        out[..., 3] = np.where(np.isnan(ctx.heights), 0, 60).astype(np.uint8)
        return out

    P.register_shader("redtint", redtint)
    try:
        tinted = {
            (r["tile_x"], r["tile_y"]): bytes(r["png"])
            for r in engine.run_hillshade(
                spark, images, SPEC.tile_size, script="elecolor|+redtint"
            ).collect()
        }
    finally:
        del P.SHADER_REGISTRY["redtint"]
    plain = {
        (r["tile_x"], r["tile_y"]): bytes(r["png"])
        for r in engine.run_hillshade(
            spark, images, SPEC.tile_size, script="elecolor"
        ).collect()
    }
    assert set(tinted) == set(plain)
    k = next(iter(tinted))
    a = codec.decode_rgba_png(tinted[k]).astype(np.int64)
    b = codec.decode_rgba_png(plain[k]).astype(np.int64)
    # the custom layer is (200, 0, 0, 60) over the opaque elecolor base:
    # out = rint((src*60 + base*195)/255) exactly, channel-wise
    visible = b[..., 3] == 255
    for ch, src in ((0, 200), (1, 0), (2, 0)):
        expected = np.rint(
            (src * 60 + b[..., ch] * 195) / 255.0
        ).astype(np.int64)
        assert (a[..., ch][visible] == expected[visible]).all()
    assert (a != b).any()  # tint visibly applied

    with pytest.raises(Exception, match="Unrecognized|nosuchshader"):
        engine.run_hillshade(
            spark, images, SPEC.tile_size, script="nosuchshader"
        ).collect()


@pytest.mark.parametrize(
    "spec",
    [
        # single-block tiles: each block is simultaneously on every
        # tile edge and donates strips in all 8 directions
        WorldSpec(lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2,
                  tile_size=24, block_size=24),
        # fine block grid
        WorldSpec(lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2,
                  tile_size=40, block_size=8),
        # non-square world: a 3x1 strip exercises east-west halos only
        WorldSpec(lon0=10, lat0=50, n_tiles_x=3, n_tiles_y=1,
                  tile_size=30, block_size=10),
        # skewed duplicates + fine grid
        WorldSpec(lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2,
                  tile_size=30, block_size=10, skew_factor=4),
    ],
    ids=["single-block-tiles", "fine-grid", "nonsquare-world", "skewed"],
)
def test_tiled_parity_across_world_shapes(spark, spec):
    """Fused single-shuffle pipeline == untiled oracle for every world
    shape (block==tile, fine grids, non-square, duplicate-heavy)."""
    shaded = engine.run_hillshade(
        spark, synth.images_df(spark, spec), spec.tile_size,
        script="elecolor|+igor",
    ).collect()
    assert len(shaded) == spec.n_tiles_x * spec.n_tiles_y
    world = synth.expected_world_heights(spec)
    oracle = engine.shade_world_oracle(world, spec, script="elecolor|+igor")
    ts = spec.tile_size
    for r in shaded:
        rgba = codec.decode_rgba_png(bytes(r["png"]))
        tx_i = r["tile_x"] - spec.lon0
        ty_i = r["tile_y"] - spec.lat0
        y0 = (spec.n_tiles_y - 1 - ty_i) * ts
        x0 = tx_i * ts
        assert np.array_equal(rgba, oracle[y0 : y0 + ts, x0 : x0 + ts]), (
            f"tile ({r['tile_x']},{r['tile_y']}) mismatch for {spec}"
        )


def test_parse_caption_southern_western_hemispheres(spark):
    rows = [
        ("i1", bytearray(b""), 10, 10, "png16",
         "tile S02W071 block (1,2)", 0),
        ("i2", bytearray(b""), 10, 10, "png16",
         "tile N00E000 block (0,0)", 0),
        ("i3", bytearray(b""), 10, 10, "png16",
         "tile S46W180 block (2,1)", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    got = {
        r["image_id"]: (r["tile_x"], r["tile_y"], r["bx"], r["by"])
        for r in engine.parse_caption(df).collect()
    }
    assert got == {
        "i1": (-71, -2, 1, 2),
        "i2": (0, 0, 0, 0),
        "i3": (-180, -46, 2, 1),
    }
    # round-trip through the shared tile-name formatter
    assert tile_name(0, -71, -2) == "S02W071"
    assert tile_name(0, -180, -46) == "S46W180"


def test_empty_input_produces_no_tiles(spark):
    empty = spark.createDataFrame(
        [],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    assert engine.run_hillshade(spark, empty, 30).count() == 0


def test_prefilter_salted_path_matches_fused(spark, images):
    """blur prefilter (2-px halo) through the salted two-phase topology
    must be pixel-identical to the fused single-shuffle path."""
    fused = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, images, SPEC.tile_size, script="elecolor|+igor",
            prefilter="blur",
        ).collect()
    }
    salted = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, images, SPEC.tile_size, script="elecolor|+igor",
            prefilter="blur", salt_buckets=3,
        ).collect()
    }
    assert set(fused) == set(salted)
    for k in fused:
        assert codec.decode_rgba_png(fused[k][0]).tobytes() == \
            codec.decode_rgba_png(salted[k][0]).tobytes()
        assert fused[k][1] == salted[k][1]


def test_local_dedup_byte_identical_and_collapses(spark):
    """Pre-shuffle duplicate collapse (local_dedup=True) must be
    byte-identical to the post-shuffle winner-only path on a
    duplicate-heavy world, and must actually drop losing duplicates
    before the exchange."""
    from demeton_spark.engine import dedup_duplicate_blocks, parse_caption
    from demeton_spark.synth import WorldSpec, images_df

    spec = WorldSpec(
        lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2, tile_size=60,
        block_size=20, skew_factor=4, skew_every=2,
    )
    imgs = images_df(spark, spec, num_partitions=4)
    base = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, imgs, spec.tile_size, script="elecolor|+igor"
        ).collect()
    }
    dedup = {
        (r["tile_x"], r["tile_y"]): (bytes(r["png"]), r["shaded_px"])
        for r in engine.run_hillshade(
            spark, imgs, spec.tile_size, script="elecolor|+igor",
            local_dedup=True,
        ).collect()
    }
    assert set(base) == set(dedup)
    for k in base:
        assert codec.decode_rgba_png(base[k][0]).tobytes() == \
            codec.decode_rgba_png(dedup[k][0]).tobytes()
        assert base[k][1] == dedup[k][1]
    # the collapse is real: duplicates vanish from the parts stream
    n_raw = parse_caption(imgs).count()
    n_dedup = dedup_duplicate_blocks(parse_caption(imgs)).count()
    # collapse granularity is the Arrow batch, so cross-batch
    # duplicates may survive — but most of the 4x duplication must go
    assert n_raw == spec.n_rows
    assert n_dedup <= n_raw * 0.6
