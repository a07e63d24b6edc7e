"""GeoJSON vector sink: feature export agrees with the oracle-checked
isoline stats, round-trips through the text sink, and parses as valid
RFC 7946 features."""

import json

import numpy as np
import pyspark.sql.functions as F

from demeton_spark.isolines import tile_isolines
from demeton_spark.synth import WorldSpec, expected_world_heights
from demeton_spark.vector_sink import (
    read_geojson_lines,
    tile_isolines_features,
    write_geojson_lines,
)

SPEC = WorldSpec(
    lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=2, tile_size=60, block_size=20
)
# chosen to cross every tile: row-45 tiles span ~[500, 622],
# row-46 tiles ~[600, 733]
LEVELS = [560.0, 610.0, 650.0]


def _tiles(spark):
    world = expected_world_heights(SPEC)
    ts = SPEC.tile_size
    rows = []
    for j in range(SPEC.n_tiles_y):
        for i in range(SPEC.n_tiles_x):
            block = world[j * ts : (j + 1) * ts, i * ts : (i + 1) * ts]
            rows.append(
                (SPEC.lon0 + i, SPEC.lat0 + j,
                 bytearray(np.ascontiguousarray(block).tobytes()))
            )
    return spark.createDataFrame(
        rows, "tile_x int, tile_y int, heights binary"
    )


def test_features_match_isoline_stats(spark):
    tiles = _tiles(spark)
    feats = tile_isolines_features(tiles, SPEC.tile_size, LEVELS).collect()
    stats = {
        (r["tile_x"], r["tile_y"], r["level"]): r
        for r in tile_isolines(tiles, SPEC.tile_size, LEVELS).collect()
    }
    # chain counts per (tile, level) equal the oracle-checked stats
    from collections import Counter

    n_chains = Counter((f["tile_x"], f["tile_y"], f["level"]) for f in feats)
    n_closed = Counter(
        (f["tile_x"], f["tile_y"], f["level"]) for f in feats if f["closed"]
    )
    for key, s in stats.items():
        assert n_chains.get(key, 0) == s["n_closed"] + s["n_clipped"], key
        assert n_closed.get(key, 0) == s["n_closed"], key
    assert len(feats) > 0


def test_features_are_valid_geojson_in_tile_bounds(spark):
    feats = tile_isolines_features(_tiles(spark), SPEC.tile_size, LEVELS)
    for r in feats.collect():
        f = json.loads(r["feature"])
        assert f["type"] == "Feature"
        assert f["geometry"]["type"] == "LineString"
        coords = f["geometry"]["coordinates"]
        assert len(coords) == r["n_points"] >= 2
        tx, ty = r["tile_x"], r["tile_y"]
        for lon, lat in coords:
            assert tx <= lon <= tx + 1 and ty <= lat <= ty + 1
        if r["closed"]:
            assert coords[0] == coords[-1]


def test_sink_round_trip(spark, tmp_path):
    out = f"{tmp_path}/isolines"
    feats = tile_isolines_features(_tiles(spark), SPEC.tile_size, LEVELS)
    write_geojson_lines(feats, out)
    back = read_geojson_lines(spark, out)
    assert back.where(F.col("geom_type") != "LineString").count() == 0
    assert back.count() == feats.count()
    # partition pruning by tile row: reading one tile_y directory
    # yields exactly that row's features
    one = spark.read.text(f"{out}/tile_y=45")
    n45 = feats.where(F.col("tile_y") == 45).count()
    assert one.count() == n45 > 0
