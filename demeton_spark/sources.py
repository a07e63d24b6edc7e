"""Table sources/sinks: the engine's storage-format boundary.

The production posture (BASELINE.json north_rule) is an Iceberg table
of image+caption rows at 10^12-image scale; this sandbox has no Iceberg
runtime jar, so the same reader surface is implemented over plain
parquet (identical DataFrame downstream) and the Iceberg path is a
format string + catalog config away.  What actually matters for scale
is encoded here and tested:

- the tile table is PARTITIONED BY tile key columns so bbox queries
  prune files before any IO (the Spark twin of the reference's
  "fetch only covering tiles", Dem/Funcs.fs:262-308 +
  ShadeCommand.fs:457-480 — SURVEY.md §4 row 1);
- the images table reads with explicit column projection so the binary
  payload column is never scanned by metadata-only queries
  (ReadSchema pruning);
- the Iceberg DDL for the production table records the layout choices
  (bucket the shuffle key, sort within files) that turn the pipeline's
  one full-data exchange into a local sort on a real cluster
  (SCALE.md "what we would change").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: production DDL for the input table on a real cluster (requires the
#: iceberg-spark-runtime jar + a catalog; recorded here as the layout
#: contract, not executed in the sandbox)
ICEBERG_IMAGES_DDL = """
CREATE TABLE {catalog}.{db}.images (
    image_id string,
    bytes    binary,
    w        int,
    h        int,
    fmt      string,
    caption  string,
    phash    bigint
)
USING iceberg
PARTITIONED BY (bucket(1024, image_id))
TBLPROPERTIES (
    'write.target-file-size-bytes' = '536870912',
    'read.split.target-size'       = '134217728'
)
"""

ICEBERG_TILES_DDL = """
CREATE TABLE {catalog}.{db}.tiles (
    level    int,
    tile_x   int,
    tile_y   int,
    heights  binary
)
USING iceberg
PARTITIONED BY (level, bucket(256, tile_x))
-- sorting within files by (tile_x, tile_y) gives Iceberg min-max
-- pruning on BOTH tile keys for bbox scans
TBLPROPERTIES ('sort-order' = 'tile_x ASC, tile_y ASC')
"""


def read_images(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    columns: list[str] | None = None,
) -> DataFrame:
    """Read the images table from ``location`` in the given format.

    ``columns`` projects early so Parquet/Iceberg column pruning keeps
    the multi-KB ``bytes`` payload out of metadata-only scans.
    """
    if fmt == "parquet":
        df = spark.read.parquet(location)
    elif fmt in ("iceberg", "delta"):
        # same DataFrame surface; needs the runtime jar + catalog conf
        df = spark.read.format(fmt).load(location)
    else:
        raise ValueError(f"unknown table format {fmt!r}")
    return df.select(*columns) if columns else df


def write_tile_table(
    tiles: DataFrame, path: str, partition_cols: tuple[str, ...] = ("tile_x",)
) -> None:
    """Persist assembled tiles partitioned by tile key columns.

    Partitioning by ``tile_x`` (1° longitude bands — at most 360
    directories per level, each holding one column of tiles) keeps the
    directory fan-out bounded while letting bbox reads prune whole
    bands; ``tile_y`` pruning inside a band comes from parquet row-group
    min-max stats on the sorted column.
    """
    (
        tiles.repartition(*[F.col(c) for c in partition_cols])
        .sortWithinPartitions("tile_x", "tile_y")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_tiles_for_bbox(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float],
) -> DataFrame:
    """Scan only the tiles covering ``(min_lon, min_lat, max_lon,
    max_lat)`` — the filter lands on the partition column (directory
    pruning, visible as PartitionFilters in the plan) and on the
    row-group stats for tile_y.

    Tile cover uses the reference's floor/ceil−1 rule
    (Dem/Funcs.fs:262-308): an exact-boundary bbox must not over-cover.
    """
    import math

    min_lon, min_lat, max_lon, max_lat = bbox
    tx0, tx1 = math.floor(min_lon), math.ceil(max_lon) - 1
    ty0, ty1 = math.floor(min_lat), math.ceil(max_lat) - 1
    return spark.read.parquet(path).where(
        (F.col("tile_x") >= tx0)
        & (F.col("tile_x") <= tx1)
        & (F.col("tile_y") >= ty0)
        & (F.col("tile_y") <= ty1)
    )
