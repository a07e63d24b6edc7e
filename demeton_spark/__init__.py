"""demeton_spark — a PySpark-native spatial-join + raster-tiling engine.

Re-expresses the computational capabilities of breki/demeton (SRTM DEM
hillshading) as idiomatic Spark: DataFrame joins for tile assignment and
halo exchange, Arrow-batched pandas UDFs for the raster kernels, and
deterministic synthetic Iceberg-shaped image tables for testing.
"""

__version__ = "0.1.0"
