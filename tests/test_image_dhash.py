"""dHash-from-decoded-pixels: the perceptual fingerprint agrees with a
direct numpy computation over the generator's raw blocks, and duplicate
rows (skew copies) agree with each other."""

import numpy as np

from demeton_spark.queries import q_image_dhash


def _ref_dhash(grid: np.ndarray) -> int:
    s = grid.astype(np.int64).reshape(5, 4, 5, 4).sum(axis=(1, 3))
    val = 0
    for idx, b in enumerate((s[:, :-1] > s[:, 1:]).ravel()):
        val |= int(b) << idx
    for idx, b in enumerate((s[:-1, :] > s[1:, :]).ravel()):
        val |= int(b) << (20 + idx)
    return val


def test_matches_generator_blocks(spark):
    from demeton_spark.synth import _block_row, contract_spec_for_sf
    from demeton_spark.codec import decode_heights_png, decode_hgt

    spec = contract_spec_for_sf(0.001)
    got = {
        r["image_id"]: r["dhash"]
        for r in q_image_dhash(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(got) == spec.n_rows
    for i in range(0, spec.n_rows, 7):
        iid, blob, w, h, fmt, caption, phash = _block_row(spec, i)
        grid = (
            decode_hgt(bytes(blob), w) if fmt == "hgt"
            else decode_heights_png(bytes(blob))
        )
        assert got[iid] == _ref_dhash(grid), (iid, fmt)


def test_skew_duplicates_share_dhash(spark):
    """Rows duplicated by the land-tile skew decode to identical pixels,
    so their dhash must collide — and join with phash duplicates."""
    from demeton_spark.queries import _contract_images
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.01"
    d = q_image_dhash(spark, sf_dir)
    p = _contract_images(spark, sf_dir).select("image_id", "phash")
    j = d.join(p, "image_id")
    groups = (
        j.groupBy("phash")
        .agg(F.countDistinct("dhash").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert groups == 0
