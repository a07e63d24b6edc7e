"""Acceptance parity with the reference CLI.

The tutorial (/root/reference/docs/Tutorial.md:28-33) runs
``shade 13.49437,46.159668,14.236633,46.543914 --map-scale 1500000``
and logs "a total raster size of 650x488 pixels (1x1 tiles)".  Our
projection + MBR math must reproduce those dimensions exactly, and the
full pipeline over a synthetic DEM world must color the raster like the
reference's acceptance run (exit 0 + output tile ≈ completed job with
fully shaded pixels).  Also guards the physical-plan shapes the engine
depends on (pushdown, broadcast).
"""

import numpy as np

from demeton_spark import render
from demeton_spark.geometry import MapScale, Mercator

TUTORIAL_BBOX = (13.49437, 46.159668, 14.236633, 46.543914)
TUTORIAL_PTS = [
    (TUTORIAL_BBOX[0], TUTORIAL_BBOX[1]),
    (TUTORIAL_BBOX[2], TUTORIAL_BBOX[1]),
    (TUTORIAL_BBOX[0], TUTORIAL_BBOX[3]),
    (TUTORIAL_BBOX[2], TUTORIAL_BBOX[3]),
]
#: map-scale 1:1.5M at the reference's DefaultDpi=300
#: (ShadeCommand.fs:71)
TUTORIAL_SCALE = MapScale(1_500_000, 300)


def test_tutorial_raster_size_matches_reference_log():
    mbr = render.raster_mbr(Mercator(TUTORIAL_SCALE), TUTORIAL_PTS)
    assert (mbr[2] - mbr[0], mbr[3] - mbr[1]) == (650, 488)


def test_tutorial_shade_run(spark):
    """The tutorial shade over a synthetic N46E013/N46E014 world: one
    1000px raster tile, every pixel elevation-colored (the reference's
    'elevation colorer colors all pixels' acceptance shape)."""
    ts = 60
    rows = []
    for tx in (13, 14):
        tile = np.full((ts, ts), 800, dtype=np.int16)
        rows.append((tx, 46, bytearray(tile.tobytes())))
    dem = spark.createDataFrame(rows, "tile_x int, tile_y int, heights binary")
    out = render.render_shaded_raster(
        spark, dem, TUTORIAL_PTS, TUTORIAL_SCALE,
        script="elecolor|+igor", tile_size=ts,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (650, 488)
    assert r["shaded_px"] == r["total_px"] == 650 * 488
    assert r["n_dem_tiles"] == 2  # N46E013 + N46E014, like the tutorial log


def test_lsh_recall_gate(spark):
    """Multi-band MinHash LSH must find ≥0.9 of exact-Jaccard pairs at
    j≥0.7 (the round-2 dedup quality gate; b=8 × r=2 predicts 1-(1-s²)^8
    ≥ 0.995 there) and a perfect 1.0 at j≥0.9 on the test corpus."""
    from demeton_spark.queries import q_doc_near_dup_recall

    rows = {
        r["jaccard_bucket"]: r
        for r in q_doc_near_dup_recall(spark, "/root/testdata/sf0.001").collect()
    }
    assert rows["0.7<=j<0.9"]["recall"] >= 0.9
    assert rows["j>=0.9"]["recall"] == 1.0
    # the sub-threshold band is informational but should beat the
    # theoretical 1-(1-0.25)^8 = 0.9 floor at its top edge; allow slack
    assert rows["0.5<=j<0.7"]["recall"] >= 0.8


def test_plan_shapes(spark):
    """Catalyst must push the shipdate filter into the parquet scan and
    broadcast the tile-metadata dimension (SURVEY.md §4 checkpoints)."""
    import contextlib
    import io

    from demeton_spark.queries import q_pricing_summary, q_tile_metadata_join

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    p1 = plan_of(q_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in p1 and "l_shipdate" in p1.split("PushedFilters")[1][:200]
    p2 = plan_of(q_tile_metadata_join(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p2 or "BroadcastExchange" in p2


def test_emb_lsh_recall_gate(spark):
    """Multiband hyperplane LSH must recover ≥0.85 of exact-cosine pairs
    at c≥0.3 and ≥0.9 at c≥0.4 (was ~0.03 with the round-1 single
    8-bit band)."""
    from demeton_spark.queries import q_emb_near_dup_recall

    rows = {
        r["cosine_bucket"]: r
        for r in q_emb_near_dup_recall(spark, "/root/testdata/sf0.01").collect()
    }
    assert rows["0.3<=c<0.4"]["recall"] >= 0.85
    assert rows["c>=0.4"]["recall"] >= 0.9


def test_ivf_recall_gate(spark):
    """Multiband-IVF ANN must recover ≥2/3 of each probe's exact top-3
    (round-1's single-bucket quantizer scored 0.0 on every probe)."""
    from demeton_spark.queries import q_knn_ivf_recall

    rows = q_knn_ivf_recall(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no probes"
    for r in rows:
        assert r["recall"] >= 2 / 3, (r["query_id"], r["recall"])


def test_kmeans_ivf_trained_quantizer(spark):
    """Trained-IVF (Lloyd k-means coarse quantizer): the model is a
    valid partition of the corpus, the quantized-centroid cascade is
    deterministic across runs, and nprobe=2 search recovers ≥2/3 of
    each probe's exact top-3 with mean recall ≥0.9."""
    from demeton_spark.queries import (
        KMEANS_K,
        q_kmeans_centroids,
        q_knn_ivf_kmeans_recall,
    )

    sf = "/root/testdata/sf0.001"
    cent = q_kmeans_centroids(spark, sf).collect()
    assert len(cent) == KMEANS_K * 64
    sizes = {r["cluster"]: r["n_members"] for r in cent}
    assert sum(sizes.values()) == 500  # every vec in exactly one list
    assert all(s > 0 for s in sizes.values())
    # deterministic refit (quantized cascade) — drop the model memo so
    # the second call really re-runs Lloyd from scratch
    from demeton_spark import queries as _q

    _q._KM_MEMO.clear()
    cent2 = q_kmeans_centroids(spark, sf).collect()
    assert sorted(map(tuple, cent)) == sorted(map(tuple, cent2))

    rows = q_knn_ivf_kmeans_recall(spark, sf).collect()
    assert rows, "no probes"
    for r in rows:
        assert r["recall"] >= 2 / 3, (r["query_id"], r["recall"])
    assert sum(r["recall"] for r in rows) / len(rows) >= 0.9


def test_geo_knn_recall_gate(spark):
    """Cell-neighborhood spatial kNN must recover every probe's exact
    great-circle top-3 on this corpus (face-edge ring clipping is
    measured by the same query at scale)."""
    from demeton_spark.queries import q_geo_knn_recall

    rows = q_geo_knn_recall(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no probes"
    for r in rows:
        assert r["recall"] >= 2 / 3, (r["query_id"], r["recall"])
    assert sum(r["recall"] for r in rows) / len(rows) >= 0.9
