"""Joint image+caption transitive dedup: cross-modal clusters resolve
through chains no single modality sees."""

from demeton_spark.queries import pair_dedup_clusters, q_pair_dedup_clusters


def _run(spark, rows):
    imgs = spark.createDataFrame(
        rows, "image_id string, phash long, caption string"
    )
    return {
        r["cluster_id"]: (r["n_members"], r["n_phashes"], r["n_captions"])
        for r in pair_dedup_clusters(imgs).collect()
    }


def test_cross_modal_chain_merges(spark):
    # a ~ b by phash, b ~ c by caption → one cluster of 3, even though
    # a and c share nothing directly
    got = _run(spark, [
        ("a", 1, "cap_x"),
        ("b", 1, "cap_y"),
        ("c", 2, "cap_y"),
        ("d", 3, "cap_z"),  # singleton
    ])
    assert got == {"a": (3, 2, 2), "d": (1, 1, 1)}


def test_modalities_alone_match_single_modality_clusters(spark):
    # no caption dup, only phash dups: behaves like plain phash dedup
    got = _run(spark, [
        ("a", 1, "u"), ("b", 1, "v"), ("c", 2, "w"),
    ])
    assert got == {"a": (2, 1, 2), "c": (1, 1, 1)}


def test_two_disjoint_multimodal_clusters(spark):
    got = _run(spark, [
        ("a", 1, "p"), ("b", 1, "q"), ("c", 9, "q"),
        ("x", 5, "r"), ("y", 5, "s"), ("z", 6, "s"),
    ])
    assert got == {"a": (3, 2, 2), "x": (3, 2, 2)}


def test_contract_query_cluster_mass_conserved(spark):
    rows = q_pair_dedup_clusters(spark, "/root/testdata/sf0.01").collect()
    # members sum to the fixture's row count; every cluster's phash and
    # caption cardinalities are bounded by its member count
    assert sum(r["n_members"] for r in rows) == 540
    assert all(
        r["n_phashes"] <= r["n_members"] and r["n_captions"] <= r["n_members"]
        for r in rows
    )
