"""Curation filter pipeline: keep/drop verdict composition."""

from demeton_spark.queries import q_doc_filter_pipeline


def test_verdict_composition_on_constructed_corpus(spark, tmp_path):
    good = (
        "the quick brown fox jumps over a lazy dog and then runs far away "
        "to the old stone bridge where many other animals gather quietly"
    )
    rows = [
        (1, good),                      # keeps
        (2, good),                      # exact duplicate of 1 → dropped
        (3, "word " * 40),              # repetition + lang fail
        (4, "short text"),              # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r for r in q_doc_filter_pipeline(spark, str(tmp_path)).collect()
    }
    assert got[1]["keep"] and not got[1]["fail_duplicate"]
    assert not got[2]["keep"] and got[2]["fail_duplicate"]
    assert not got[3]["keep"] and got[3]["fail_repetition"]
    assert not got[4]["keep"] and got[4]["fail_short"]


def test_benchmark_slice_never_keeps(spark, tmp_path):
    """Docs in the eval-benchmark slice (doc_id % 41 == 7) must carry
    fail_benchmark and keep=false even when every quality gate passes —
    a curation pipeline must not train on its own eval set (ADVICE r3)."""
    good = (
        "the quick brown fox jumps over a lazy dog and then runs far away "
        "to the old stone bridge where many other animals gather quietly"
    )
    alt = (
        "a calm river winds beneath tall green hills while distant bells "
        "ring softly from the village church on a bright spring morning"
    )
    rows = [(1, good), (7, alt)]  # 7 % 41 == 7 → benchmark slice
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in q_doc_filter_pipeline(spark, str(tmp_path)).collect()
    }
    assert got[1]["keep"] and not got[1]["fail_benchmark"]
    assert got[7]["fail_benchmark"] and not got[7]["keep"]
    # every other gate passes for doc 7 — benchmark membership alone drops it
    assert not any(
        got[7][f] for f in ("fail_short", "fail_lang", "fail_quality",
                            "fail_repetition", "fail_contaminated",
                            "fail_duplicate")
    )


def test_every_flag_is_exercised_at_sf001(spark):
    rows = q_doc_filter_pipeline(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)
    for flag in ("fail_short", "fail_lang", "fail_quality",
                 "fail_repetition", "fail_contaminated", "fail_benchmark"):
        assert any(r[flag] for r in rows), flag
    # keep ⇒ no flag set
    for r in rows:
        if r["keep"]:
            assert not any(
                r[f] for f in ("fail_short", "fail_lang", "fail_quality",
                               "fail_repetition", "fail_contaminated",
                               "fail_duplicate", "fail_benchmark")
            )
