"""Benchmark decontamination (word-5-gram overlap vs a benchmark slice):
semantics pinned on a constructed corpus."""

from demeton_spark.queries import q_doc_decontaminate


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_flags_only_docs_sharing_grams_with_benchmark(spark, tmp_path):
    # doc_id % 41 == 7 → benchmark slice (ids 7 and 48)
    bench_text = "alpha beta gamma delta epsilon zeta eta"
    rows = [
        (7, bench_text),  # benchmark
        (48, "tiny benchmark doc"),  # benchmark, < 5 words
        # shares the 5-gram "beta gamma delta epsilon zeta" with doc 7
        (1, "intro beta gamma delta epsilon zeta outro"),
        # same words, different order → no shared 5-gram
        (2, "zeta epsilon delta gamma beta alpha eta"),
        # short doc identical to short benchmark doc → whole-text gram hit
        (3, "tiny benchmark doc"),
        # clean doc
        (4, "completely unrelated content with many different words here"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in q_doc_decontaminate(spark, sf_dir).collect()}

    assert set(got) == {1, 3}
    assert got[1]["n_hit_grams"] == 1
    assert got[1]["n_bench_docs"] == 1
    assert got[1]["n_grams"] == 3  # 7 words → 3 distinct 5-grams
    assert abs(got[1]["overlap_frac"] - 1 / 3) < 1e-6
    # whole-text fallback gram for the <5-word doc
    assert got[3]["n_grams"] == 1 and got[3]["n_hit_grams"] == 1
    assert got[3]["overlap_frac"] == 1.0


def test_benchmark_docs_never_self_flag(spark, tmp_path):
    # two identical benchmark docs must not appear in the output
    rows = [
        (7, "one two three four five six"),
        (48, "one two three four five six"),
        (5, "nothing in common at all whatsoever truly"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    assert q_doc_decontaminate(spark, sf_dir).count() == 0


def test_broadcast_join_in_plan(spark):
    df = q_doc_decontaminate(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
