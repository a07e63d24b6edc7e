"""Deterministic stratified sampling + exact grouped quantiles."""

import hashlib

import duckdb
import numpy as np

from demeton_spark.queries import (
    q_doc_stratified_sample,
    q_events_value_quantiles,
)

SF_DIR = "/root/testdata/sf0.001"


def _gate(doc_id: int) -> int:
    return int(hashlib.md5(f"{doc_id}#7".encode()).hexdigest()[:8], 16) % 100


def _rate(source: str) -> int:
    num = int("".join(ch for ch in source if ch.isdigit()))
    return 10 + (num * 7) % 80


def test_sample_is_deterministic_hash_gate(spark):
    docs = duckdb.sql(
        f"select doc_id, source from read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    want = {d for d, s in docs if _gate(d) < _rate(s)}
    got1 = {r["doc_id"] for r in q_doc_stratified_sample(spark, SF_DIR).collect()}
    got2 = {r["doc_id"] for r in q_doc_stratified_sample(spark, SF_DIR).collect()}
    assert got1 == got2 == want
    assert 0 < len(want) < len(docs)


def test_quantiles_match_numpy(spark):
    rows = q_events_value_quantiles(spark, SF_DIR).collect()
    vals = duckdb.sql(
        f"select event_type, value from read_parquet('{SF_DIR}/events.parquet')"
    ).df()
    assert len(rows) == vals["event_type"].nunique()
    for r in rows:
        v = vals[vals["event_type"] == r["event_type"]]["value"].to_numpy()
        assert r["n"] == len(v)
        for p, col in ((25, "p25"), (50, "p50"), (75, "p75")):
            assert abs(r[col] - np.percentile(v, p)) < 1e-6, (r["event_type"], p)
        assert r["p25"] <= r["p50"] <= r["p75"]
