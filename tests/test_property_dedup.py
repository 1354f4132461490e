"""Property-based checks: the dedup operators vs an INDEPENDENT pure-
Python reference implementation on hypothesis-generated corpora. The
oracle gate proves Spark == DuckDB; these prove both match the
textbook definition."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from airflow_scraping_etl_tutorial_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
)

VOCAB = ("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel")

doc_strategy = st.lists(
    st.sampled_from(VOCAB), min_size=3, max_size=15
).map(" ".join)


def _ref_shingles(text: str, k: int = 3) -> set[tuple[str, ...]]:
    w = text.split(" ")
    return {tuple(w[i : i + k]) for i in range(len(w) - k + 1)}


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(texts=st.lists(doc_strategy, min_size=2, max_size=5))
def test_ngram_jaccard_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, shingle_size=3).collect()
    }
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = _ref_shingles(texts[a]), _ref_shingles(texts[b])
            inter = len(sa & sb)
            if inter == 0:
                assert (a, b) not in got
            else:
                expected = round(inter / len(sa | sb), 6)
                assert abs(got[(a, b)] - expected) < 1e-9, (a, b)


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(texts=st.lists(doc_strategy, min_size=1, max_size=6))
def test_exact_dedup_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {r.keep_doc_id: r.n_copies for r in exact_dedup(df).collect()}
    ref: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        ref.setdefault(t, []).append(i)
    expected = {min(ids): len(ids) for ids in ref.values()}
    assert got == expected
