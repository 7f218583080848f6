"""Text-analysis operators over documents (Catalyst-only plan checks +
value sanity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluvio_jolt_spark.operators.text_analysis import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_token_counts(spark, docs):
    out = with_token_counts(docs).limit(50).toPandas()
    for _, r in out.iterrows():
        toks = r.text.split()
        assert r.n_tokens == len(toks)
        assert r.n_distinct_tokens == len(set(toks))
        assert r.n_chars == len(r.text)


def test_quality_score_range(spark, docs):
    out = with_quality_score(docs).toPandas()
    assert ((out.quality_score >= 0) & (out.quality_score <= 1)).all()
    assert ((out.type_token_ratio > 0) & (out.type_token_ratio <= 1)).all()


def test_lang_id_mostly_en(spark, docs):
    """The synthetic docs use English-ish filler containing 'the'/'a'."""
    out = with_lang_id(docs).toPandas()
    assert (out.pred_lang == "en").mean() > 0.5


def test_lang_id_on_synthetic_langs(spark):
    rows = [
        (1, "the cat and the dog is in the house of the king"),
        (2, "der hund und die katze ist nicht ein tier der welt"),
        (3, "le chat et la maison est un lieu les arbres"),
        (4, "xyzzy qwerty zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in with_lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_text_ops_are_narrow(spark, docs):
    out = with_quality_score(with_lang_id(with_token_counts(docs)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no Python UDFs in the hot path
