"""r16 plan-build diet for the text operators: the SQL-text fast paths of
stopword_ratio / predict_lang / the langid best-score / quality_features
must resolve SEMANTICALLY IDENTICAL to the Column forms they shortcut
(same rule as tests/test_sqltext_builders_r15.py — the rewrite removes
py4j round trips from plan construction, never changes expressions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_service_spark.operators.dedup import _tokens_sql, tokens_expr
from duckdb_service_spark.operators.text import (
    STOPWORDS,
    _sw_best_sql,
    predict_lang,
    quality_features,
    stopword_ratio,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox is with the dog"),
            (2, "der hund ist mit der katze und nicht"),
            (3, "el perro y la gata es con una casa"),
            (4, "le chien est avec la chatte dans une maison"),
            (5, "xyzzy plugh qwerty"),  # no stopwords -> 'und'
            (6, "the der el le"),  # cross-language tie, earlier lang wins
            (7, "punct! 123 ;; spaced   out .,;:!? 42"),
        ],
        "doc_id int, text string",
    )


@pytest.mark.parametrize("lang", sorted(STOPWORDS))
def test_stopword_ratio_sqltext_same_semantics(docs, lang):
    tc = tokens_expr(F.col("text"))
    new = docs.select(stopword_ratio(_tokens_sql("text"), lang).alias("r"))
    old = docs.select(stopword_ratio(tc, lang).alias("r"))
    assert new.sameSemantics(old)
    assert new.collect() == old.collect()


def test_langid_sqltext_same_semantics_and_values(docs):
    tc = tokens_expr(F.col("text"))
    ts = _tokens_sql("text")
    new = docs.select(
        "doc_id",
        predict_lang(ts).alias("pred_lang"),
        F.expr(f"round({_sw_best_sql(ts)}, 6)").alias("best_score"),
    )
    old = docs.select(
        "doc_id",
        predict_lang(tc).alias("pred_lang"),
        F.round(
            F.greatest(*[stopword_ratio(tc, lang) for lang in STOPWORDS]), 6
        ).alias("best_score"),
    )
    assert new.sameSemantics(old)
    rows = {r[0]: (r[1], r[2]) for r in new.collect()}
    assert rows == {r[0]: (r[1], r[2]) for r in old.collect()}
    assert rows[5][0] == "und"
    assert rows[6][0] == "en"  # fixed-order tie break


def test_quality_features_sqltext_same_semantics(docs):
    new_f = quality_features("text")
    old_f = quality_features(F.col("text"))
    assert list(new_f) == list(old_f)
    new = docs.select("doc_id", *[c.alias(k) for k, c in new_f.items()])
    old = docs.select("doc_id", *[c.alias(k) for k, c in old_f.items()])
    assert new.sameSemantics(old)
    assert new.collect() == old.collect()
