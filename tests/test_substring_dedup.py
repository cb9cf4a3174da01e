"""Unit semantics for text_substring_dedup (Lee et al. 2022 span dedup):
hand-built corpora with KNOWN duplicated spans, driven through the exact
plan the registry query runs (substring_dedup_corpus)."""

from __future__ import annotations

from duckdb_service_spark.plans.textops import substring_dedup_corpus


def _run(spark, docs, k=3, min_docs=2):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = substring_dedup_corpus(df, k=k, min_docs=min_docs).collect()
    return {r.doc_id: (r.total_tokens, r.n_spans, r.dup_tokens) for r in rows}


def test_no_duplicates_means_zero_spans(spark):
    out = _run(
        spark,
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
    )
    assert out == {1: (5, 0, 0), 2: (5, 0, 0)}


def test_shared_span_counted_on_both_docs(spark):
    # "c d e" (k=3) appears verbatim in both docs at different offsets
    out = _run(
        spark,
        [(1, "a b c d e f"), (2, "x c d e y z")],
    )
    # doc 1: hit at pos 2 covers tokens 2..4 (3 tokens); doc 2: pos 1 -> 1..3
    assert out[1] == (6, 1, 3)
    assert out[2] == (6, 1, 3)


def test_overlapping_hits_merge_into_one_span(spark):
    # docs share "a b c d e": doc 1 has hits at pos 0,1,2 (k=3) -> ONE
    # merged span covering all 5 tokens
    out = _run(
        spark,
        [(1, "a b c d e"), (2, "z a b c d e w")],
    )
    assert out[1] == (5, 1, 5)
    assert out[2] == (7, 1, 5)


def test_adjacent_spans_merge_distant_spans_do_not(spark):
    # doc 1 shares "p q r" with doc 2 and "x y z" with doc 3, separated by
    # a unique gap -> TWO distinct spans of 3 tokens each
    out = _run(
        spark,
        [
            (1, "p q r gap1 gap2 gap3 x y z"),
            (2, "p q r unrelated tail here"),
            (3, "head x y z unrelated2 tail2"),
        ],
    )
    assert out[1] == (9, 2, 6)


def test_within_doc_repeat_alone_is_not_cross_doc_dup(spark):
    # "m n o" repeats INSIDE doc 1 only; min_docs=2 counts DISTINCT docs,
    # so no span is flagged
    out = _run(
        spark,
        [(1, "m n o sep m n o"), (2, "totally different words here now")],
    )
    assert out[1] == (7, 0, 0)


def test_short_docs_below_k_never_match(spark):
    out = _run(spark, [(1, "a b"), (2, "a b")], k=3)
    assert out == {1: (2, 0, 0), 2: (2, 0, 0)}


def test_whole_doc_duplicate_is_one_full_span(spark):
    out = _run(spark, [(1, "s t u v"), (2, "s t u v")], k=3)
    assert out[1] == (4, 1, 4)
    assert out[2] == (4, 1, 4)
