"""Text-analysis operators for training-data pipelines: language ID
(stopword-overlap heuristic), quality scoring, token counting, document
fingerprinting. All pure column expressions — whole-stage codegen, zero
Python in the row path, so cost is a single scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import shingles_expr, tokens_expr

# Tiny per-language function-word lists (public knowledge; heuristic only).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "with", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "mit", "für", "auf", "ein", "nicht"],
    "es": ["el", "la", "los", "de", "y", "es", "con", "para", "en", "una"],
    "fr": ["le", "la", "les", "et", "est", "avec", "pour", "dans", "une", "pas"],
}


def _sw_ratio_sql(toks: str, lang: str) -> str:
    """SQL-text twin of the stopword_ratio Column form (r16 plan-build
    diet, the r15 recipe): resolved expressions identical, one parse."""
    lst = ", ".join("'" + w + "'" for w in STOPWORDS[lang])
    return (
        f"(size(filter({toks}, __swt -> array_contains(array({lst}), __swt)))"
        f" / greatest(size({toks}), 1))"
    )


def _sw_best_sql(toks: str) -> str:
    return f"greatest({', '.join(_sw_ratio_sql(toks, lang) for lang in STOPWORDS)})"


def stopword_ratio(toks: "Column | str", lang: str) -> Column:
    """Share of tokens that are lang function-words.

    Pass ``toks`` as SQL TEXT (str) to build through one F.expr parse —
    the Column form costs ~20 py4j round trips per (lang) call (10 word
    literals + array + filter lambda + sizes); resolved expressions are
    identical (asserted by sameSemantics in tests/test_text_sqltext_r16)."""
    if isinstance(toks, str):
        return F.expr(_sw_ratio_sql(toks, lang))
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n = F.size(F.filter(toks, lambda t: F.array_contains(lst, t)))
    return n / F.greatest(F.size(toks), F.lit(1))


def predict_lang(toks: "Column | str") -> Column:
    """argmax of per-language stopword ratios; 'und' (undetermined) when
    every score is zero. Ties break by the fixed language order.

    str input = SQL-text fast path (one parse instead of ~100 py4j round
    trips for 4 langs x ratio + greatest + the CASE chain); the generated
    text mirrors the Column form exactly — including re-stating the
    ratio/best subtrees per CASE arm, which the Column form also does
    (shared Column objects splice the same subtree, and codegen's
    subexpression elimination dedupes them at runtime either way)."""
    if isinstance(toks, str):
        r = {lang: _sw_ratio_sql(toks, lang) for lang in STOPWORDS}
        best = _sw_best_sql(toks)
        out = "'und'"
        for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
            out = f"(CASE WHEN {r[lang]} = {best} THEN '{lang}' ELSE {out} END)"
        return F.expr(f"(CASE WHEN {best} > 0 THEN {out} ELSE 'und' END)")
    scores = {lang: stopword_ratio(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def char_class_ratio(text: Column, keep_regex: str) -> Column:
    """Fraction of characters matching a class, e.g. '[^0-9]' stripped →
    digit ratio."""
    kept = F.length(F.regexp_replace(text, keep_regex, ""))
    return kept / F.greatest(F.length(text), F.lit(1))


def quality_features(text: "Column | str") -> dict[str, Column]:
    """str input = SQL-text fast path (8 F.expr parses instead of ~70
    py4j round trips; resolved expressions identical, sameSemantics
    asserted in tests/test_text_sqltext_r16.py)."""
    if isinstance(text, str):
        from .dedup import _tokens_sql

        toks = _tokens_sql(text)
        n_chars = f"length({text})"
        n_tokens = f"size({toks})"

        def ccr(regex: str) -> str:
            return (
                f"(length(regexp_replace({text}, '{regex}', ''))"
                f" / greatest({n_chars}, 1))"
            )

        return {
            "n_chars": F.expr(f"CAST({n_chars} AS BIGINT)"),
            "n_tokens": F.expr(f"CAST({n_tokens} AS BIGINT)"),
            "mean_token_len": F.expr(
                f"round(({n_chars} - ({n_tokens} - 1))"
                f" / greatest({n_tokens}, 1), 4)"
            ),
            "digit_ratio": F.expr(f"round({ccr('[^0-9]')}, 6)"),
            "punct_ratio": F.expr(f"round({ccr('[^.,;:!?]')}, 6)"),
            "space_ratio": F.expr(f"round({ccr('[^ ]')}, 6)"),
            "en_stopword_ratio": F.expr(
                f"round({_sw_ratio_sql(toks, 'en')}, 6)"
            ),
        }
    toks = tokens_expr(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.round(
            (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1)), 4
        ),
        "digit_ratio": F.round(char_class_ratio(text, r"[^0-9]"), 6),
        "punct_ratio": F.round(char_class_ratio(text, r"[^.,;:!?]"), 6),
        "space_ratio": F.round(char_class_ratio(text, r"[^ ]"), 6),
        "en_stopword_ratio": F.round(stopword_ratio(toks, "en"), 6),
    }


def quality_score(feats: dict[str, Column]) -> Column:
    """Composite heuristic in [0,1]: long enough, low digit/punct noise,
    natural-language-ish token lengths."""
    length_ok = F.least(feats["n_tokens"] / F.lit(50.0), F.lit(1.0))
    clean = F.lit(1.0) - F.least(
        (feats["digit_ratio"] + feats["punct_ratio"]) * 5, F.lit(1.0)
    )
    wordish = F.when(
        (feats["mean_token_len"] >= 2) & (feats["mean_token_len"] <= 12), 1.0
    ).otherwise(0.3)
    return F.round((length_ok + clean + wordish) / 3, 6)


def token_counts(text: Column) -> dict[str, Column]:
    """Whitespace tokens, word-regex tokens, and a BPE-ish subword estimate
    (ceil(len/4) per token — the classic chars/4 rule applied per token)."""
    toks = tokens_expr(text)
    return {
        "ws_tokens": F.size(toks).cast("long"),
        "word_tokens": F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), 0)).cast(
            "long"
        ),
        "bpe_estimate": F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.ceil(F.length(t) / 4.0)
        ),
    }


# PII patterns shared verbatim between the Spark expressions and the DuckDB
# oracle (plans/textops.py) — restricted to the regex subset Java's engine
# and RE2 interpret identically (\b, \d, ASCII classes, bounded repeats).
# Order matters: email first (its local part can contain digits and dots that
# the later numeric patterns would chew up), then SSN (3-2-4) before phone
# (3-3-4), then IPv4 last (dots only). Each count is taken on the text AFTER
# the previous replacements, so overlapping matches are never double-counted.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(text: Column) -> tuple[Column, dict[str, Column]]:
    """(scrubbed_text, {n_email, n_ssn, ...}) — sequential regex redaction.

    Pure column expressions (regexp_count / regexp_replace are JVM codegen),
    zero Python in the row path; at 100 TB this is a map-only pass that
    pipelines with whatever scan feeds it.
    """
    counts: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return cur, counts


def fingerprint(text: Column, n_hashes: int = 5, shingle_n: int = 3) -> Column:
    """Winnowing-style doc fingerprint: the k smallest shingle-hash prefixes,
    joined. Two docs share fingerprint parts iff they share low-hash
    shingles (used for fast containment checks)."""
    hashes = F.array_sort(
        F.transform(shingles_expr(text, shingle_n), lambda s: F.substring(F.md5(s), 1, 8))
    )
    return F.concat_ws(",", F.slice(hashes, 1, n_hashes))
