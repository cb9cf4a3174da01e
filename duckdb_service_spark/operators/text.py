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


def stopword_ratio(toks: Column, lang: str) -> Column:
    """Share of tokens that are lang function-words."""
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n = F.size(F.filter(toks, lambda t: F.array_contains(lst, t)))
    return n / F.greatest(F.size(toks), F.lit(1))


def predict_lang(toks: Column) -> Column:
    """argmax of per-language stopword ratios; 'und' (undetermined) when
    every score is zero. Ties break by the fixed language order."""
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


def quality_features(text: Column) -> dict[str, Column]:
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
