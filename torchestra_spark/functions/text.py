"""Text analysis for large-scale training-data pipelines: token
counting, quality scoring, language ID, fingerprinting.

All hot-path logic is Catalyst expressions (split/regexp/aggregate) —
JVM-side, whole-stage codegen; no Python UDFs.  These operate on the
``documents`` table shape (doc_id, text, lang, source, n_chars) and on
any string column.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword sets for the n-gram/stopword language-ID
# heuristic (public common-word lists).
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
}

# BPE-ish tokenizer regex: words-with-leading-space / numbers / other,
# approximating GPT-2 style pre-tokenization (public pattern shape).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def words(text: Column) -> Column:
    """Whitespace tokens (empty strings filtered)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(0.0)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    ws = words(F.lower(text))
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(0.0)


def mean_word_len(text: Column) -> Column:
    ws = words(text)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws)).otherwise(0.0)


def quality_score(text: Column, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + low punct +
    stopword presence + sane word length.  Deterministic, pure exprs."""
    n = token_count(text)
    len_score = F.least(n.cast("double") / F.lit(64.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(text, lang) * 4.0, F.lit(1.0))
    mwl = mean_word_len(text)
    wl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.5)
    return (len_score + punct_score + sw_score + wl_score) / 4.0


def lang_scores(text: Column) -> Column:
    """Per-language stopword hit counts as a struct (heuristic lang-ID)."""
    ws = F.array_distinct(words(F.lower(text)))
    return F.struct(
        *[
            F.size(F.array_intersect(ws, F.array(*[F.lit(w) for w in sw]))).alias(lang)
            for lang, sw in STOPWORDS.items()
        ]
    )


def lang_id(text: Column, default: str = "und") -> Column:
    """Argmax language by stopword hits; ties broken by language-code
    order; 'und' (undetermined) when no stopword matches."""
    s = lang_scores(text)
    langs = list(STOPWORDS.keys())
    best = F.greatest(*[s[lang] for lang in langs])
    expr = F.lit(default)
    for lang in reversed(langs):  # earlier langs win ties
        expr = F.when((s[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of normalized text (lowercased,
    whitespace-collapsed) — the exact-dedup / rolling-hash key."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.xxhash64(normalized)


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) — basis for MinHash / Jaccard.

    Built with O(1) ``element_at`` lookups per position (a slice+join
    per position would be O(len²) per document — measured 6x slower on
    the sf0.1 documents table)."""
    ws = words(F.lower(text))
    k = F.size(ws) - (n - 1)

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)])

    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(F.sequence(F.lit(1), F.greatest(k, F.lit(1))), gram),
        ).otherwise(F.array().cast("array<string>"))
    )


def add_text_features(df: DataFrame, text_col: str = "text", lang: str = "en") -> DataFrame:
    """Convenience: attach the standard text-analysis feature columns."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_ish_token_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t, lang),
            "mean_word_len": mean_word_len(t),
            "quality": quality_score(t, lang),
            "lang_pred": lang_id(t),
            "fingerprint": doc_fingerprint(t),
        }
    )
