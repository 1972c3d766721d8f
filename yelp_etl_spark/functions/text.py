"""Text-analysis operators for large-scale training-data pipelines.

All Catalyst built-ins (JVM-side, whole-stage codegen) — no Python UDFs:
at 100 TB of documents these run as wide-only map stages with zero
shuffle, so they scale linearly with executors.

Capabilities: tokenization + token stats, quality scoring
(length / punctuation / stopword ratios), n-gram heuristic language ID,
document fingerprinting (normalized-text hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokens = maximal runs of word characters (BPE-ish pre-tokenization).
TOKEN_PATTERN = r"[^\W_]+"

# Tiny built-in stopword lists for the language-ID heuristic. Real
# pipelines would ship fastText/CLD3 via a Pandas UDF; the heuristic is
# the deterministic, dependency-free scale path.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "ich", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
}


def tokens(text: Column, lowercase: bool = True) -> Column:
    """Array of word tokens via regexp extraction."""
    src = F.lower(text) if lowercase else text
    return F.regexp_extract_all(src, F.lit(TOKEN_PATTERN), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def whitespace_token_count(text: Column) -> Column:
    """Whitespace tokenization count (cheapest possible token estimate)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return total / F.size(toks)


def punctuation_ratio(text: Column) -> Column:
    """Fraction of non-word, non-space characters."""
    stripped = F.regexp_replace(text, r"[\w\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punctuation
    soup, has common-word mass. Weights are arbitrary but deterministic."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punctuation_ratio(text) * 4, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round((length_term + punct_term + stop_term) / 3.0, 6)


def language_scores(text: Column) -> Column:
    """Map lang → stopword-hit ratio, for argmax language ID."""
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k in STOPWORDS]),
        F.array(*[stopword_ratio(text, k) for k in STOPWORDS]),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over normalized text
    (lowercased, punctuation stripped, whitespace collapsed). Stable
    across cluster sizes/partitionings — usable as a dedup key."""
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return F.md5(normalized)


def add_text_stats(df: DataFrame, text_column: str = "text") -> DataFrame:
    """Attach the standard text-stats column set."""
    t = F.col(text_column)
    return df.withColumns(
        {
            "n_tokens": token_count(t).cast("long"),
            "n_chars_computed": char_count(t).cast("long"),
            "avg_token_len": F.round(avg_token_length(t), 6),
            "punct_ratio": F.round(punctuation_ratio(t), 6),
            "stopword_ratio_en": F.round(stopword_ratio(t, "en"), 6),
            "quality": quality_score(t),
            "fingerprint": fingerprint(t),
        }
    )
