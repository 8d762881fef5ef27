"""Text-analysis operators over the `documents` table.

All pure Catalyst expressions (split/explode/higher-order lambdas) —
the hot path stays in whole-stage codegen. Documents are synthetic
space-separated lowercase words (FIXTURES.md), so tokenization is a
plain split; the regex variants exist for real-corpus inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# A small multilingual stopword set for the quality/lang-id heuristics.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "es": ["el", "la", "y", "de", "que"],
    "fr": ["le", "la", "et", "de", "que"],
    "zh": ["的", "了", "和", "是", "在"],
}


def words(text_col="text") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def tokenize(df: DataFrame, id_cols=("doc_id",), text_col="text") -> DataFrame:
    """One row per (doc, word)."""
    return df.select(*id_cols, F.explode(words(text_col)).alias("word"))


def shingles(text_col="text", k: int = 3) -> Column:
    """Word k-shingles as an array column (basis for MinHash/Jaccard).

    Documents shorter than k words yield a single shingle of the whole
    text so no document silently disappears from dedup.
    """
    w = words(text_col)
    n = F.size(w)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))


def bigrams(text_col="text") -> Column:
    return shingles(text_col, k=2)


def token_count_ws(text_col="text") -> Column:
    """Whitespace token count."""
    return F.size(words(text_col))


def token_count_bpe_ish(text_col="text") -> Column:
    """BPE-ish subword proxy: alternating letter-run / digit-run /
    punctuation tokens via regex — a deterministic stand-in for a real
    tokenizer's token count (≈ chars/4 heuristic replaced by actual
    run segmentation).

    The whitespace class is spelled EXPLICITLY, never `\\s`: Java's
    `\\s` is [ \\t\\n\\x0B\\f\\r] but RE2's (DuckDB) omits \\x0B, so a
    vertical-tab character silently counts as a symbol token in the
    oracle and not here (round-8 control-char sweep — the one regex
    dialect divergence in the registry). Both engines understand the
    explicit escapes identically; keep the oracle's class
    (BPE_ISH_SQL_PATTERN) byte-equal to this one."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # Count maximal runs of word chars (≤4 chars each run-chunk) plus
    # single non-whitespace symbols.
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


# One pattern, two engines: the explicit class replaces `\s` (see
# token_count_bpe_ish). Java regex and RE2 parse every escape here
# identically, so impl and oracle can share the literal text.
BPE_ISH_PATTERN = r"[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 \t\n\x0B\f\r]"
BPE_ISH_SQL_PATTERN = BPE_ISH_PATTERN


def quality_score(text_col="text", n_chars_col="n_chars") -> Column:
    """Deterministic quality heuristic in [0,1]: mix of length band,
    mean word length sanity, and stopword presence. Portable SQL
    (no randomness, no floats beyond rounded ratios)."""
    w = words(text_col)
    n_words = F.size(w).cast("double")
    n_chars = F.col(n_chars_col).cast("double")
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1.0))
    len_band = F.when((n_words >= 20) & (n_words <= 1000), 1.0).otherwise(0.5)
    word_len_band = F.when((mean_word_len >= 3) & (mean_word_len <= 12), 1.0).otherwise(0.5)
    all_stops = [s for lst in STOPWORDS.values() for s in lst]
    stop_hits = F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in all_stops])))
    stop_band = F.when(stop_hits > 0, 1.0).otherwise(0.7)
    return F.round(len_band * 0.4 + word_len_band * 0.4 + stop_band * 0.2, 4)


def langid_scores(text_col="text") -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-ish heuristic:
    distinct marker-word overlap). Returns {lang: score_col}."""
    w = F.array_distinct(words(text_col))
    return {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in stops])))
        for lang, stops in STOPWORDS.items()
    }
