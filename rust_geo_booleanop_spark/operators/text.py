"""Text analysis operators for the documents table.

Everything here is expressed with built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) except language-ID, whose stopword scoring runs as a
vectorized pandas UDF. Each built-in-only operator has an exact ANSI-SQL
oracle (see __spark_entry__.py).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Token counting / quality scoring (built-in functions only)
# ---------------------------------------------------------------------------

def token_count_col(col="text"):
    """Whitespace token count; empty/blank text counts 0.

    Counts NON-EMPTY fields of the whitespace split. Spark's split never
    emits leading/trailing empties for a trimmed input, but engines differ
    on that edge (DuckDB's string_split_regex keeps them), so the filter
    makes the definition divergence-proof across engines rather than
    relying on trim alone.
    """
    trimmed = F.trim(F.col(col))
    n_nonempty = F.size(F.filter(F.split(trimmed, r"\s+"), lambda x: x != ""))
    return F.when(trimmed == "", F.lit(0)).otherwise(n_nonempty)


def with_text_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """n_chars_obs, n_tokens, space_ratio, upper_ratio, digit_ratio."""
    length = F.length(F.col(col))
    no_space = F.length(F.regexp_replace(F.col(col), r"\s", ""))
    no_upper = F.length(F.regexp_replace(F.col(col), r"[A-Z]", ""))
    no_digit = F.length(F.regexp_replace(F.col(col), r"[0-9]", ""))
    safe_len = F.when(length > 0, length.cast("double")).otherwise(F.lit(1.0))
    return (
        docs.withColumn("n_chars_obs", length)
        .withColumn("n_tokens", token_count_col(col))
        .withColumn("space_ratio", (length - no_space) / safe_len)
        .withColumn("upper_ratio", (length - no_upper) / safe_len)
        .withColumn("digit_ratio", (length - no_digit) / safe_len)
    )


def quality_score(docs: DataFrame, col: str = "text") -> DataFrame:
    """Composite quality heuristic in [0,1]: favor mid-length documents with
    sane whitespace and low digit density."""
    stats = with_text_stats(docs, col)
    length_score = F.least(F.col("n_chars_obs").cast("double") / F.lit(500.0), F.lit(1.0))
    space_score = F.when(
        (F.col("space_ratio") >= 0.05) & (F.col("space_ratio") <= 0.3), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    digit_score = F.lit(1.0) - F.least(F.col("digit_ratio") * 4.0, F.lit(1.0))
    return stats.withColumn(
        "quality", (length_score + space_score + digit_score) / F.lit(3.0)
    )


def document_fingerprint(docs: DataFrame, col: str = "text") -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased collapsed text) —
    the key for exact-dup detection and content-addressed storage."""
    return docs.withColumn(
        "fingerprint", F.md5(F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " "))))
    )


# ---------------------------------------------------------------------------
# Language identification (n-gram/stopword heuristic, pandas UDF)
# ---------------------------------------------------------------------------

# Stopword profiles (public-knowledge high-frequency function words). Dict
# ORDER is the tie-break order: argmax with strict `>` keeps the earlier
# language on equal hit counts. The t05 oracle SQL is GENERATED from this
# table (__spark_entry__.py), so the lists are single-source-of-truth —
# edit here only.
_STOPWORDS = {
    "en": {
        "the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
        "with", "as", "his", "her", "they", "this", "have", "from", "not",
        "are", "but", "had", "you", "which", "were", "been", "their",
    },
    "de": {
        "der", "die", "das", "und", "ist", "von", "zu", "mit", "den",
        "nicht", "ein", "eine", "im", "auf", "sich", "auch", "als", "es",
        "an", "werden", "aus", "er", "hat", "dass", "sie", "nach", "bei",
        "um", "noch", "wie", "einem", "einen", "einer", "des", "dem",
    },
    "fr": {
        "le", "la", "les", "et", "de", "des", "un", "une", "est", "dans",
        "que", "pour", "qui", "sur", "pas", "plus", "par", "avec", "son",
        "au", "il", "elle", "se", "ce", "cette", "mais", "ou", "nous",
        "vous", "sont", "être", "aux", "du",
    },
    "es": {
        "el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
        "es", "por", "con", "no", "su", "para", "del", "se", "al", "lo",
        "como", "más", "pero", "sus", "le", "ya", "este", "sí", "porque",
        "esta", "son", "entre",
    },
    "it": {
        "il", "di", "che", "è", "e", "la", "per", "un", "una", "in",
        "sono", "con", "non", "si", "del", "della", "le", "gli", "dei",
        "questo", "questa", "come", "anche", "alla", "nel", "più", "ma",
    },
    "pt": {
        "o", "a", "de", "que", "e", "do", "da", "em", "um", "uma", "para",
        "com", "não", "os", "as", "dos", "das", "se", "na", "no", "por",
        "mais", "como", "mas", "foi", "ao", "ele", "ela", "são", "está",
    },
    "nl": {
        "de", "het", "een", "en", "van", "is", "dat", "op", "te", "zijn",
        "voor", "met", "die", "niet", "aan", "er", "om", "ook", "maar",
        "dan", "zij", "hij", "naar", "bij", "uit", "deze", "wordt",
    },
}
_WORD_RE = re.compile(r"[a-zA-Zäöüßéèêàçñáíóúâêôãõìòùëïîû]+")


def detect_language(text: str) -> str:
    words = [w.lower() for w in _WORD_RE.findall(text or "")][:200]
    if not words:
        return "unknown"
    best_lang, best_hits = "unknown", 0
    for lang, stops in _STOPWORDS.items():
        hits = sum(1 for w in words if w in stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "unknown"


def with_detected_language(docs: DataFrame, col: str = "text") -> DataFrame:
    @F.pandas_udf(StringType())
    def langid_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([detect_language(t) for t in texts])

    return docs.withColumn("detected_lang", langid_udf(F.col(col)))
