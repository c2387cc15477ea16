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
# PII scrubbing (built-in regexp functions; exact SQL oracle)
# ---------------------------------------------------------------------------

# Deliberately simple patterns using only constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB) — literal classes,
# bounded repetition — so the oracle matches byte-for-byte.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()\s.-]{6,}[0-9]"


def pii_scrub(docs: DataFrame, col: str = "text") -> DataFrame:
    """Redact emails then phone-like digit runs from `col`; adds
    `scrubbed` plus per-doc redaction counts. A standard pre-training
    hygiene pass — pure JVM regexp (whole-stage codegen), no Python."""
    emails_out = F.regexp_replace(F.col(col), EMAIL_PATTERN, "<EMAIL>")
    # idx=0 = the whole match: Spark defaults to capture group 1 (and
    # throws on patterns without groups), DuckDB defaults to group 0
    return (
        docs.withColumn(
            "n_emails", F.size(F.regexp_extract_all(F.col(col), F.lit(EMAIL_PATTERN), F.lit(0)))
        )
        .withColumn(
            "n_phones", F.size(F.regexp_extract_all(emails_out, F.lit(PHONE_PATTERN), F.lit(0)))
        )
        .withColumn("scrubbed", F.regexp_replace(emails_out, PHONE_PATTERN, "<PHONE>"))
    )


# ---------------------------------------------------------------------------
# Stopword ratio (quality signal; exact SQL oracle)
# ---------------------------------------------------------------------------

def stopword_ratio_col(stopwords: tuple[str, ...], col: str = "text"):
    """Fraction of whitespace tokens that are in `stopwords` (lowercased).
    0.0 for blank text. Natural-language text sits roughly in [0.2, 0.6];
    keyword spam and boilerplate fall outside — a cheap quality filter."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(col))), r"\s+"), lambda x: x != ""
    )
    stops = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def with_stopword_ratio(docs: DataFrame, lang: str = "en", col: str = "text") -> DataFrame:
    return docs.withColumn(
        "stopword_ratio", stopword_ratio_col(tuple(sorted(_STOPWORDS[lang])), col)
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


# ---------------------------------------------------------------------------
# Repetition stats (Gopher-style quality signals; exact SQL oracle)
# ---------------------------------------------------------------------------

def with_repetition_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: token counts, distinct
    token counts, and the occurrence count of the most frequent word
    2-gram. Repetitive machine-generated pages show a high
    top2gram_n/n_tokens fraction; downstream filters threshold on it.

    All outputs are exact integers (no FP), so the DuckDB oracle hashes
    bit-for-bit. Requires a `doc_id` column (the per-doc group key).

    Scale shape: the 2-gram mode is explode -> two hash aggregations
    (map-side partials both times) -> broadcast-size join back; nothing
    quadratic, no windows. At 100 TB the explode multiplies rows by
    ~n_tokens but each gram row is a few bytes and the first groupBy
    collapses them map-side.

    NULL text counts as empty (zeros, not NULL stats) — a quality filter
    must score every document.
    """
    trimmed = F.trim(F.coalesce(F.col(col), F.lit("")))
    toks = F.filter(F.split(trimmed, r"\s+"), lambda x: x != "")
    d = docs.withColumn("_toks", toks)
    d = d.withColumn("n_tokens", F.size("_toks").cast("long")).withColumn(
        "n_distinct_tokens", F.size(F.array_distinct("_toks")).cast("long")
    )
    # word 2-grams: SQL CASE (not F.when) so the empty array literal
    # coerces to array<string> in one expression
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(_toks) >= 2 THEN "
                "transform(sequence(1, size(_toks) - 1), "
                "i -> concat_ws(' ', element_at(_toks, i), element_at(_toks, i + 1))) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    top = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top2gram_n"))
    )
    return (
        d.drop("_toks")
        .join(top, "doc_id", "left")
        .withColumn("top2gram_n", F.coalesce(F.col("top2gram_n"), F.lit(0)).cast("long"))
    )


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (built-in regexp only; exact oracle)
# ---------------------------------------------------------------------------

# Tracking query parameters stripped by normalize_url_col. Alternation is
# anchored to [?&] in the patterns below, so e.g. `href=` or `preference=`
# never lose their `ref=` suffix.
TRACKING_PARAMS = r"(utm_[a-z0-9]+|ref|fbclid|gclid)"


def normalize_url_col(col="url"):
    """Canonical URL: lowercase scheme+host, tracking params removed,
    dangling `?`/`&` and trailing slashes stripped. Pure JVM regexp —
    patterns use only constructs with identical Java-regex/RE2 semantics
    (no backreferences), so the DuckDB oracle matches byte-for-byte.

    Not a full RFC 3986 canonicalizer (no percent-encoding or dot-segment
    normalization) — it is the crawl-dedup key normalization: the cheap
    transforms that collapse the bulk of same-page URL variants."""
    u = F.col(col)
    scheme_host = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*"
    u = F.concat(
        F.lower(F.regexp_extract(u, scheme_host, 0)),
        F.regexp_replace(u, scheme_host, ""),
    )
    # non-first tracking params (&p=v), then a tracking param in first
    # position (?p=v&rest -> ?rest), then a tracking-only query (?p=v$)
    u = F.regexp_replace(u, r"&" + TRACKING_PARAMS + r"=[^&]*", "")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAMS + r"=[^&]*&", "?")
    u = F.regexp_replace(u, r"\?" + TRACKING_PARAMS + r"=[^&]*$", "")
    # dangling separators the rules above can leave behind (e.g.
    # '?ref=1&' -> '?' via the first-position rule) or that the raw URL
    # carried ('...&'): strip so '/p?' collapses with '/p'
    u = F.regexp_replace(u, r"[?&]+$", "")
    return F.regexp_replace(u, r"/+$", "")


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Group documents by canonical URL: one row per normalized URL with
    the duplicate count and the canonical member (min doc_id — the
    deterministic representative, as exact_dedup uses).

    Scale shape: one hash aggregation on the normalized key (map-side
    partials); the normalization itself is whole-stage-codegen regexp."""
    return (
        docs.withColumn("url_norm", normalize_url_col(url_col))
        .groupBy("url_norm")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-document line-level boilerplate removal (built-in only; exact oracle)
# ---------------------------------------------------------------------------

def remove_boilerplate_lines(
    docs: DataFrame, col: str = "text", min_docs: int = 3
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate stripping: a (trimmed, non-empty)
    line appearing in >= min_docs DISTINCT documents is boilerplate (cookie
    banners, copyright footers, nav chrome) and is removed from every
    document; surviving lines are rejoined in original order.

    Returns one row per input document: doc_id, clean_text (newline-joined
    kept lines, '' if everything was boilerplate), n_lines_kept,
    n_lines_removed. All outputs exact (strings + integers), so the DuckDB
    oracle hashes bit-for-bit.

    Scale shape: posexplode lines -> ONE hash aggregation for the
    document-frequency count (map-side partials; the groupBy key is the
    line text, so identical boilerplate collapses early) -> left_anti
    equi-join of lines vs the boilerplate set (AQE broadcasts it when
    small — at web scale the df>=N set is tiny relative to the corpus) ->
    per-doc rebuild via array_sort(collect_list(struct(pos,line))), bounded
    by single-document size. Nothing quadratic, no windows, no Python.
    """
    lines = (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col(col), "\n")).alias("pos", "line")
        )
        .withColumn("line", F.trim("line"))
        .filter(F.col("line") != "")
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines_total"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            (
                F.coalesce("n_lines_total", F.lit(0))
                - F.coalesce("n_lines_kept", F.lit(0))
            )
            .cast("long")
            .alias("n_lines_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality filter (composite rules; exact oracle)
# ---------------------------------------------------------------------------

# The stopword presence rule's word list (Gopher rule: a good document
# contains at least min_stopwords of these). The t11 oracle SQL embeds this
# table literally — change it here only (tests pin the generated SQL).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    docs: DataFrame,
    col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    min_distinct_frac: float = 0.2,
    max_top2gram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-rules composite keep/drop filter: token-count bounds, mean
    word length window, alphabetic-word fraction, stopword presence,
    distinct-token fraction, and top-2-gram repetition fraction. Emits
    `keep` plus `fail_reason` = the FIRST failing rule in the fixed order
    below (NULL when kept), so downstream attrition dashboards can break
    drops down by rule.

    Determinism: every ratio is ONE double division of exactly-computed
    integers, and thresholds are literals — the comparison outcome is
    bit-reproducible and matches the DuckDB oracle. NULL/blank text fails
    `too_few_tokens` (a quality filter must score every document).

    Scale shape: with_repetition_stats supplies the only shuffle; all
    added metrics (char sums, stopword/alpha counts) are per-row JVM HOFs
    inside whole-stage codegen.
    """
    d = with_repetition_stats(docs, col)
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    char_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    stop_lit = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_lit))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    d = (
        d.withColumn("_char_sum", char_sum)
        .withColumn("n_stopwords", n_stop.cast("long"))
        .withColumn("_n_alpha", n_alpha.cast("long"))
    )
    n = F.col("n_tokens").cast("double")
    mean_wl = F.col("_char_sum").cast("double") / n
    alpha_frac = F.col("_n_alpha").cast("double") / n
    distinct_frac = F.col("n_distinct_tokens").cast("double") / n
    top2_frac = F.col("top2gram_n").cast("double") / n
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_few_tokens"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_many_tokens"))
        .when(
            (mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len),
            F.lit("word_length"),
        )
        .when(alpha_frac < min_alpha_frac, F.lit("non_alpha"))
        .when(F.col("n_stopwords") < min_stopwords, F.lit("stopwords"))
        .when(distinct_frac < min_distinct_frac, F.lit("repetition_distinct"))
        .when(top2_frac > max_top2gram_frac, F.lit("repetition_2gram"))
    )
    return (
        d.withColumn("fail_reason", reason)
        .withColumn("keep", F.col("fail_reason").isNull())
        .drop("_char_sum", "_n_alpha")
    )


# ---------------------------------------------------------------------------
# TF-IDF distinctive terms (built-in functions only)
# ---------------------------------------------------------------------------

def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k most distinctive terms per document by a TF-IDF-style score.

    Tokenization: lowercase, whitespace split, empty fields dropped (the
    same divergence-proof filter as `token_count_col`). The idf factor is
    the RATIONAL form ``N / (1 + df)`` rather than ``ln(N / (1 + df))`` —
    log changes no per-document ranking (it is monotone), and +,-,*,/ are
    IEEE-correctly-rounded in every engine while ln is not, so the score
    doubles are bit-reproducible in the DuckDB oracle (t13).

    Output: (doc_id, term, tf, df, score, rank), rank 1..k per document,
    ordered by (score DESC, term ASC) — a total order, so ties are stable
    across engines.

    100 TB shape: ONE scan -> explode -> per-(doc,term) tf hash
    aggregation with map-side partials, then df as a COUNT window over
    the term partition of the already-aggregated tf relation (no second
    scan, no self-join — a groupBy-df + join variant re-tokenized the
    whole corpus in the static plan), a broadcast of the 1-row corpus
    count, and a per-document window for the top-k. No UDFs anywhere.
    Hot terms are already collapsed to one row per (doc, term) before
    the term-partitioned window, so term skew is bounded by document
    count, not token count.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / (F.lit(1.0) + F.col("df").cast("double"))),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Training-window chunking (built-in functions only)
# ---------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size overlapping token windows — the
    packing step that turns a cleaned corpus into training examples.

    Window i covers tokens [i*s, i*s + chunk_tokens) with stride
    s = chunk_tokens - overlap; a window is emitted iff its start is 0 or
    start < n_tokens - overlap (the remaining tail windows would be strict
    suffixes of the previous window). Tokenization is the divergence-proof
    whitespace split of `token_count_col`; chunk text is the tokens
    re-joined with single spaces (whitespace-normalized by construction).

    Output: (doc_id, chunk_idx, chunk_text, n_chunk_tokens), chunk_idx
    0-based and dense per document.

    100 TB shape: a pure per-row codegen expression (split -> sequence of
    starts -> posexplode -> slice + array_join) — NO shuffle of the corpus
    at all; chunking parallelism equals scan parallelism. Oracle: t14
    recomputes the identical windows with DuckDB list slicing.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    tk = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    n = F.size(tk)
    starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.filter(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
            lambda st: (st == 0) | (st < n - F.lit(overlap)),
        )
    )
    exploded = docs.select(
        F.col(id_col), tk.alias("_tk"), F.posexplode(starts).alias("chunk_idx", "_start")
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("_tk"), F.col("_start") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.size("_tk") - F.col("_start")).alias(
            "n_chunk_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# Eval-set decontamination (built-in functions only)
# ---------------------------------------------------------------------------

def word_ngram_col(col="text", n: int = 4):
    """Distinct word n-grams: lowercase, whitespace-tokenized, joined with
    single spaces. A document shorter than n tokens contributes its whole
    token sequence as one (short) gram — the same clamp d03's shingles use
    — so every non-empty document owns at least one gram. A BLANK (or
    NULL/whitespace-only) document owns NO grams: without the zero-token
    guard the clamp would hand it the empty-string gram '', and one blank
    eval doc would then mark every blank training doc as contaminated
    despite sharing no content."""
    tk = F.filter(F.split(F.lower(F.trim(F.col(col))), r"\s+"), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(tk, i, n), " "),
    )
    return F.when(
        F.size(tk) > 0, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with an evaluation set (the standard pre-training hygiene
    pass that keeps test questions out of the training corpus).

    Output: one row per training document —
    (id_col, n_grams, n_matched, contaminated), where n_grams counts the
    document's DISTINCT n-grams, n_matched how many of those occur
    anywhere in the eval set, and contaminated = n_matched > 0.

    100 TB shape: the eval side is a benchmark suite — thousands of
    documents, not billions — so its distinct-gram set is broadcast and
    the whole pass is scan -> per-row gram explode -> broadcast hash join
    -> one map-side-partial aggregation on id_col. The corpus is never
    shuffled by gram. (If the eval set ever outgrows broadcast, drop the
    F.broadcast hint and the same plan degrades to a shuffle join on the
    gram key.) No reference counterpart (engine requirement, like
    heavy hitters / sampling).
    """
    grams = word_ngram_col(text_col, n)
    ev = eval_docs.select(F.explode(grams).alias("gram")).distinct()
    tr = train.select(F.col(id_col), F.explode(grams).alias("gram"))
    hits = tr.join(
        F.broadcast(ev.withColumn("_hit", F.lit(1))), "gram", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_matched"),
        )
        .withColumn("contaminated", F.col("n_matched") > F.lit(0))
    )


# ---------------------------------------------------------------------------
# Within-document line dedup (built-in functions only)
# ---------------------------------------------------------------------------

def dedup_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Remove REPEATED lines within each document, keeping the first
    occurrence in order (the within-page half of CCNet-style line dedup;
    `remove_boilerplate_lines` is the cross-document half).

    Pure codegen: an `aggregate` fold over the line array appends a line
    iff it hasn't been seen yet — O(lines^2) per document, which is fine
    because lines-per-page is bounded (and tiny next to the regex work
    already in this pipeline). Appends clean_text, n_lines_in,
    n_lines_out; empty lines count as lines (a repeated blank collapses
    too).

    100 TB shape: per-row expression only — no shuffle, no UDF, chunking
    parallelism equals scan parallelism.
    """
    # NULL text behaves like empty text (one empty line), as the other
    # text operators do — without the coalesce, legacy size(NULL) = -1
    # would emit nonsense negative line counts and a NULL clean_text
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
    deduped = F.aggregate(
        lines,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    return docs.select(
        *docs.columns,
        F.array_join(deduped, "\n").alias("clean_text"),
        F.size(lines).alias("n_lines_in"),
        F.size(deduped).alias("n_lines_out"),
    )


# ---------------------------------------------------------------------------
# Bigram collocations (built-in functions only)
# ---------------------------------------------------------------------------

def bigram_collocations(
    docs: DataFrame, min_count: int = 5, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k corpus collocations: adjacent token pairs ranked by the
    rational association score ``pair_count * N / (count(w1) * count(w2))``
    (a PMI without the log, so the doubles are bit-reproducible across
    engines — the t13 rational-idf trick). N is the corpus bigram total;
    unigram counts are plain token frequencies.

    Output: (w1, w2, pair_count, score), the k highest-scoring pairs with
    pair_count >= min_count, tie-broken by (w1, w2).

    100 TB shape: token/bigram explodes are map-side; the two hash aggs
    run map-side partials; the final top-k is orderBy().limit() =
    TakeOrderedAndProject, a distributed partial top-k — never a
    single-partition window over the bigram vocabulary.
    """
    tk = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    # zip of two slices, NOT element_at inside a transform lambda — the
    # lambda form re-evaluates the token array per element (O(tokens^2)
    # per document; measured 4.7 s -> 0.6 s on the sf0.1 corpus).
    npairs = F.greatest(F.size(tk) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(tk, 1, npairs).alias("w1"),
        F.slice(tk, 2, npairs).alias("w2"),
    )
    bg = docs.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    uni = (
        docs.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_bigrams = bc.agg(F.sum("pair_count").alias("nb"))
    scored = (
        bc.filter(F.col("pair_count") >= F.lit(int(min_count)))
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .join(F.broadcast(n_bigrams))
        .withColumn(
            "score",
            (F.col("pair_count").cast("double") * F.col("nb").cast("double"))
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double")),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "w1", "w2")
        .limit(int(k))
        .select("w1", "w2", "pair_count", "score")
    )


# ---------------------------------------------------------------------------
# Vocabulary statistics (built-in functions only)
# ---------------------------------------------------------------------------

def vocabulary_stats(
    docs: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Per-language corpus vocabulary statistics — the Heaps/Zipf health
    check of a training corpus: token volume, vocabulary size, hapax
    legomena (frequency-1 types, the noise/typo tail), and the
    type-token ratio.

    Tokenization is the divergence-proof lower+whitespace split shared
    with d03/d09/h03. Output, one row per language:
    (lang, n_tokens, n_types, n_hapax, type_token_ratio) with
    type_token_ratio = n_types / n_tokens as a single double division
    (bit-equal across engines).

    100 TB shape: token explode is map-side; the (lang, token) hash agg
    runs map-side partials (each partition's repeats collapse before the
    shuffle), then a tiny per-language rollup. Never a distinct over raw
    tokens, never a collect.
    """
    tk = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    freq = (
        docs.select(F.col(lang_col).alias("lang"), F.explode(tk).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        freq.groupBy("lang")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("c") == 1, F.lit(1)).otherwise(F.lit(0))).alias(
                "n_hapax"
            ),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            "n_hapax",
            (
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("type_token_ratio"),
        )
    )


def zipf_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf/token-frequency histogram of the corpus: for each power-of-2
    frequency band, how many distinct token types fall in it and how
    many token occurrences they account for. The standard sanity plot
    of a web corpus (a healthy crawl is near-linear in log-log; a
    boilerplate-heavy one bulges at the high-frequency end).

    Bucketing is EXACT integer arithmetic — bucket = number of binary
    digits of the count (floor(log2 c) + 1), computed as the string
    length of the base-2 representation on BOTH engines (Spark `conv`,
    DuckDB `bin`), never a floating log that could straddle an ULP at
    exact powers of two. Output, one row per occupied bucket:
    (bucket, min_count, n_types, total_occurrences) with min_count =
    2^(bucket-1) via shiftleft.

    Tokenization is the divergence-proof lower+whitespace split shared
    with d03/d09/h03/h04.

    100 TB shape: token explode is map-side; the token hash agg runs
    map-side partials; the bucket rollup is ~64 rows. Never a distinct
    over raw tokens, never a collect, no windows.
    """
    tk = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    freq = (
        docs.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bucket = F.length(F.conv(F.col("c").cast("string"), 10, 2)).cast("int")
    return (
        freq.select(bucket.alias("bucket"), "c")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("c").alias("total_occurrences"),
        )
        .select(
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)").alias(
                "min_count"
            ),
            "n_types",
            "total_occurrences",
        )
    )


def length_token_correlation(
    docs: DataFrame,
    group_col: str = "source",
    chars_col: str = "n_chars",
    text_col: str = "text",
) -> DataFrame:
    """Per-group Pearson correlation and OLS slope between the stored
    character count and the observed whitespace token count — the
    metadata-sanity check of a crawl pipeline (a source whose n_chars
    stops tracking its text signals an extraction bug upstream).

    Exactness: the five sufficient statistics (n, sum x, sum y, sum x^2,
    sum y^2, sum x*y) are INTEGER sums over integer inputs — bit-exact
    regardless of aggregation order. The only floating point is the final
    corr = (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
    and slope = (n*sxy - sx*sy) / (n*sxx - sx*sx), each a fixed tree of
    IEEE correctly-rounded ops over exact integers, hence bit-equal with
    the DuckDB oracle. Zero-variance groups yield NULL (identical CASE
    both sides).

    100 TB shape: one map-side-partial hash aggregate over the group key
    — the shuffle carries six numbers per group, nothing else. The long
    accumulators hold to ~9e18 (comfortably past 1e8 docs/group at web
    page sizes); a corpus beyond that should cast the products to
    decimal(38,0) (Spark) / HUGEINT (DuckDB), which keeps exactness.
    """
    x = F.col(chars_col).cast("long")
    y = token_count_col(text_col).cast("long")
    g = docs.select(
        F.col(group_col).alias("grp"), x.alias("x"), y.alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    # rows missing either metric are excluded from n AND the sums —
    # mixing them (count(*) counts the row, SUM skips its NULL) would
    # compute corr/slope from mismatched moments and report a confident
    # wrong correlation; n_docs therefore counts docs with BOTH metrics
    s = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (denx == 0) | (deny == 0), F.lit(None).cast("double")
    ).otherwise(
        num.cast("double")
        / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double")))
    )
    slope = F.when(denx == 0, F.lit(None).cast("double")).otherwise(
        num.cast("double") / denx.cast("double")
    )
    return s.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_docs"),
        F.col("sx").alias("chars_sum"),
        F.col("sy").alias("tokens_sum"),
        corr.alias("corr_chars_tokens"),
        slope.alias("ols_slope"),
    )


# ---------------------------------------------------------------------------
# BM25 keyword search (built-in functions only)
# ---------------------------------------------------------------------------

def _eq_lit(t: str):
    """One-arg HOF predicate `x == lit(t)` — a closure factory, NOT a
    default-arg lambda: a second parameter (even a defaulted one) makes
    Spark bind the (element, index) two-arg lambda form and pass the
    array index where the literal was expected."""
    return lambda x: x == F.lit(t)


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a literal keyword query by BM25 — the
    retrieval primitive a training-data pipeline needs for targeted
    corpus audits ("show me the docs about X") and decontamination
    triage. Engine requirement; no reference counterpart.

    The idf factor is the RATIONAL Robertson form
    ``(N - df + 0.5) / (df + 0.5)`` without the usual ln() wrapper —
    log is monotone so no per-query ranking changes, and +,-,*,/ are
    IEEE-correctly-rounded in every engine while ln is not, so the
    score doubles are bit-reproducible in the DuckDB oracle (the t13
    pattern). The per-term scores are summed in the LITERAL term-list
    order as one left-chained addition (the s02 fold discipline), never
    an unordered SQL SUM, so the total is FP-deterministic.

    Output: (doc_id, score, rank), rank 1..k by (score DESC, doc_id ASC)
    — a total order. Documents matching no term score 0 and still rank
    (k small; the filter `score > 0` is the caller's choice).

    100 TB shape: ONE scan computes per-doc tf for every term plus the
    doc length; N / total token count / per-term df are a single tiny
    aggregate broadcast back (no shuffle of the corpus itself); the
    top-k is a TakeOrderedAndProject, never a full sort.
    """
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be a non-empty list of distinct tokens")
    # NULL text scores like an empty doc (0.0) instead of propagating
    # NULL sizes into engine-divergent NULL ordering
    tk = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    per = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tk).cast("long").alias("dl"),
        *[
            F.size(F.filter(tk, _eq_lit(t))).cast("long").alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    j = per.crossJoin(F.broadcast(stats))
    n_d = F.col("n").cast("double")
    # dl/avgdl as (dl * N) / total — two exact ints, one double division
    dlnorm = (F.col("dl") * F.col("n")).cast("double") / F.col("total_dl").cast(
        "double"
    )
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        idf = (n_d - df + F.lit(0.5)) / (df + F.lit(0.5))
        term_score = (idf * (tf * F.lit(k1 + 1.0))) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dlnorm)
        )
        score = term_score if score is None else score + term_score
    # global top-k as TakeOrderedAndProject (never a full sort), then
    # rank via the k-row collect_list -> array_sort -> posexplode fold
    # (the kmeans_pivots pattern) — no single-partition WindowExec.
    topk = (
        j.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    return (
        topk.agg(
            F.array_sort(
                F.collect_list(F.struct((-F.col("score")).alias("_ns"), "doc_id", "score"))
            ).alias("_r")
        )
        .select(F.posexplode("_r").alias("_pos", "_s"))
        .select(
            F.col("_s.doc_id").alias("doc_id"),
            F.col("_s.score").alias("score"),
            (F.col("_pos") + F.lit(1)).cast("int").alias("rank"),
        )
    )


def token_freq_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-frequency quality score — the SQL-exact stand-in for the
    CCNet-style language-model filter: score each document by the mean
    CORPUS frequency of its tokens. Documents full of rare/garbage
    tokens score low; boilerplate-common text scores high. Unlike the
    intra-document t04/t11 rules this is a CROSS-document signal (the
    corpus unigram table is the "model").

    FP discipline: the per-document numerator is a SUM OF INTEGERS
    (global count of each token occurrence, exact in any aggregation
    order), and the score is ONE double division
    ``freq_sum / (n_tokens * total_tokens)`` — never a floating log
    (the mean-log-prob form ranks identically on monotone grounds but
    ln is not correctly rounded across engines; the t13/t18 rational
    pattern).

    Output: (doc_id, n_tokens, freq_sum, score). Empty docs: n_tokens 0,
    score NULL.

    100 TB shape: everything derives from ONE (doc, token) count
    aggregate `tfd` (token repeats collapse map-side BEFORE any join, so
    the corpus-granularity rows are shuffled once, never joined raw);
    its Exchange is shared via AQE ReuseExchange, leaving at most TWO
    text scans in the final plan (pinned by
    test_token_freq_score_plan_reuses_tfd; persist tfd to cut to one on
    a very large corpus). unigram is vocabulary-sized; total is a
    broadcast scalar; freq_sum = sum(c_dw * c_w) over the tfd x unigram
    equi-join — identical integers to joining raw occurrences.
    Engine requirement; no reference counterpart.
    """
    tk = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tk).alias("w"))
    tfd = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c_dw"))
    unigram = tfd.groupBy("w").agg(F.sum("c_dw").alias("c"))
    # total over tfd, not unigram: same integer, but the lineage is the
    # SAME tfd exchange the other branches consume, so it reuses too
    total = tfd.agg(F.sum("c_dw").alias("total"))
    per_doc = (
        tfd.join(unigram, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c_dw").alias("n_tokens"),
            F.sum(F.col("c_dw") * F.col("c")).alias("freq_sum"),
        )
    )
    # docs whose every token was filtered out (or empty) re-enter with 0
    base = docs.select(F.col(id_col).alias("doc_id")).join(
        per_doc, "doc_id", "left"
    )
    n_tok = F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
    f_sum = F.coalesce(F.col("freq_sum"), F.lit(0)).cast("long")
    return base.crossJoin(F.broadcast(total)).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        f_sum.alias("freq_sum"),
        F.when(
            n_tok > 0,
            f_sum.cast("double")
            / (n_tok * F.col("total")).cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("score"),
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-`vocab_size` vocabulary — the classic "does this page speak the
    corpus's language" quality signal (high OOV = boilerplate, code dumps,
    non-prose).

    Tokenization is the divergence-proof lower+whitespace split shared
    with d03/d09/h03. The vocabulary is the top `vocab_size` tokens by
    (count DESC, token ASC) — the tie-break makes the cut total, so the
    member set is deterministic. Counts are exact int64; oov_rate is ONE
    IEEE division of them (bit-reproducible cross-engine). Zero-token
    documents vanish (no exploded rows), matching the SQL oracle.

    100 TB shape: token explode is map-side and linear; the vocab agg runs
    map-side partials and its top-K is a TakeOrderedAndProject (never a
    global sort); the vocab (vocab_size rows) broadcasts to the per-token
    membership join; the per-document agg is map-side partial again. Two
    passes over the exploded tokens, zero quadratic terms.
    """
    tk = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    toks = docs.select(F.col(id_col), F.explode(tk).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), on="tok", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
            "oov_rate"
        ),
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for training: concatenate each stratum's documents
    (in `id_col` order) into one token stream and chunk it into bins of
    `capacity` tokens — every document gets its (bin, offset) coordinates
    in the packed stream. This is the document-spanning packing used by
    LLM pretraining loaders (a doc whose tokens straddle a boundary starts
    in `bin_id` at `bin_offset` and spills into the next bin).

    All arithmetic is int64: a running SUM window under the total
    (stratum, id) order, then DIV/% against the capacity. Zero-token
    documents keep a row (their start offset is well-defined; they occupy
    no tokens).

    100 TB shape: ONE shuffle on the stratum key; the window's running sum
    needs each stratum sorted in one task — strata are languages/sources
    (dozens to thousands), so a single hot stratum should be pre-split by
    a coarse md5(id) prefix into sub-strata (packing within sub-strata is
    still valid packing — bins never mix strata either way). No collects,
    no Python.
    """
    from pyspark.sql.window import Window

    if capacity <= 0:
        raise ValueError(f"capacity must be positive: {capacity}")
    # NULL text occupies zero tokens (COALESCE before counting) — unlike
    # token_count_col, which propagates NULL; a packed stream must assign
    # every document a coordinate, so missing text means "empty doc here",
    # not "no row".
    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    n_tokens = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.filter(F.split(trimmed, r"\s+"), lambda x: x != ""))
    )
    base = docs.select(
        F.col(strat_col),
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strat_col)
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = base.withColumn("_cum", F.sum("n_tokens").over(w))
    start = F.col("_cum") - F.col("n_tokens")
    return with_cum.select(
        strat_col,
        id_col,
        "n_tokens",
        start.alias("start_offset"),
        F.expr(f"(_cum - n_tokens) DIV {int(capacity)}").alias("bin_id"),
        (start % F.lit(int(capacity))).alias("bin_offset"),
    )


def token_novelty(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document vocabulary novelty: the fraction of a document's
    DISTINCT tokens whose first corpus appearance (minimum `id_col` over
    all documents containing the token) is this document. A
    dedup-adjacent curation signal — near-zero novelty late in the
    corpus means the document re-treads existing vocabulary.

    Tokenization is the d03/d09/h03 lower+whitespace split; counts exact
    int64; novelty is ONE IEEE division. Ties are impossible by
    construction (MIN over ids is unique per token).

    100 TB shape: distinct-token explode is map-side (array_distinct
    inside the row), the first-appearance MIN agg and the per-doc rollup
    both run map-side partials, the join is a token-key equi-join; no
    windows, no collects. Zero-token documents vanish (no rows), like
    the SQL oracle.
    """
    tk = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    per_tok = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tk)).alias("tok")
    )
    first = per_tok.groupBy("tok").agg(F.min(id_col).alias("_first_doc"))
    per_doc = (
        per_tok.join(first, on="tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.when(F.col("_first_doc") == F.col(id_col), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        id_col,
        "n_distinct",
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_distinct").cast("double")).alias(
            "novelty"
        ),
    )


def dup_ngram_stats(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document duplicated-n-gram coverage (the Gopher "fraction
    of characters in duplicated n-grams" family, token-position form):
    per document, the number of token n-gram POSITIONS whose gram occurs
    at least twice in the same document, over all n-gram positions.
    High duplication = TEMPLATE/boilerplate text that t10's single
    top-bigram signal can miss.

    Grams build in-row from the lower+whitespace token split (the
    d03/h03 tokenization) via a transform(sequence) window — no
    cross-document state; the (doc, gram) hash aggregate runs map-side
    partials, and the per-doc rollup sums exact int64 counts. dup_frac
    is ONE IEEE division. Documents with fewer than n tokens vanish
    (no gram positions), matching the SQL oracle.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2: {n}")
    tk = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    d = docs.select(F.col(id_col), tk.alias("_toks")).filter(
        F.size("_toks") >= n
    )
    joins = ", ".join(
        f"element_at(_toks, i + {k})" for k in range(n)
    )
    grams = d.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_toks) - {n - 1}), "
                f"i -> concat_ws(' ', {joins}))"
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("_c").alias("n_grams"),
        F.sum(F.when(F.col("_c") >= 2, F.col("_c")).otherwise(F.lit(0))).alias(
            "n_dup_positions"
        ),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_dup_positions",
        (
            F.col("n_dup_positions").cast("double")
            / F.col("n_grams").cast("double")
        ).alias("dup_frac"),
    )


def word_length_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language word-length distribution: for every (lang, length)
    stratum, the token count, the distinct-token count, and the share of
    the language's token mass at that length — the corpus-morphology
    profile used to sanity-check tokenizer and language-ID output (a
    language whose length histogram shifts between crawls has a
    extraction regression).

    Tokenization is the proven-parity lower+trim+whitespace split
    (d03/t20 pattern); lengths and counts are exact int64, and the share
    is ONE division of two exact integers per output row — bit-stable on
    any IEEE engine.

    Scale shape: explode feeds a (lang, length) hash aggregate with
    map-side partials (the token stream never shuffles raw — only the
    tiny per-stratum partials); the per-language total then rides a
    window over the AGGREGATED frame (#langs x #lengths rows, not
    tokens). Distinct-token counts shuffle (lang, length, token) partial
    sets — the standard two-level distinct aggregate Spark plans on its
    own.
    """
    from pyspark.sql.window import Window

    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    exploded = docs.select(
        F.col("lang"), F.explode(toks).alias("_tok")
    ).select("lang", F.length("_tok").alias("word_len"), "_tok")
    per = exploded.groupBy("lang", "word_len").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("_tok").alias("n_distinct_tokens"),
    )
    wt = Window.partitionBy("lang")
    return per.select(
        "lang",
        "word_len",
        "n_tokens",
        "n_distinct_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(wt).cast("double")
        ).alias("share"),
    )
