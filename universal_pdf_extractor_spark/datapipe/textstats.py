"""Text analysis operators: token counting, quality scoring,
language id, document fingerprinting.

All-native column expressions (JVM-side, SQL-oracle-checkable) except
the rolling-hash fingerprint, which is a deterministic arithmetic
fold over tokens (still no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "en", "que", "por", "con"],
}

EN_STOPWORDS = LANG_PROFILES["en"] + ["on", "with", "as", "this", "was", "are"]

# polynomial rolling-hash field: 31-bit Mersenne prime keeps every
# intermediate (h*BASE + term) far below int64 under ANSI mode
ROLLING_MOD = (1 << 31) - 1
ROLLING_BASE = 131


def tokens_col(text_col):
    """Whitespace tokenization (empty string -> empty array)."""
    trimmed = F.trim(F.regexp_replace(text_col, r"\s+", " "))
    return F.when(trimmed == "", F.array().cast("array<string>")) \
            .otherwise(F.split(trimmed, " "))


def token_count(documents: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (ceil(chars/4) per token, the common 4-chars-per-token rule)."""
    toks = tokens_col(F.col(text_col))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"))
         .alias("n_subwords_est"),
    )


def quality_scores(documents: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase quality signals.

    Columns: n_chars, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio, upper_ratio, digit_ratio, quality_score in [0,1].
    """
    t = F.col(text_col)
    toks = tokens_col(t)
    n_chars = F.length(t).cast("double")
    n_tokens = F.size(toks).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    safe_tokens = F.greatest(n_tokens, F.lit(1.0))

    lowered = F.transform(toks, lambda x: F.lower(x))
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stopword_ratio = F.size(F.filter(lowered, lambda x: F.array_contains(stop_arr, x))) / safe_tokens

    punct_ratio = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))) / safe_chars
    upper_ratio = (n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))) / safe_chars
    digit_ratio = (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))) / safe_chars
    mean_token_len = F.aggregate(toks, F.lit(0).cast("long"),
                                 lambda acc, x: acc + F.length(x)) / safe_tokens

    # C4-style heuristic: long enough, mostly words, some stopwords,
    # not punctuation/digit soup
    quality = (
        F.least(n_tokens / 50.0, F.lit(1.0)) * 0.3
        + F.least(stopword_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(digit_ratio * 4.0, F.lit(1.0))) * 0.2
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_token_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def language_id(documents: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-profile language guess (argmax hit-rate, 'und' if 0)."""
    toks = F.transform(tokens_col(F.col(text_col)), lambda x: F.lower(x))
    safe_tokens = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    candidates = []
    for order, (lang, words) in enumerate(LANG_PROFILES.items()):
        arr = F.array(*[F.lit(w) for w in words])
        rate = F.size(F.filter(toks, lambda x: F.array_contains(arr, x))) / safe_tokens
        candidates.append(F.struct(rate.alias("rate"),
                                   F.lit(-order).alias("neg_order"),
                                   F.lit(lang).alias("lang")))
    best = F.greatest(*candidates)
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["rate"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        F.round(best["rate"], 6).alias("stopword_hit_rate"),
    )


def fingerprints(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Polynomial rolling hash over normalized tokens (no UDF).

    fold: h <- (h * BASE + (hash60(token) mod M)) mod M, in token
    order — order-sensitive unlike a bag-of-words hash.  hash60 (60-bit
    md5 prefix) rather than xxhash64 so the whole fold is reproducible
    in ANSI SQL and the driver's DuckDB oracle checks it exactly.
    """
    from .dedup import hash60

    toks = tokens_col(F.lower(F.col(text_col)))
    rolling = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(ROLLING_BASE)
                              + F.pmod(hash60(t), F.lit(ROLLING_MOD)),
                              F.lit(ROLLING_MOD)),
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        rolling.alias("fingerprint"),
        F.sha2(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), 256)
         .alias("content_sha256"),
    )
