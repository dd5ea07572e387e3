"""Stage 3 — conversation-level classification (native regex folds).

Parity with the integrated reference path (orchestrator.py:316-345):
classification, provider detection and customer-info extraction all
run over ONE combined string — '\\n'.join of the non-empty per-turn
raw_texts in turn order.

- doc classifier (doc_classifier.py:62-105): per-keyword weighted
  additions chained in pattern order (fp-order parity), capped at
  1.0, argmax with a 0.3 floor;
- provider detector (provider_detector.py:99-127): per-provider match
  counts * 0.4 capped at 1.0; best score wins, first-seen provider
  wins ties (greatest over (score, -order, name) structs);
- customer info (orchestrator.py:79-146): postcode anchor + walk-back
  block — a sequential scan, so it stays in a small pandas UDF over
  the one-row-per-conversation frame.

The groupBy(conv_id) reuses the segment stage's hash exchange when
chained after it; classification itself adds no UDF over turn rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from ..kernels.classify import (
    BANK_STATEMENT_WEIGHT,
    CLASSIFY_FLOOR,
    CURRENCY_PATTERN_STRINGS,
    MOTOR_FINANCE_WEIGHT,
    PROVIDER_MATCH_WEIGHT,
)
from ..kernels.customer import extract_customer_info
from ..kernels.patterns import (
    BANK_STATEMENT_KEYWORDS,
    MOTOR_FINANCE_KEYWORDS,
    PROVIDER_PATTERNS,
    _noncapturing,
    pattern_literal,
)

_CUSTOMER_TYPE = StructType([
    StructField("account_holder_name", StringType(), True),
    StructField("account_holder_address", StringType(), True),
    StructField("account_holder_postcode", StringType(), True),
])


@pandas_udf(_CUSTOMER_TYPE)
def _customer_udf(conv_text: pd.Series) -> pd.DataFrame:
    rows = [extract_customer_info(t or "") for t in conv_text]
    return pd.DataFrame(rows, index=conv_text.index)


def _guarded_match(text_col: Column, pattern: str) -> Column:
    """rlike guarded by a cheap mandatory-literal contains() prefilter.

    Semantically identical to a bare rlike: the literal is required by
    every alternative of the pattern, so contains()==false implies the
    regex cannot match; contains() is a fast JVM indexOf over text the
    regex engine would otherwise scan position-by-position."""
    lit = pattern_literal(pattern)
    probe = text_col.rlike(_noncapturing(pattern))
    if lit is None:
        return probe
    return text_col.contains(lit) & probe


def _keyword_score(text_col: Column, patterns: list[str], weight: float) -> Column:
    """Chained weighted additions in pattern order, capped at 1.0."""
    score = F.lit(0.0)
    for p in patterns:
        score = score + F.when(_guarded_match(text_col, p), F.lit(weight)).otherwise(F.lit(0.0))
    return F.least(score, F.lit(1.0))


def _provider_best(text_col: Column) -> Column:
    """greatest((score, -order, name)) -> first-seen wins ties."""
    candidates = []
    for order, (provider, patterns) in enumerate(PROVIDER_PATTERNS.items()):
        matches = sum(
            (F.when(_guarded_match(text_col, p), F.lit(1)).otherwise(F.lit(0))
             for p in patterns),
            start=F.lit(0),
        )
        score = F.least(matches.cast("double") * F.lit(PROVIDER_MATCH_WEIGHT), F.lit(1.0))
        candidates.append(F.struct(score.alias("score"),
                                   F.lit(-order).alias("neg_order"),
                                   F.lit(provider).alias("name")))
    return F.greatest(*candidates)


# Bounded classification scan: the reference classifies over a whole
# document's text, which is fine for <=50-page statements but unbounded
# for transcripts.  Conversations beyond this many characters classify
# on their prefix — the same bounded-scan rule the reference applies
# elsewhere (10-line header scan, 50-line customer scan, 3-page
# provider scan; SURVEY §2.9 O2-O5).  Far above any fixture
# conversation (~0.25 MB max), so parity is unaffected; at 10^12-turn
# scale it bounds the collect_list row size.
CLASSIFY_CHAR_CAP = 2_000_000


def conversation_text(turns: DataFrame,
                      char_cap: int = CLASSIFY_CHAR_CAP,
                      extra_aggs: tuple = ()) -> DataFrame:
    """conv_id -> combined '\\n'-joined non-empty raw_texts in order
    (prefix-capped at ``char_cap`` cumulative characters).

    ``extra_aggs``: additional aggregate expressions computed in the
    SAME groupBy — callers that need other per-conversation aggregates
    (e.g. the pipeline's n_segments) fold them into this pass instead
    of paying a second full aggregation over the turns frame."""
    from pyspark.sql import Window
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.length(F.col("raw_text")) + F.lit(1)).over(w)
    # the first turn is ALWAYS included even when it alone exceeds the
    # cap — otherwise an oversized opening turn yields conv_text='' and
    # a silent UNKNOWN classification instead of classifying on a
    # truncated-to-one-turn prefix (same window spec, so no new sort)
    rn = F.row_number().over(Window.partitionBy("conv_id").orderBy("turn_idx"))
    # collect_list drops the when()'s nulls -> over-cap turns excluded
    # without a second aggregation or join; the window reuses the
    # segment stage's exchange + sort
    in_cap = F.when((rn == 1) | (cum <= char_cap),
                    F.struct("turn_idx", "raw_text"))
    return turns.withColumn("_in_cap", in_cap).groupBy("conv_id").agg(
        F.array_join(F.filter(
            F.transform(F.array_sort(F.collect_list("_in_cap")),
                        lambda x: x["raw_text"]),
            lambda t: t != ""), "\n").alias("conv_text"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        *extra_aggs,
    )


def classify_stage(turns: DataFrame, extra_aggs: tuple = (),
                   extra_cols: tuple = ()) -> DataFrame:
    """turns -> one row per conversation with family/provider/customer
    (+ any ``extra_aggs`` passed through as ``extra_cols``)."""
    # materialize the lowered text once: ~70 rlike probes reference it,
    # and Catalyst does not CSE lower() across all of them
    conv = conversation_text(turns, extra_aggs=extra_aggs) \
        .withColumn("_lowered", F.lower(F.col("conv_text")))
    lowered = F.col("_lowered")

    mf = _keyword_score(lowered, MOTOR_FINANCE_KEYWORDS, MOTOR_FINANCE_WEIGHT)
    bs = _keyword_score(lowered, BANK_STATEMENT_KEYWORDS, BANK_STATEMENT_WEIGHT)

    conv = conv.withColumn("_mf", mf).withColumn("_bs", bs)
    conv = conv.withColumn(
        "doc_family",
        F.when((F.col("_bs") > F.col("_mf")) & (F.col("_bs") >= CLASSIFY_FLOOR),
               F.lit("BANK_STATEMENT"))
         .when((F.col("_mf") > F.col("_bs")) & (F.col("_mf") >= CLASSIFY_FLOOR),
               F.lit("MOTOR_FINANCE"))
         .otherwise(F.lit("UNKNOWN")),
    ).withColumn(
        "doc_family_confidence",
        F.when(F.col("doc_family") == "BANK_STATEMENT", F.col("_bs"))
         .when(F.col("doc_family") == "MOTOR_FINANCE", F.col("_mf"))
         .otherwise(F.greatest(F.col("_bs"), F.col("_mf"))),
    )

    best = _provider_best(lowered)
    conv = conv.withColumn("_best", best).withColumn(
        "provider",
        F.when(F.col("_best.score") > 0, F.col("_best.name")),
    ).withColumn(
        "provider_confidence",
        F.when(F.col("_best.score") > 0, F.col("_best.score")),
    )

    # currency = most frequent marker, GBP default (detect_currency);
    # greatest((count, -order, name)) gives the kernel's first-max rule
    ccy_candidates = [
        F.struct(F.regexp_count(lowered, F.lit(pat)).alias("n"),
                 F.lit(-order).alias("neg_order"),
                 F.lit(ccy).alias("name"))
        for order, (ccy, pat) in enumerate(CURRENCY_PATTERN_STRINGS)
    ]
    best_ccy = F.greatest(*ccy_candidates)
    conv = conv.withColumn(
        "currency",
        F.when(best_ccy["n"] > 0, best_ccy["name"]).otherwise(F.lit("GBP")))

    # customer info only reads the first 50 lines (orchestrator.py:94-99);
    # slice JVM-side so the UDF ships ~2KB per conversation, not the
    # whole text — the kernel re-slices identically, so parity holds
    head_text = F.array_join(F.slice(F.split(F.col("conv_text"), "\n"), 1, 50), "\n")
    conv = conv.withColumn("_cust", _customer_udf(head_text))
    return conv.select(
        "conv_id", "n_turns", "doc_family", "doc_family_confidence",
        "provider", "provider_confidence", "currency",
        F.col("_cust.account_holder_name").alias("account_holder_name"),
        F.col("_cust.account_holder_address").alias("account_holder_address"),
        F.col("_cust.account_holder_postcode").alias("account_holder_postcode"),
        *extra_cols,
    )
