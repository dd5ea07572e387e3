"""Stage 5 — conversation rollup: confidence scoring, statuses.

Native aggregations only.  Parity with the integrated reference path
(orchestrator.py:389-417 + confidence_scorer.py:26-70):

  document_confidence = round(0.35*recon + 0.25*mean_balance_conf
                            + 0.20*mean_direction + 0.10*mean_amount
                            + 0.10*mean_date, 4)
  with confidence_balance := 0.8 if balance_confirmed else 0.0
  (orchestrator.py:398), and validation/final status straight from
  the PASS/WARN/FAIL thresholds 0.85/0.70/0.50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..kernels.classify import (
    CONFIDENCE_FAIL_THRESHOLD,
    CONFIDENCE_PASS_THRESHOLD,
    CONFIDENCE_WARN_THRESHOLD,
    DOCUMENT_WEIGHTS,
)


def conversations_table(conv_meta: DataFrame, records: DataFrame) -> DataFrame:
    """classification rollup x record aggregates -> conversations."""
    agg = records.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("row_count"),
        F.avg(F.col("confidence_amount").cast("double")).alias("_mean_amount"),
        F.avg(F.col("confidence_direction").cast("double")).alias("_mean_direction"),
        F.avg(F.col("confidence_date").cast("double")).alias("_mean_date"),
        F.avg(F.when(F.col("balance_confirmed"), F.lit(0.8)).otherwise(F.lit(0.0))).alias("_mean_balance"),
        F.avg(F.col("balance_confirmed").cast("double")).alias("_recon_rate"),
        (F.max("segment_index") + 1).cast("int").alias("_n_rec_segments"),
    )

    df = conv_meta.join(agg, "conv_id", "left")
    df = df.fillna({"row_count": 0, "_mean_amount": 0.0, "_mean_direction": 0.0,
                    "_mean_date": 0.0, "_mean_balance": 0.0, "_recon_rate": 0.0})

    weighted = (
        F.lit(DOCUMENT_WEIGHTS["reconciliation_rate"]) * F.col("_recon_rate")
        + F.lit(DOCUMENT_WEIGHTS["mean_balance_confidence"]) * F.col("_mean_balance")
        + F.lit(DOCUMENT_WEIGHTS["mean_direction_confidence"]) * F.col("_mean_direction")
        + F.lit(DOCUMENT_WEIGHTS["mean_amount_confidence"]) * F.col("_mean_amount")
        + F.lit(DOCUMENT_WEIGHTS["mean_date_confidence"]) * F.col("_mean_date")
    )
    df = df.withColumn("document_confidence", F.round(weighted, 4))
    df = df.withColumn("reconciliation_rate", F.round(F.col("_recon_rate"), 4))

    c = F.col("document_confidence")
    df = df.withColumn(
        "validation_status",
        F.when(c >= CONFIDENCE_PASS_THRESHOLD, "PASS")
         .when(c >= CONFIDENCE_WARN_THRESHOLD, "PASS_WITH_WARNINGS")
         .when(c >= CONFIDENCE_FAIL_THRESHOLD, "NEEDS_REVIEW")
         .otherwise("FAIL"),
    ).withColumn(
        "final_status",
        F.when(c >= CONFIDENCE_WARN_THRESHOLD, "COMPLETED").otherwise("NEEDS_REVIEW"),
    )
    return df.select(
        "conv_id", "doc_family", "doc_family_confidence",
        "provider", "provider_confidence",
        "account_holder_name", "account_holder_address", "account_holder_postcode",
        "document_confidence", "reconciliation_rate",
        "validation_status", "final_status", "row_count",
    )
