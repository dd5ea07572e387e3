"""Output sinks: bucketed parquet writes + CSV export.

- write_outputs: parquet partitioned by a conv_id hash bucket with
  (conv_id, turn_idx / row ordering) sorted within partitions — the
  Iceberg-style bucket(N, conv_id) + sort-order layout SURVEY.md §4
  maps the reference's b-tree indexes onto (min/max pruning replaces
  point lookups).
- export_records_csv: the reference's CSV export (api/documents.py:
  241-282) — records joined to conversations, ordered, with the XLSX
  signed-amount rule (api/documents.py:585-772: signed = -abs(amount)
  when direction == DEBIT) kept as a column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

DEFAULT_BUCKETS = 64


def signed_amount_col(amount_col, direction_col):
    """XLSX export rule: debits negative, credits positive."""
    return F.when(direction_col == "DEBIT", -F.abs(amount_col)) \
            .otherwise(F.abs(amount_col))


def write_outputs(outputs: dict[str, DataFrame], out_dir: str,
                  n_buckets: int = DEFAULT_BUCKETS) -> None:
    """Bucketed, sorted parquet layout for every output table."""
    order_keys = {
        "turns": ["conv_id", "turn_idx"],
        "records": ["conv_id", "segment_index", "row_index"],
        "segments": ["conv_id", "segment_index"],
        "conversations": ["conv_id"],
    }
    for name, df in outputs.items():
        if name.startswith("_"):
            continue
        keys = order_keys.get(name, ["conv_id"])
        bucketed = df.withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)))
        (bucketed.repartition("bucket")
         .sortWithinPartitions(*keys)
         .write.mode("overwrite")
         .partitionBy("bucket")
         .parquet(f"{out_dir}/{name}"))


def export_records_csv(records: DataFrame, conversations: DataFrame,
                       path: str) -> None:
    """Reference CSV export: records x conversations, stable order."""
    joined = records.join(
        F.broadcast(conversations.select(
            "conv_id", "doc_family", "provider", "account_holder_name")),
        "conv_id", "inner")
    out = joined.select(
        "conv_id", "segment_index", "row_index", "turn_idx",
        "posted_date", "description_clean", "amount", "direction",
        signed_amount_col(F.col("amount"), F.col("direction")).alias("signed_amount"),
        "running_balance", "balance_confirmed",
        "doc_family", "provider", "account_holder_name",
    ).orderBy("conv_id", "segment_index", "row_index")
    out.write.mode("overwrite").option("header", True).csv(path)
