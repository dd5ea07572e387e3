"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full transcripts-extraction pipeline at
                sf0.001 (deterministic synthetic corpus, FIXTURES.md),
                returning the per-turn main-content table.
queries()     — operator catalogue (SURVEY.md §2 + training-data ops),
                see universal_pdf_extractor_spark/entry_queries.py.
oracle_sql()  — DuckDB equivalents for every SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from universal_pdf_extractor_spark import entry_queries
from universal_pdf_extractor_spark.io.fixtures import n_convs_for_sf, transcripts_sdf
from universal_pdf_extractor_spark.stages.pipeline import run_pipeline


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-turn main-content extraction (clean_text +
    span offsets + segment ids) over the sf0.001 transcripts corpus."""
    transcripts = transcripts_sdf(spark, n_convs_for_sf(0.001), partitions=8)
    turns = run_pipeline(transcripts)["turns"]
    return turns.select(
        "conv_id", "turn_idx", "role", "extraction_path",
        "clean_text", "spans", "segment_index", "n_lines", "n_tokens",
    ).orderBy("conv_id", "turn_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
