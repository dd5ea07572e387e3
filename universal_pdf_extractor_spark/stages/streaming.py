"""Structured Streaming surface.

The reference is batch-per-document (SURVEY.md §2.11: RQ queue ≈
micro-batch trigger), but the per-turn half of this engine — tokenize,
reading-order rebuild, boilerplate strip, span offsets, boundary
scoring — is stateless per row, so the SAME stage functions run
unchanged under ``readStream``:

    stream_turns: file-stream of transcript parquet -> per-turn
        main-content rows, append mode (exactly the batch tokenize
        stage + native boundary score; no state store needed).
    stream_conversation_activity: watermarked session windows over
        turn timestamps -> turns-per-conversation-session counts
        (late data beyond the watermark is dropped, the streaming
        analogue of the run/partition state machine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..schemas import TRANSCRIPTS_SCHEMA
from .segment import boundary_score_col
from .tokenize import tokenize_stage


def stream_turns(spark: SparkSession, input_path: str,
                 max_files_per_trigger: int = 16) -> DataFrame:
    """Streaming per-turn extraction (append-mode safe: stateless)."""
    stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_path))
    turns = tokenize_stage(stream)
    return turns.withColumn("boundary_score", boundary_score_col(F.col("top_text"))) \
                .drop("payload")


def stream_conversation_activity(spark: SparkSession, input_path: str,
                                 gap: str = "30 minutes",
                                 watermark: str = "2 hours") -> DataFrame:
    """Watermarked session-window rollup of turn activity."""
    stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
              .parquet(input_path))
    return (stream.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap), F.col("conv_id"))
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("n_chars"))
            .select(F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "conv_id", "n_turns", "n_chars"))
