"""Stage 1 — tokenize + boilerplate strip (shuffle-free).

Maps each transcript turn through the layout kernel
(kernels/layout.py) with ONE Arrow round trip: a struct-returning
scalar pandas UDF computes raw_text (reading-order reconstruction),
clean_text + spans (boilerplate strip, the north-rule primary
output), top_text (segmenter band) and token/line counts.

Engine selection mirrors the reference's text-layer probe
(app/engines/pdfplumber_engine.py:169-185 routing,
orchestrator.py:259-275): a turn whose `text` is non-empty takes the
TEXT path; otherwise a non-empty `tool` payload takes the TOOL path
(the OCR-fallback analogue, producing the identical shape,
app/engines/tesseract_engine.py:82-169); else EMPTY.

No shuffle: the whole stage pipelines inside the scan stage, and
Catalyst prunes unused transcript columns away from the parquet read.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..kernels.layout import TOOL_TOKEN_CONFIDENCE, turn_view_batch

VIEW_TYPE = StructType([
    StructField("raw_text", StringType(), False),
    StructField("top_text", StringType(), False),
    StructField("clean_text", StringType(), False),
    StructField("span_starts", ArrayType(IntegerType()), False),
    StructField("span_ends", ArrayType(IntegerType()), False),
    StructField("n_lines", IntegerType(), False),
    StructField("n_tokens", IntegerType(), False),
])


@pandas_udf(VIEW_TYPE)
def _turn_view_udf(payload: pd.Series) -> pd.DataFrame:
    return turn_view_batch(payload)


def tokens_table(transcripts: DataFrame) -> DataFrame:
    """Diagnostic token-IR surface (contracts.py:20-26 analogue).

    One row per token with normalized [0,1] bbox, source-path tag and
    char offsets into the original turn text — the NormalizedPage
    token list as an exploded columnar table.  Not on the hot path;
    used for layout debugging and external token consumers.
    """
    import pandas as pd  # noqa: F811

    from pyspark.sql.types import DoubleType

    from ..kernels.layout import tokenize_turn
    from ..schemas import TOKEN_TYPE

    out_schema = StructType([
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("token_index", IntegerType(), False),
    ] + list(TOKEN_TYPE.fields))

    def run(batches):
        for pdf in batches:
            text_ok = pdf["text"].notna() & (pdf["text"] != "")
            tool_ok = pdf["tool"].notna() & (pdf["tool"] != "")
            payload = pdf["text"].where(text_ok, pdf["tool"].where(tool_ok, ""))
            is_tool = (~text_ok) & tool_ok
            rows = []
            for conv_id, turn_idx, text, via_tool in zip(
                    pdf["conv_id"], pdf["turn_idx"], payload, is_tool):
                tokens, _ = tokenize_turn(text)
                for i, t in enumerate(tokens):
                    conf = TOOL_TOKEN_CONFIDENCE if via_tool else t["confidence"]
                    rows.append((conv_id, int(turn_idx), i, t["text"],
                                 t["x0"], t["y0"], t["x1"], t["y1"],
                                 conf, t["start"], t["end"]))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return transcripts.select("conv_id", "turn_idx", "text", "tool") \
                      .mapInPandas(run, schema=out_schema)


def tokenize_stage(transcripts: DataFrame) -> DataFrame:
    """transcripts -> + (extraction_path, payload, view columns)."""
    text_ok = F.col("text").isNotNull() & (F.col("text") != "")
    tool_ok = F.col("tool").isNotNull() & (F.col("tool") != "")
    df = transcripts.withColumn(
        "extraction_path",
        F.when(text_ok, F.lit("TEXT"))
         .when(tool_ok, F.lit("TOOL"))
         .otherwise(F.lit("EMPTY")),
    ).withColumn(
        "payload",
        F.when(text_ok, F.col("text"))
         .when(tool_ok, F.col("tool"))
         .otherwise(F.lit("")),
    )
    df = df.withColumn("view", _turn_view_udf(F.col("payload")))
    return df.select(
        "conv_id", "turn_idx", "role", "ts", "extraction_path", "payload",
        F.col("view.raw_text").alias("raw_text"),
        F.col("view.top_text").alias("top_text"),
        F.col("view.clean_text").alias("clean_text"),
        F.col("view.span_starts").alias("span_starts"),
        F.col("view.span_ends").alias("span_ends"),
        F.col("view.n_lines").alias("n_lines"),
        F.col("view.n_tokens").alias("n_tokens"),
        # PageMetrics analogue (contracts.py:67-80): text-path tokens
        # carry fixed 0.95 (pdfplumber_engine.py:125,154); TOOL-path
        # turns carry the OCR-analogue tier 0.88 (see kernels.layout.
        # TOOL_TOKEN_CONFIDENCE); the 50-token quick sample
        # (tesseract_engine.py:195-212) equals the page mean when
        # per-token confidence is constant, so one column serves both
        F.when(F.col("view.n_tokens") <= 0, F.lit(0.0))
         .when(F.col("extraction_path") == "TOOL", F.lit(TOOL_TOKEN_CONFIDENCE))
         .otherwise(F.lit(0.95))
         .alias("mean_token_confidence"),
    )
