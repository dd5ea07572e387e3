"""Interchange sources for the transcripts table.

The engine's canonical input is parquet/Iceberg-style columnar data,
but transcript dumps commonly arrive as JSONL (one turn per line).
These readers/writers enforce the exact engine schema
(schemas.TRANSCRIPTS_SCHEMA) so every downstream stage sees one
contract regardless of the wire format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..schemas import TRANSCRIPTS_SCHEMA


def read_transcripts_jsonl(spark: SparkSession, path: str,
                           mode: str = "FAILFAST") -> DataFrame:
    """JSONL (one turn object per line) -> transcripts DataFrame.

    The explicit schema keeps the read single-pass (no sampling
    inference job) and pushes column pruning into the scan; mode
    defaults to FAILFAST so malformed dumps fail loudly instead of
    silently nulling rows (pass PERMISSIVE to triage)."""
    df = (spark.read
          .schema(TRANSCRIPTS_SCHEMA)
          .option("mode", mode)
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
          .json(path))
    return (df.select(*[F.col(f.name).cast(f.dataType)
                        for f in TRANSCRIPTS_SCHEMA.fields])
            # key fields are non-null in the engine contract; a JSON
            # scan is nullable-by-construction, so enforce here
            .where(F.col("conv_id").isNotNull()
                   & F.col("turn_idx").isNotNull()))


def write_transcripts_jsonl(transcripts: DataFrame, path: str,
                            mode: str = "overwrite") -> None:
    """Transcripts DataFrame -> JSONL directory (ISO-8601 timestamps,
    one turn object per line; null fields omitted per JSON-lines
    convention)."""
    (transcripts
     .select(*[f.name for f in TRANSCRIPTS_SCHEMA.fields])
     .write.mode(mode)
     .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
     .json(path))
