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
    silently nulling rows (pass PERMISSIVE to triage).

    The loud-failure contract extends to WELL-FORMED JSON rows that
    are missing the (conv_id, turn_idx) key: under FAILFAST they
    raise on first occurrence (raise_error inside the projection — no
    extra counting pass); under PERMISSIVE they are dropped, which is
    the documented triage behaviour."""
    df = (spark.read
          .schema(TRANSCRIPTS_SCHEMA)
          .option("mode", mode)
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
          .json(path))
    key_ok = F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    if mode.upper() == "FAILFAST":
        # keyless rows raise inside the projection itself; adding a
        # key_ok filter here would be pushed BELOW this projection by
        # Catalyst and silently drop the row before raise_error runs,
        # so the raise is the only guard on the FAILFAST path
        df = df.withColumn(
            "conv_id",
            F.when(key_ok, F.col("conv_id")).otherwise(F.raise_error(F.concat(
                F.lit("read_transcripts_jsonl[FAILFAST]: well-formed JSON row "
                      "with null conv_id/turn_idx (role="),
                F.coalesce(F.col("role"), F.lit("null")),
                F.lit(") — keyless rows fail, not silently drop; "
                      "use mode='PERMISSIVE' to triage")))))
        return df.select(*[F.col(f.name).cast(f.dataType)
                           for f in TRANSCRIPTS_SCHEMA.fields])
    out = df.select(*[F.col(f.name).cast(f.dataType)
                      for f in TRANSCRIPTS_SCHEMA.fields])
    # key fields are non-null in the engine contract; a JSON scan is
    # nullable-by-construction, so enforce here (PERMISSIVE triage
    # mode: documented drop)
    return out.where(key_ok)


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
