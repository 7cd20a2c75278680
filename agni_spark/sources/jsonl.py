"""JSONL document ingest — the raw landing format of most LLM
training-data pipelines (one JSON object per line: web dumps, Common
Crawl derivatives, vendor deliveries).

Spark-first shape: `spark.read.json` with an EXPLICIT schema (schema
inference over 100 TB of JSONL is a full extra pass — never at scale)
in PERMISSIVE mode with a corrupt-record column, so malformed lines
quarantine into a reviewable side table instead of failing the job or
silently disappearing. The scan parallelizes per file/split like any
text source; downstream operators see the same columns as the parquet
documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, n_chars long, lang string, source string"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document dump -> (good, quarantined).

    good: rows matching `schema` (fields beyond it are ignored —
    forward compatibility with enriched dumps). quarantined: the raw
    text of every malformed line (unparseable JSON), for audit/replay.
    A line that parses but has a wrong TYPE for a declared field also
    lands in quarantine (Spark nulls the row and keeps the raw text in
    the corrupt column).

    Caching: Spark refuses queries that reference ONLY the corrupt
    column, so the quarantine split needs the parsed frame cached — but
    a cache held for the session leaks executor storage per call (the
    r6 advisor finding). The quarantine side is the SMALL one
    (malformed lines), so it is materialized eagerly here
    (localCheckpoint) and the cache released before returning: `good`
    keeps plain lazy scan lineage (its filter references parsed
    columns, which is allowed uncached), and callers hold no hidden
    resident state."""
    df = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    quarantined = (
        df.where(F.col("_corrupt_record").isNotNull())
        .select(F.col("_corrupt_record").alias("raw_line"))
        .localCheckpoint(eager=True)
    )
    df.unpersist()
    good = df.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    return good, quarantined


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Export documents as JSONL (the interchange inverse — handoff to
    non-Spark consumers). One file per partition, gzip-friendly."""
    docs.write.mode("overwrite").json(path)
