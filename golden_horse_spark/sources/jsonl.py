"""JSONL corpus ingestion with corrupt-record quarantine.

Raw training corpora overwhelmingly arrive as JSON-lines (one document
object per line: CommonCrawl derivatives, chat/export dumps, labeling
-tool output). Two scale rules shape this reader:

1. **Never infer the schema.** Inference is a full extra pass over the
   data before the real one — at 100 TB that doubles the scan bill.
   The explicit ``DOCUMENTS_SCHEMA`` (BASELINE input_hint shape) is
   applied via ``from_json``; schema drift surfaces as quarantined
   rows, not silent column soup.
2. **Quarantine, don't crash (and don't cache).** Spark's built-in
   ``_corrupt_record`` column carries the documented restriction that
   it cannot be filtered without caching the parsed frame first —
   a non-starter at scale. The clean pattern is ``spark.read.text`` →
   ``from_json`` (JVM-side, whole-stage codegen) → split on parse
   NULL: malformed lines, or lines whose object is missing the
   ``doc_id`` key, land in a quarantine frame carrying the RAW line so
   the bad payload is never lost. Both outputs are lazy projections of
   ONE text scan (persist the parsed frame if both sides are
   materialized in the same job and the input is remote).

Blank/whitespace-only lines (trailing newlines, artifact of naive
concatenation) are dropped silently — they are separator noise, not
corrupt documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .documents import DOCUMENTS_SCHEMA


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL documents corpus → ``(docs, quarantine)``.

    ``docs`` has the interleaved ``DOCUMENTS_SCHEMA`` (doc_id, spans);
    ``quarantine`` is ``(raw_line string)`` — every non-blank line that
    failed to parse or parsed without a ``doc_id``.
    """
    raw = spark.read.text(path).where(F.trim("value") != "")
    parsed = raw.select(
        "value", F.from_json("value", DOCUMENTS_SCHEMA).alias("d")
    )
    ok = F.col("d").isNotNull() & F.col("d.doc_id").isNotNull()
    docs = parsed.where(ok).select("d.doc_id", "d.spans")
    quarantine = parsed.where(~ok).select(F.col("value").alias("raw_line"))
    return docs, quarantine


def write_documents_jsonl(
    docs: DataFrame, path: str, mode: str = "error", n_files: int | None = None
) -> None:
    """Write an interleaved documents frame as JSONL (one object per
    line, struct spans nested) — the round-trip twin of
    ``read_documents_jsonl``."""
    if n_files:
        docs = docs.coalesce(n_files)
    docs.write.mode(mode).json(path)
