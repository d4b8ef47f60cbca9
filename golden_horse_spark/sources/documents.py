"""Interleaved-document sources (BASELINE.json input_hint shape):

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

Three constructors:

* ``synthesize_documents`` — deterministic, distributed generator: one
  task per ``spark.range`` partition, per-row RNG seeded by (seed, doc_id)
  so output is independent of partitioning (bench + scale tests;
  FIXTURES.md §1 "synthesis at scale"). Zipf-ish doc lengths, a
  configurable hot surface form injected into a fraction of docs to
  exercise skew/salting, media spans interleaved.
* ``documents_from_sentences`` — wraps a list of sentence strings (e.g.
  the weiboNER corpus reassembled per FIXTURES.md §1) one doc per k
  sentences, optional media interleave (golden parity tests).
* ``interleaved_from_testdata`` — adapts the driver's flat
  ``documents.parquet`` (doc_id:int64, text, …) into the interleaved
  shape: one text span per document (oracle/bench plumbing).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
    ]
)

# Small embedded fallback pool (used when the reference corpus isn't
# mounted); real tests/bench pass a pool from weiboNER sentences.
_FALLBACK_POOL = [
    "今天天气真好我们一起去北京看升旗吧",
    "张三和李四在上海开了一家科技公司",
    "中国国家博物馆今天免费开放",
    "王小明说他想去清华大学读书",
    "这部电影是刘德华演的真的很好看",
]


def _make_doc(rng: np.random.Generator, doc_id: str, pool: List[str],
              media_fraction: float, hot_text: Optional[str],
              hot_fraction: float, mean_sents: float,
              mutate_fraction: float = 0.0) -> list:
    n_sent = 1 + min(int(rng.zipf(2.0)), 30) + int(rng.poisson(mean_sents))
    spans = []
    offset = 0
    for i in range(n_sent):
        if rng.random() < media_fraction:
            kind = str(rng.choice(["image", "audio", "video"]))
            spans.append(
                {"kind": kind, "text": "", "media_ref": f"m://{doc_id}/{i}",
                 "offset": offset}
            )
            offset += 1
            continue
        text = pool[int(rng.integers(len(pool)))]
        if mutate_fraction and rng.random() < mutate_fraction and len(text) > 3:
            # deterministic char swap: makes most sentences globally
            # distinct, modelling the unique-text tail of web corpora
            a, b = rng.integers(0, len(text), size=2)
            lst = list(text)
            lst[a], lst[b] = lst[b], lst[a]
            text = "".join(lst)
        if hot_text and rng.random() < hot_fraction:
            text = hot_text + "，" + text
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        offset += len(text)
    return spans


def synthesize_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    sentence_pool: Optional[List[str]] = None,
    media_fraction: float = 0.15,
    hot_text: Optional[str] = "张三",
    hot_fraction: float = 0.1,
    mean_sents: float = 3.0,
    partitions: Optional[int] = None,
    mutate_fraction: float = 0.0,
) -> DataFrame:
    pool = sentence_pool or _FALLBACK_POOL
    sc = spark.sparkContext
    pool_b = sc.broadcast(pool)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = pool_b.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for did in ids:
                rng = np.random.default_rng((seed << 32) ^ int(did))
                rows.append(
                    {
                        "doc_id": f"d{did:012d}",
                        "spans": _make_doc(
                            rng, f"d{did:012d}", p, media_fraction,
                            hot_text, hot_fraction, mean_sents,
                            mutate_fraction,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, n_docs, numPartitions=partitions)
    return rng_df.mapInPandas(gen, DOCUMENTS_SCHEMA)


def documents_from_sentences(
    spark: SparkSession,
    sentences: Iterable[str],
    sentences_per_doc: int = 1,
    media_every: int = 0,
    doc_prefix: str = "g",
) -> DataFrame:
    """Wrap known sentences into interleaved docs (driver-side; golden sets
    are ≤2k sentences)."""
    rows = []
    batch: List[str] = []
    doc_n = 0

    def flush():
        nonlocal doc_n, batch
        if not batch:
            return
        doc_id = f"{doc_prefix}{doc_n:08d}"
        spans = []
        offset = 0
        for i, s in enumerate(batch):
            if media_every and i % media_every == media_every - 1:
                spans.append({"kind": "image", "text": "",
                              "media_ref": f"m://{doc_id}/{i}", "offset": offset})
                offset += 1
            spans.append({"kind": "text", "text": s, "media_ref": "", "offset": offset})
            offset += len(s)
        rows.append({"doc_id": doc_id, "spans": spans})
        doc_n += 1
        batch = []

    for s in sentences:
        batch.append(s)
        if len(batch) >= sentences_per_doc:
            flush()
    flush()
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def interleaved_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return raw.select(
        F.concat(F.lit("t"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
