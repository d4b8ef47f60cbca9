"""Structured-Streaming front-end: micro-batch NER, exactly-once resume,
windowed counts with watermark."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    from golden_horse_spark.sources.documents import synthesize_documents

    d = tmp_path_factory.mktemp("stream_in")
    docs = synthesize_documents(spark, 60, seed=11, partitions=3)
    docs.write.mode("overwrite").parquet(str(d / "docs"))
    return d


def test_stream_mentions_match_batch(spark, weights_path, doc_dir, tmp_path_factory):
    from golden_horse_spark.operators.ner import extract_mentions
    from golden_horse_spark.operators.sentence_seg import documents_to_sentences
    from golden_horse_spark.streaming.stream import (
        run_to_sink,
        stream_documents,
        stream_mentions,
    )

    out = tmp_path_factory.mktemp("stream_out")
    stream = stream_mentions(
        stream_documents(spark, str(doc_dir / "docs")), weights_path
    )
    run_to_sink(stream, str(out / "mentions"), str(out / "ckpt"))

    got = {tuple(r) for r in spark.read.parquet(str(out / "mentions")).collect()}
    batch_docs = spark.read.parquet(str(doc_dir / "docs"))
    want = {
        tuple(r)
        for r in extract_mentions(
            documents_to_sentences(batch_docs), weights_path
        ).collect()
    }
    assert got == want and len(got) > 0

    # resume: re-running against the same checkpoint ingests nothing new
    stream2 = stream_mentions(
        stream_documents(spark, str(doc_dir / "docs")), weights_path
    )
    run_to_sink(stream2, str(out / "mentions"), str(out / "ckpt"))
    again = {tuple(r) for r in spark.read.parquet(str(out / "mentions")).collect()}
    assert again == want  # no duplicates appended


def test_windowed_counts_with_watermark(spark, weights_path, doc_dir, tmp_path_factory):
    from golden_horse_spark.streaming.stream import (
        run_to_sink,
        stream_documents,
        stream_mentions,
        windowed_mention_counts,
        with_event_time,
    )

    out = tmp_path_factory.mktemp("win_out")
    stream = with_event_time(
        stream_mentions(stream_documents(spark, str(doc_dir / "docs")), weights_path)
    )
    counts = windowed_mention_counts(stream)
    run_to_sink(counts, str(out / "counts"), str(out / "ckpt"))
    rows = spark.read.parquet(str(out / "counts")).collect()
    assert rows
    assert all(r["n_mentions"] > 0 for r in rows)
    assert {r["etype"] for r in rows} <= {"PER", "LOC", "ORG", "GPE"}
