"""Structured-Streaming variant of the extraction front-end.

The reference is batch-only (SURVEY.md §2.12); the north rule requires
batch + resumable checkpoints, so streaming is an additive capability:
continuous ingestion of interleaved documents with exactly-once sinks.

* ``stream_documents`` — file-source stream over a parquet directory of
  ``documents`` (new files = new micro-batch; at production scale the
  same code points at a Kafka/queue source).
* ``stream_mentions`` — the identical NER kernel applied per micro-batch
  (mapInPandas works unchanged on streaming DataFrames).
* ``windowed_mention_counts`` — event-time tumbling-window counts per
  entity type with a watermark for late data.
* ``session_mention_counts`` — gap-based session windows (streaming
  twin of the batch ``temporal.sessionize``; equivalence tested).
* ``stream_candidates`` — streaming entity linking: stream–static
  broadcast join against the alias dictionary (== batch candidates).
* ``stream_comention_pairs`` — stream–stream watermarked self-join
  with an event-time range bound (== batch self-join; state bounded).
* ``curate_documents_stream`` — streaming corpus curation (quality
  filter + deterministic domain-mixture sampling); stateless Column
  exprs, so stream == batch decisions by construction (tested).
* ``streaming_heavy_hitters`` — online Misra–Gries hot-key detection
  (partition-local summaries → one bounded global state row); the
  salting trigger for long-running jobs.
* ``streaming_count_min`` — online frequency sketch: the batch
  Count-Min aggregation applied verbatim to the stream; state is
  bounded by the sketch dimensions (≤ depth·width rows) BY
  CONSTRUCTION, never by key cardinality (== batch sketch after every
  drain; equivalence tested).
* ``run_to_sink`` — drives the stream with ``availableNow`` (drain-all,
  then stop: deterministic for tests/benchmarks) into a parquet sink
  with checkpointing — kill/restart resumes from the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ner import extract_mentions
from ..operators.sentence_seg import documents_to_sentences
from ..sources.documents import DOCUMENTS_SCHEMA


def stream_documents(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_mentions(docs_stream: DataFrame, weights_path: str) -> DataFrame:
    sentences = documents_to_sentences(docs_stream)
    return extract_mentions(sentences, weights_path)


def with_event_time(mentions: DataFrame, base_ts: str = "2026-01-01 00:00:00") -> DataFrame:
    """Synthesizes an event-time column from the doc id (deterministic)
    so windowed aggregations are testable without a clock."""
    return mentions.withColumn(
        "event_ts",
        F.to_timestamp(F.lit(base_ts))
        + F.make_interval(secs=F.pmod(F.xxhash64("doc_id"), F.lit(3600)).cast("double")),
    )


def dedup_documents_stream(
    docs_with_ts: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival of each normalized
    text fingerprint, with state bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — duplicates arriving within the
    watermark horizon are suppressed; state for older fingerprints is
    reclaimed, the standard unbounded-stream dedup contract). The
    fingerprint is the same md5 normalization the batch
    ``dedup.exact_dup_groups`` uses, so batch and stream agree on what
    counts as a duplicate."""
    from ..operators.text_analysis import fingerprint

    # interleaved docs carry text inside spans; flat tables carry `text`
    if "text" in docs_with_ts.columns:
        text = F.col("text")
    else:
        text = F.concat_ws(
            "\n",
            F.expr("transform(filter(spans, s -> s.kind = 'text'), s -> s.text)"),
        )
    keyed = docs_with_ts.withColumn("fp", fingerprint(text))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def windowed_mention_counts(
    mentions_with_ts: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling window + watermark: late mentions beyond the
    watermark are dropped, state is bounded — the standard late-data
    contract at web scale."""
    return (
        mentions_with_ts.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("win"), "etype")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "etype",
            "n_mentions",
        )
    )


def stream_candidates(mentions_stream: DataFrame, aliases: DataFrame) -> DataFrame:
    """Streaming entity linking: stream–static BROADCAST-hash join of
    the mention stream against the alias dictionary — the same
    ``exact_candidates`` operator the batch pipeline uses (narrow
    deterministic id assignment works unchanged on streams; the static
    side broadcasts, the stream side never shuffles), so batch and
    stream produce the same candidate multiset on the same documents
    (tested)."""
    from ..operators.linking import exact_candidates
    from ..operators.ner import mentions_with_ids

    return exact_candidates(mentions_with_ids(mentions_stream), aliases)


def stream_comention_pairs(
    mentions_with_ts: DataFrame,
    watermark: str = "30 minutes",
    join_window: str = "10 minutes",
) -> DataFrame:
    """STREAM–STREAM self-join: co-mentioned (etype_a, etype_b) pairs
    within the same document, as two watermarked streams joined with an
    event-time range predicate — the state-bounding pattern stream-
    stream joins require (without the time bound the join state is
    unbounded). Same-doc mentions share an event_ts here, so the window
    only bounds state, not semantics; equivalence to the batch self-join
    is tested."""
    l = mentions_with_ts.withWatermark("event_ts", watermark).alias("l")
    r = mentions_with_ts.withWatermark("event_ts", watermark).alias("r")
    return (
        l.join(
            r,
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (
                F.col("r.event_ts").between(
                    F.col("l.event_ts") - F.expr(f"INTERVAL {join_window}"),
                    F.col("l.event_ts") + F.expr(f"INTERVAL {join_window}"),
                )
            )
            # strict order on the mention's POSITION struct — unique per
            # mention within a doc, so every distinct pair is emitted
            # exactly once (round-5 review fix: the previous
            # (etype, surface, span_idx, start) '#'-concat key omitted
            # sent_idx/end, so two same-surface mentions at the same
            # start of DIFFERENT sentences compared equal and their
            # pair was silently dropped; string concat is also not
            # injective when surfaces contain '#'). etype + surface
            # trail as tie-breaks (round-6 ADVICE fix): a future NER
            # kernel emitting two TYPED spans at identical offsets
            # would otherwise compare equal in both orientations and
            # the pair would silently vanish — the trailing fields keep
            # the key injective per mention row and change nothing for
            # position-distinct mentions
            & (
                F.struct(
                    "l.span_idx", "l.sent_idx", "l.start", "l.end",
                    "l.etype", "l.surface",
                )
                < F.struct(
                    "r.span_idx", "r.sent_idx", "r.start", "r.end",
                    "r.etype", "r.surface",
                )
            ),
        )
        .select(
            F.col("l.doc_id").alias("doc_id"),
            F.col("l.etype").alias("etype_a"),
            F.col("r.etype").alias("etype_b"),
            F.col("l.surface").alias("surface_a"),
            F.col("r.surface").alias("surface_b"),
        )
    )


def session_mention_counts(
    mentions_with_ts: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time SESSION windows (gap-based, state merges adjacent
    events until a quiet period > gap) per entity type — the streaming
    twin of the batch ``operators.temporal.sessionize`` (equivalence
    tested: same session count per key at the same gap)."""
    return (
        mentions_with_ts.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("win"), "etype")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "etype",
            "n_mentions",
        )
    )


SURFACE_STATE_OUTPUT = (
    "surface string, total_mentions long, n_docs long, first_doc string"
)
_SURFACE_STATE = "total long, docs long, first_doc string, last_doc string"


def running_surface_stats(mentions: DataFrame) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    per-surface running totals maintained across micro-batches.

    State per surface = (total mention count, doc count, minimum doc_id
    ever seen, most recent doc_id). The state store lives in the query
    checkpoint, so totals survive restarts — the
    ``applyInPandasWithState`` pattern the north rule's streaming story
    needs for dedup/session-style operators (built-in windowed aggs
    can't express "running total since first sight" without unbounded
    watermark state).

    ``n_docs`` semantics (state is bounded, so cross-batch distinctness
    cannot be exact in general): the carried ``last_doc`` marker dedupes
    the common straddle case — a doc whose mentions of this surface span
    consecutive micro-batches is counted ONCE. The kernel SORTS each
    batch's group rows by doc_id (within-group arrival order after the
    state shuffle is implementation-defined, so correctness must not
    depend on it), making the count exact whenever doc_ids are
    non-decreasing ACROSS batches (true for the file-stream pipeline:
    new docs get later ids); under arbitrary cross-batch re-interleaving
    it is an upper bound. Locked by a straddle test in test_streaming.

    Scale: state is partitioned by the group key (surface); hot surfaces
    are single-key state rows (O(1) each), not growing lists. Emits one
    updated row per surface per micro-batch (outputMode=update).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        total, docs, first, last = (
            state.get if state.exists else (0, 0, None, None)
        )
        # collect the group's batch rows (bounded by the micro-batch)
        # and SORT by doc_id: applyInPandasWithState guarantees neither
        # chunk boundaries nor within-group row order after the state
        # shuffle, so "most recent doc" must be ORDER-DEFINED, not
        # arrival-defined (round-5 review fix — iloc[-1] of an
        # arbitrary-order chunk could repeat-count an interleaved doc
        # and poison the straddle marker for the next batch). doc_ids
        # ascend over a file stream's lifetime, so sorted-max is the
        # newest doc and the exactness contract below holds per batch
        # regardless of partitioning.
        chunks = [pdf["doc_id"] for pdf in pdfs]
        batch_docs = pd.concat(chunks).sort_values() if chunks else None
        if batch_docs is not None and len(batch_docs):
            total += len(batch_docs)
            docs += batch_docs.nunique() - (
                1 if last is not None and (batch_docs == last).any() else 0
            )
            batch_min = batch_docs.iloc[0]
            first = batch_min if first is None else min(first, batch_min)
            last = batch_docs.iloc[-1]
        state.update((int(total), int(docs), first, last))
        yield pd.DataFrame(
            {
                "surface": [key[0]],
                "total_mentions": [total],
                "n_docs": [docs],
                "first_doc": [first],
            }
        )

    return mentions.groupBy("surface").applyInPandasWithState(
        update,
        outputStructType=SURFACE_STATE_OUTPUT,
        stateStructType=_SURFACE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    rows: DataFrame,
    key_col: str,
    phi: float = 0.01,
) -> DataFrame:
    """ONLINE hot-key detection — the streaming complement of
    ``sketch.heavy_hitters`` and the trigger for the north rule's
    hot-surface-form salting: a long-running extraction job watches its
    own key stream and flags keys worth salting as they heat up,
    without a second pass.

    Topology (mergeable summaries, Agarwal et al. PODS'12): a STATELESS
    ``mapInPandas`` stage runs Misra–Gries with k = ⌈1/φ⌉ counters per
    input partition per micro-batch (bounded ≤ k+1 summary rows out per
    partition, the full stream is never shuffled), then ONE stateful
    group (``applyInPandasWithState``) merges summaries into a global
    MG state: counter-wise add, and when more than k counters survive,
    subtract the (k+1)-th largest and drop non-positives — the classic
    merge that PRESERVES the MG guarantee. Emitted after every batch:

    * every key with true frequency > φ·N(so far) IS present
      (superset guarantee — no false negatives, ever);
    * each estimate satisfies true − N/k ≤ est ≤ true.

    State is ≤ k counters + one total — O(1/φ), independent of stream
    length and key cardinality; the exact-verify pass stays batch-side
    (``sketch.heavy_hitters``), because exactness needs a second look
    at the data by definition. Output mode: update (one candidate set
    refresh per micro-batch).
    """
    import math

    k = max(1, math.ceil(1.0 / phi))
    from pyspark.sql.streaming.state import GroupStateTimeout

    # the ONE weighted-MG step shared with the batch sketch — a
    # guarantee fix there is a guarantee fix here (round-5 review:
    # two hand-rolled MG implementations had quietly diverged)
    from ..operators.sketch import _misra_gries_add as _mg_add

    def summarize(iterator):
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in iterator:
            vals = pdf["__k"]
            n += len(vals)
            for key, cnt in vals.value_counts().items():
                _mg_add(counters, key, int(cnt), k)
        yield pd.DataFrame(
            {
                "g": [0] * (len(counters) + 1),
                "key": [None] + list(counters),
                "cnt": [n] + [counters[c] for c in counters],
            }
        )

    summaries = rows.select(
        F.col(key_col).cast("string").alias("__k")
    ).mapInPandas(summarize, "g int, key string, cnt long")

    def merge(group_key, pdfs, state):
        import pandas as pd

        if state.exists:
            keys, cnts, total = state.get
            counters = dict(zip(list(keys), list(cnts)))
            total = int(total)
        else:
            counters, total = {}, 0
        for pdf in pdfs:
            for key, cnt in zip(pdf["key"], pdf["cnt"]):
                if key is None:
                    total += int(cnt)
                else:
                    counters[key] = counters.get(key, 0) + int(cnt)
        if len(counters) > k:
            spill = sorted(counters.values(), reverse=True)[k]
            counters = {
                ck: cv - spill
                for ck, cv in counters.items()
                if cv - spill > 0
            }
        state.update(
            (list(counters), [counters[c] for c in counters], total)
        )
        out_keys = list(counters)
        yield pd.DataFrame(
            {
                "key": out_keys,
                "est": [counters[c] for c in out_keys],
                "n_total": [total] * len(out_keys),
            }
        )

    return (
        summaries.groupBy("g")
        .applyInPandasWithState(
            merge,
            outputStructType="key string, est long, n_total long",
            stateStructType="keys array<string>, cnts array<long>, "
            "total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_count_min(
    rows: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Online Count-Min sketch over an unbounded key stream — the batch
    ``sketch.count_min_table`` expression applied verbatim to a
    streaming DataFrame. It is a plain stateful aggregation whose
    grouping key space is (row, bucket), so the state store holds at
    most depth·width rows REGARDLESS of stream length or key
    cardinality — the rare stateful-streaming operator whose state is
    bounded by construction, no watermark or TTL needed. Point-query
    any emitted snapshot with ``sketch.count_min_estimate``; the same
    CM guarantees (est ≥ true; ε–δ band) hold at every trigger because
    the snapshot IS the batch sketch of the prefix (equivalence
    tested). Output mode: complete (full sketch is tiny) or update.
    """
    from ..operators.sketch import count_min_table

    return count_min_table(rows, key_col, depth=depth, width=width)


def run_to_sink(
    stream_df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain all available input into a parquet sink (exactly-once via
    the checkpoint), then stop. Restart-safe: rerunning resumes from the
    checkpoint and skips already-committed files.

    File sinks are append-only, so for ``update``/``complete`` streams
    (the stateful operators in this module — running_surface_stats,
    streaming_heavy_hitters, streaming_count_min) this driver switches
    to a foreachBatch parquet writer: each micro-batch's emitted rows
    land in ``<output_dir>/batch=<id>``, overwritten on checkpoint
    replay (idempotent, so exactly-once per batch directory). For
    update mode the directory tree is the UPDATE LOG — the latest row
    per key across batches is the current value; for complete mode the
    highest batch id is the full current snapshot (round-5 review fix:
    previously this raised AnalysisException for three of the module's
    own operators)."""
    if output_mode == "append":
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    else:
        def _write(bdf: DataFrame, bid: int) -> None:
            bdf.write.mode("overwrite").parquet(f"{output_dir}/batch={bid}")

        q = (
            stream_df.writeStream.foreachBatch(_write)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()


def curate_documents_stream(
    docs_stream: DataFrame,
    mixture_rates: dict | None = None,
    min_quality: float = 0.7,
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Streaming corpus curation: the batch quality-filter + deterministic
    domain-mixture sampling applied to a document stream. Everything here
    is a stateless Column expression (no state store, no watermark
    needed), so stream and batch decisions are IDENTICAL by construction
    — the content-hash mixture decision does not depend on arrival order,
    which an RNG-based sampler could not guarantee. Adds (quality,
    n_tokens, keep_quality, keep_mixture, keep) and passes rows through
    for downstream sinks to filter on ``keep``."""
    from ..operators.text_analysis import (
        mixture_keep,
        quality_score,
        token_count,
    )

    t = F.col(text_col)
    out = docs_stream.withColumn("quality", quality_score(t)).withColumn(
        "n_tokens", token_count(t).cast("long")
    )
    kq = (F.col("quality") >= min_quality) & (F.col("n_tokens") >= 10)
    km = (
        mixture_keep(t, F.col(domain_col), mixture_rates)
        if mixture_rates is not None
        else F.lit(True)
    )
    return (
        out.withColumn("keep_quality", kq)
        .withColumn("keep_mixture", km)
        .withColumn("keep", kq & km)
    )


def streaming_entity_resolution(
    edges_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    src: str = "src",
    dst: str = "dst",
) -> None:
    """Streaming incremental entity resolution: each micro-batch of new
    identity edges (mention↔entity, sameAs, dup pairs — anything CC
    over) is folded into the persisted ``(node, component)`` assignment
    with :func:`~golden_horse_spark.operators.canonicalize.
    merge_components`. Because the incremental merge provably equals
    from-scratch CC (quotient-graph contraction, min-label canonical —
    tested batch-for-batch), the stream's state after N batches is
    byte-identical to rerunning CC over everything seen — regardless of
    how the edges were split into batches.

    State lives as a parquet dir swapped atomically per batch
    (write to ``<state_dir>.next`` → rename), NOT in the Spark state
    store: the assignment is a corpus-scale table and per-key stateful
    operators would shuffle all of it every batch, while merge_components
    touches it with two lookup joins and runs CC rounds only on the
    batch-sized contracted delta. foreachBatch + availableNow gives
    exactly-once batch boundaries via the stream checkpoint; a batch
    replayed after a crash re-merges the same edges, which is IDEMPOTENT
    (merging already-merged edges changes nothing), so the rename seam
    is safe.

    The swap itself is crash-atomic via rename-aside (never a window
    with NO complete state on disk): write ``.next`` → rename the live
    dir aside to ``.old`` → rename ``.next`` live → delete ``.old``.
    A crash between the two renames leaves a complete ``.next`` that
    the next batch recovers (round-5 review fix: the previous
    rmtree-then-rename left a window where a kill destroyed the entire
    accumulated assignment and the next batch silently restarted from
    scratch).
    """
    import os
    import shutil

    from ..operators.canonicalize import connected_components, merge_components

    spark = edges_stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        nxt, old = state_dir + ".next", state_dir + ".old"
        if not os.path.exists(state_dir) and os.path.exists(nxt):
            # crashed between the aside-rename and the live-rename:
            # .next is a COMPLETE post-merge state — adopt it (the
            # checkpoint will replay the interrupted batch, and
            # re-merging merged edges is a no-op)
            os.rename(nxt, state_dir)
        batch_df = batch_df.select(src, dst)
        if batch_df.limit(1).count() == 0:
            return
        if os.path.exists(state_dir):
            assignment = spark.read.parquet(state_dir)
            out = merge_components(assignment, batch_df, src=src, dst=dst)
        else:
            out = connected_components(batch_df, src=src, dst=dst)
        out.write.mode("overwrite").parquet(nxt)
        if os.path.exists(old):
            shutil.rmtree(old)  # leftover from a crash mid-swap
        if os.path.exists(state_dir):
            os.rename(state_dir, old)
        os.rename(nxt, state_dir)
        if os.path.exists(old):
            shutil.rmtree(old)

    q = (
        edges_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
