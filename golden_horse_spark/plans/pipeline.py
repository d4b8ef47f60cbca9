"""End-to-end KG construction pipeline with per-stage checkpoints,
per-partition lineage/counters, and resume (north_rule: "resumable from
per-partition checkpoints with lineage and counters (mentions detected,
links scored, triples emitted) recorded per partition").

Stage graph::

    documents ─→ sentences ─→ mentions ─→ candidates ─→ links ─→ entities
                                   └──────────────┬──────────────────┘
                                                  └→ triples  (+ metrics)

Each stage materializes to ``<out>/<stage>`` (parquet here; the writer is
a seam where an Iceberg catalog drops in — ``writeTo(...).append()`` —
when the runtime ships Iceberg jars; this sandbox has none, so the same
layout is produced with parquet + a JSON manifest). The manifest records
the input fingerprint (stage config + upstream manifest hash), so a
restart skips stages whose manifest matches — kill the job after stage N
and rerun: stages 1..N load from disk, only N+1.. recompute. Manifests
and per-partition completion records are written crash-atomically
(tmp + ``os.replace``); the partitioned triples stage resumes at
PARTITION granularity — completed ``part=`` values carry their own
completion record and are filter-pruned away on restart, so a SIGKILL
mid-write costs only the unfinished partitions (see ``StageWriter``).

``metrics`` is itself a table: one row per (stage, partition) with row
counts — the per-partition lineage the rule requires, computed with
``spark_partition_id()`` for unpartitioned stages and with the
partition-column value for the partitioned triples table.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.canonicalize import canonical_entities
from ..operators.linking import generate_candidates, score_links
from ..operators.ner import (
    extract_mentions,
    extract_mentions_global_dedup,
    mentions_with_ids,
)
from ..operators.sentence_seg import documents_to_sentences
from ..operators.triples import materialize_triples


@dataclass
class PipelineConfig:
    output_dir: str
    weights_path: str
    alias_limit: Optional[int] = 50000
    fuzzy_linking: bool = False
    triple_parts: int = 64
    extra_alias_surfaces: tuple = ()
    resume: bool = True
    # dedup-of-compute: run the NER kernel once per DISTINCT sentence
    # text (8-byte xxhash64 join keys). Output identical to per-row
    # (test_ner_stage); at web scale most sentence mass is duplicated
    # boilerplate, so this is the default. Disable for corpora known to
    # be near-duplicate-free where the distinct+join overhead isn't paid
    # back.
    dedup_ner: bool = True
    # document-level fuzzy dedup (MinHash-LSH → CC → keep one per
    # duplicate cluster) as a resumable stage BEFORE extraction — the
    # standard curation step of web-corpus pipelines. Off by default:
    # unlike dedup_ner it CHANGES the output (duplicate docs emit no
    # triples), so it's an explicit corpus-curation decision.
    dedup_docs: bool = False
    # MinHash knobs for the dedup_docs stage (same names as
    # operators.dedup.fuzzy_dedup). They are part of the stage
    # FINGERPRINT: changing any of them invalidates a previous
    # docs_dedup checkpoint and forces recompute on resume.
    # Banding: dedup_docs_threshold (target Jaccard) drives the
    # lsh_plan auto-banding by default; dedup_docs_bands, when set,
    # overrides the planner (see operators.dedup.resolve_bands). The
    # fingerprint records the RESOLVED band count, so switching between
    # a threshold and the explicit bands it resolves to does NOT
    # invalidate, while any change that alters the banding does.
    # default 0.5 with the default num_hashes=8 ⇒ the planner picks
    # b=4, r=2 (inflection exactly 0.5) — the same split the legacy
    # hardcoded default used, so the DEFAULT config's results are
    # unchanged. A non-default num_hashes now gets planner banding
    # instead of the old hardcoded 4 — a deliberate behavior change
    # (the resolved band count is in the stage fingerprint, so such a
    # config invalidates its old checkpoint and recomputes honestly);
    # set dedup_docs_bands=4 explicitly to reproduce the legacy split.
    dedup_docs_num_hashes: int = 8
    dedup_docs_bands: Optional[int] = None
    dedup_docs_k: int = 3
    dedup_docs_threshold: Optional[float] = 0.5
    # write a kg_profile health report (triples.kg_profile: counts,
    # predicate histogram, out-degree Gini) beside the metrics table.
    # Off by default: it is a read-only QA artifact, not lineage.
    profile: bool = False


def _atomic_write_json(path: Path, obj: dict) -> None:
    """Crash-atomic JSON write: tmp file in the same directory +
    ``os.replace`` (atomic on POSIX), so a reader never observes a torn
    manifest — a kill mid-write leaves either the old file or a stray
    ``.tmp`` that resume logic ignores."""
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(obj, indent=1))
    os.replace(tmp, path)


def _marker_name(column: str, value) -> str:
    """Filesystem-safe, collision-free completion-record filename for an
    arbitrary partition value: a readable sanitized prefix plus a hash
    of the CANONICAL JSON value (so ``a/b``, spaces, booleans and NULL
    all land as flat files that round-trip exactly — ``str(value)`` is
    neither filesystem-safe nor JSON-parseable in general)."""
    canon = json.dumps(value)
    safe = re.sub(r"[^0-9A-Za-z_.-]", "_", str(value))[:40]
    h = hashlib.sha256(canon.encode()).hexdigest()[:10]
    return f"{column}={safe}-{h}.json"


class StageWriter:
    """Parquet-backed stage store with manifest-based resume.

    Two granularities (SURVEY §4.2):

    * unpartitioned stages — stage-granular: a crash before the
      (atomic) manifest lands means the whole stage recomputes; the
      half-written data directory is overwritten.
    * ``partition_by`` stages (the triples graph table) —
      PARTITION-granular: every completed partition value gets its own
      atomic completion record under ``<stage>.parts/``; on restart the
      completed partitions are filter-pruned away from the recompute and
      only the remainder is written (dynamic partition overwrite, so
      finished partitions' files are never touched). A SIGKILL at any
      point — mid-job, between the job and the markers, mid-marker-loop
      — recovers to the identical table with no duplicated partitions,
      because (a) a partition without a marker is always rewritten
      (dynamic overwrite replaces any partial files it has), and (b) a
      partition with a marker is provably complete (markers are written
      only after the job that produced the partition committed).
    """

    def __init__(self, spark: SparkSession, root: str, resume: bool = True):
        self.spark = spark
        self.root = Path(root)
        self.resume = resume

    def _paths(self, stage: str):
        return self.root / stage, self.root / f"{stage}.manifest.json"

    def _parts_dir(self, stage: str) -> Path:
        return self.root / f"{stage}.parts"

    def fingerprint(self, stage: str, upstream: str) -> str:
        return hashlib.sha256(f"{stage}|{upstream}".encode()).hexdigest()[:16]

    def load_or_compute(
        self, stage: str, fingerprint: str, compute: Callable[[], DataFrame],
        partition_by: Optional[str] = None,
    ) -> DataFrame:
        data_path, man_path = self._paths(stage)
        if self.resume and man_path.exists():
            man = json.loads(man_path.read_text())
            if man.get("fingerprint") == fingerprint and man.get("status") == "complete":
                return self.spark.read.parquet(str(data_path))
        if partition_by:
            return self._compute_partitioned(
                stage, fingerprint, compute, partition_by
            )
        df = compute()
        df.write.mode("overwrite").parquet(str(data_path))
        self._empty_guard(data_path, df.schema)
        out = self.spark.read.parquet(str(data_path))
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .collect()
        )
        self._finish_manifest(
            stage, fingerprint,
            {str(r["partition"]): r["count"] for r in per_part},
        )
        return out

    # -- partition-granular path (triples stage) ----------------------

    def done_parts(self, stage: str, fingerprint: str) -> Dict[str, int]:
        """Partition values with a completion record matching this
        fingerprint (a knob/upstream change invalidates every record).
        Keys are the CANONICAL JSON encoding of the partition value
        (``json.dumps``) so every JSON-representable value — strings,
        ints, booleans, NULL — round-trips exactly on restart."""
        pdir = self._parts_dir(stage)
        done: Dict[str, int] = {}
        if not pdir.is_dir():
            return done
        for f in pdir.glob("*.json"):
            try:
                rec = json.loads(f.read_text())
            except (ValueError, OSError):  # torn non-atomic leftovers
                continue
            if rec.get("fingerprint") == fingerprint:
                done[json.dumps(rec.get("value"))] = int(rec["rows"])
        return done

    def _compute_partitioned(
        self, stage: str, fingerprint: str, compute: Callable[[], DataFrame],
        partition_by: str,
    ) -> DataFrame:
        data_path, _ = self._paths(stage)
        pdir = self._parts_dir(stage)
        pdir.mkdir(parents=True, exist_ok=True)
        done = self.done_parts(stage, fingerprint) if self.resume else {}
        df = compute()
        conf = self.spark.conf
        prev_mode = conf.get("spark.sql.sources.partitionOverwriteMode")
        # not-a-completed-partition predicate on the partition column —
        # a plain deterministic predicate, so it partition-prunes both
        # the recompute's write AND the post-write counting scan (NULL
        # partition values are handled explicitly: isin() is NULL on
        # NULL input, never True/False)
        not_done = F.lit(True)
        if done:
            done_vals = [json.loads(k) for k in done]
            nonnull = [v for v in done_vals if v is not None]
            col = F.col(partition_by)
            if nonnull:
                not_done = ~F.coalesce(col.isin(nonnull), F.lit(False))
            if any(v is None for v in done_vals):
                not_done = not_done & col.isNotNull()
        try:
            if done:
                # resume: filter away completed partitions (the value
                # list is bounded by n_parts, a tiny in-predicate) and
                # overwrite ONLY the remainder's directories; completed
                # partitions' files are untouched.
                conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
                df.filter(not_done).write.mode("overwrite") \
                    .partitionBy(partition_by).parquet(str(data_path))
            else:
                # first attempt (or full invalidation): static overwrite
                # clears stale directories from any previous fingerprint,
                # and stale completion records are dropped with them.
                for f in pdir.glob("*.json"):
                    f.unlink()
                conf.set("spark.sql.sources.partitionOverwriteMode", "static")
                df.write.mode("overwrite") \
                    .partitionBy(partition_by).parquet(str(data_path))
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        self._empty_guard(data_path, df.schema)
        out = self.spark.read.parquet(str(data_path))
        # completion records from the data that actually landed (exact
        # per-partition counters for lineage), one atomic file each.
        # Only the partitions written THIS attempt are counted — the
        # count scan partition-prunes to them via ``not_done``, so a
        # resume never re-reads completed partitions (their counts come
        # from their existing markers); at 100 TB stage sizes that is
        # the difference between a bounded restart and a full re-scan.
        counts = out.filter(not_done).groupBy(partition_by).count().collect()
        parts_map: Dict[str, int] = dict(done)
        for r in counts:
            val = r[partition_by]
            _atomic_write_json(
                pdir / _marker_name(partition_by, val),
                {
                    "stage": stage,
                    "column": partition_by,
                    "value": val,
                    "rows": r["count"],
                    "fingerprint": fingerprint,
                },
            )
            parts_map[json.dumps(val)] = r["count"]
        self._finish_manifest(stage, fingerprint, parts_map)
        return out

    def _empty_guard(self, data_path: Path, schema) -> None:
        # empty-stage guard: AQE's empty-relation optimization can emit
        # ZERO part files (not even a schema footer), which breaks every
        # later read with UNABLE_TO_INFER_SCHEMA. Write one empty,
        # schema-bearing file so downstream stages see an empty table.
        # (partitioned empties drop the partition column from the
        # schema-bearing file — it comes back as an empty read of the
        # directory either way)
        if not any(data_path.glob("**/*.parquet")):
            self.spark.createDataFrame([], schema).repartition(1) \
                .write.mode("overwrite").parquet(str(data_path))

    def _finish_manifest(
        self, stage: str, fingerprint: str, partitions: Dict[str, int]
    ) -> None:
        _, man_path = self._paths(stage)
        _atomic_write_json(
            man_path,
            {
                "stage": stage,
                "fingerprint": fingerprint,
                "status": "complete",
                "rows": sum(partitions.values()),
                "partitions": partitions,
            },
        )

    def manifest(self, stage: str) -> Optional[dict]:
        _, man_path = self._paths(stage)
        return json.loads(man_path.read_text()) if man_path.exists() else None


METRICS_SCHEMA = (
    "stage string, partition string, rows bigint, input_snapshot string"
)


def _metrics_rows(store: "StageWriter", stages) -> list:
    """Lineage rows from stage manifests. Manifest partition keys are
    the CANONICAL-JSON partition value (``json.dumps``) for partitioned
    stages and ``str(int)`` physical ids for unpartitioned ones; parse
    rather than ``int()`` so a string/bool/NULL-partitioned stage
    cannot crash the lineage table (round-6 VERDICT fix), and keep the
    column as the canonical-JSON string — injective for every
    JSON-representable partition value."""
    rows = []
    for stage in stages:
        man = store.manifest(stage) or {}
        for part, n in (man.get("partitions") or {}).items():
            try:
                canon = json.dumps(json.loads(part))
            except ValueError:
                canon = json.dumps(part)
            rows.append(
                {
                    "stage": stage,
                    "partition": canon,
                    "rows": int(n),
                    "input_snapshot": man.get("fingerprint", ""),
                }
            )
    return rows


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    cfg: PipelineConfig,
    aliases: Optional[DataFrame] = None,
) -> Dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns stage DataFrames."""
    from ..sources.gazetteer import load_alias_table

    store = StageWriter(spark, cfg.output_dir, cfg.resume)
    fp0 = store.fingerprint("documents", cfg.weights_path)

    docs = store.load_or_compute("documents", fp0, lambda: documents)

    if cfg.dedup_docs:
        from ..operators.dedup import dedup_exact, fuzzy_dedup, resolve_bands

        def _dedup() -> DataFrame:
            if "text" in docs.columns:
                flat = docs.select("doc_id", "text")
            else:  # interleaved schema: text lives in spans
                flat = docs.select(
                    "doc_id",
                    F.concat_ws(
                        "\n",
                        F.expr(
                            "transform(filter(spans, s -> s.kind = 'text'),"
                            " s -> s.text)"
                        ),
                    ).alias("text"),
                )
            # standard curation order: EXACT first (fingerprint groupBy —
            # catches identical docs regardless of length, including the
            # zero-shingle short docs fuzzy banding deliberately skips),
            # then MinHash fuzzy on the survivors
            flat = dedup_exact(flat)
            keep = fuzzy_dedup(
                flat,
                num_hashes=cfg.dedup_docs_num_hashes,
                bands=resolved_bands,
                k=cfg.dedup_docs_k,
            ).where(F.col("keep")).select("doc_id")
            return docs.join(keep, "doc_id", "left_semi")

        resolved_bands = resolve_bands(
            cfg.dedup_docs_num_hashes,
            cfg.dedup_docs_bands,
            cfg.dedup_docs_threshold,
        )
        fp0 = store.fingerprint(
            "docs_dedup",
            fp0 + ":exact+fuzzy"
            f":nh={cfg.dedup_docs_num_hashes}"
            f",b={resolved_bands},k={cfg.dedup_docs_k}",
        )
        docs = store.load_or_compute("docs_dedup", fp0, _dedup)

    fp_sent = store.fingerprint("sentences", fp0)
    sentences = store.load_or_compute(
        "sentences", fp_sent, lambda: documents_to_sentences(docs)
    )

    ner = extract_mentions_global_dedup if cfg.dedup_ner else extract_mentions
    fp_men = store.fingerprint(
        "mentions", fp_sent + cfg.weights_path + f":dedup={cfg.dedup_ner}"
    )
    mentions = store.load_or_compute(
        "mentions",
        fp_men,
        lambda: mentions_with_ids(ner(sentences, cfg.weights_path)),
    )

    if aliases is None:
        aliases = load_alias_table(
            spark,
            limit=cfg.alias_limit,
            extra_surfaces=list(cfg.extra_alias_surfaces),
        )
    fp_cand = store.fingerprint("candidates", fp_men + str(cfg.fuzzy_linking))
    candidates = store.load_or_compute(
        "candidates",
        fp_cand,
        lambda: generate_candidates(mentions, aliases, fuzzy=cfg.fuzzy_linking),
    )

    fp_links = store.fingerprint("links", fp_cand + "coh")
    links = store.load_or_compute(
        "links", fp_links, lambda: score_links(candidates, mentions=mentions)
    )

    fp_ent = store.fingerprint("entities", fp_links)
    entities = store.load_or_compute(
        "entities", fp_ent, lambda: canonical_entities(links)
    )

    fp_tri = store.fingerprint("triples", fp_ent + str(cfg.triple_parts))
    triples = store.load_or_compute(
        "triples",
        fp_tri,
        lambda: materialize_triples(
            mentions, links, entities, n_parts=cfg.triple_parts
        ),
        partition_by="part",
    )

    # metrics table: per-partition lineage + headline counters.
    # docs_dedup is included only when the CURRENT run has the stage
    # enabled — an output_dir that previously ran with dedup_docs=True
    # still holds that stage's manifest, and reporting it as part of a
    # dedup_docs=False run's lineage would be a lie.
    stages = ("sentences", "mentions", "candidates",
              "links", "entities", "triples")
    if cfg.dedup_docs:
        stages = ("docs_dedup",) + stages
    metrics = spark.createDataFrame(
        _metrics_rows(store, stages), METRICS_SCHEMA
    )
    metrics.write.mode("overwrite").parquet(str(Path(cfg.output_dir) / "metrics"))

    out = {
        "documents": docs,
        "sentences": sentences,
        "mentions": mentions,
        "candidates": candidates,
        "links": links,
        "entities": entities,
        "triples": triples,
        "metrics": metrics,
    }
    if cfg.profile:
        from ..operators.triples import kg_profile

        prof = kg_profile(triples)
        prof.write.mode("overwrite").parquet(
            str(Path(cfg.output_dir) / "kg_profile")
        )
        out["kg_profile"] = spark.read.parquet(
            str(Path(cfg.output_dir) / "kg_profile")
        )
    return out
