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
and rerun: stages 1..N load from disk, only N+1.. recompute.

``metrics`` is itself a table: one row per (stage, partition) with row
counts — the per-partition lineage the rule requires, computed with
``spark_partition_id()`` so it reflects true physical partitions.
"""

from __future__ import annotations

import hashlib
import json
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
    dedup_docs_num_hashes: int = 8
    dedup_docs_bands: int = 4
    dedup_docs_k: int = 3
    # write a kg_profile health report (triples.kg_profile: counts,
    # predicate histogram, out-degree Gini) beside the metrics table.
    # Off by default: it is a read-only QA artifact, not lineage.
    profile: bool = False


class StageWriter:
    """Parquet-backed stage store with manifest-based resume."""

    def __init__(self, spark: SparkSession, root: str, resume: bool = True):
        self.spark = spark
        self.root = Path(root)
        self.resume = resume

    def _paths(self, stage: str):
        return self.root / stage, self.root / f"{stage}.manifest.json"

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
        df = compute()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(str(data_path))
        # empty-stage guard: AQE's empty-relation optimization can emit
        # ZERO part files (not even a schema footer), which breaks every
        # later read with UNABLE_TO_INFER_SCHEMA. Write one empty,
        # schema-bearing file so downstream stages see an empty table.
        if not any(data_path.glob("**/*.parquet")):
            # partitioned empties drop the partition column from the
            # schema-bearing file — it comes back as a (empty) read of
            # the directory either way
            self.spark.createDataFrame([], df.schema).repartition(1) \
                .write.mode("overwrite").parquet(str(data_path))
        out = self.spark.read.parquet(str(data_path))
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .collect()
        )
        man = {
            "stage": stage,
            "fingerprint": fingerprint,
            "status": "complete",
            "rows": sum(r["count"] for r in per_part),
            "partitions": {str(r["partition"]): r["count"] for r in per_part},
        }
        man_path.write_text(json.dumps(man, indent=1))
        return out

    def manifest(self, stage: str) -> Optional[dict]:
        _, man_path = self._paths(stage)
        return json.loads(man_path.read_text()) if man_path.exists() else None


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
        from ..operators.dedup import dedup_exact, fuzzy_dedup

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
                bands=cfg.dedup_docs_bands,
                k=cfg.dedup_docs_k,
            ).where(F.col("keep")).select("doc_id")
            return docs.join(keep, "doc_id", "left_semi")

        fp0 = store.fingerprint(
            "docs_dedup",
            fp0 + ":exact+fuzzy"
            f":nh={cfg.dedup_docs_num_hashes}"
            f",b={cfg.dedup_docs_bands},k={cfg.dedup_docs_k}",
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
    rows = []
    for stage in stages:
        man = store.manifest(stage) or {}
        for part, n in (man.get("partitions") or {}).items():
            rows.append(
                {
                    "stage": stage,
                    "partition": int(part),
                    "rows": int(n),
                    "input_snapshot": man.get("fingerprint", ""),
                }
            )
    metrics = spark.createDataFrame(
        rows, "stage string, partition int, rows bigint, input_snapshot string"
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
