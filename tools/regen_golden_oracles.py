"""Regenerate fixtures/golden_oracle_rows.json — committed golden outputs
for the queries with no SQL-expressible oracle (NER chain, IVF ANN,
multimodal features). Their chains are deterministic (fixed seeds,
partition-invariant — locked by tests), so the driver's DuckDB side can
verify them against a literal VALUES table.

Run after any intentional change to the NER fixture/weights, the
synthetic document generator, or the IVF seeding:

    python tools/regen_golden_oracles.py [sf_dir]

The script runs each query TWICE and refuses to write if the two runs
disagree (nondeterminism guard).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLDEN_QUERIES = ["q_ner_mentions", "q_ner_mentions_joint", "q_kg_triples",
                  "q_ann", "q_pagerank", "q_kcore",
                  "q_media_features"]
OUT = REPO / "fixtures" / "golden_oracle_rows.json"

# PARTIAL goldens: queries whose oracle is live SQL for most rows plus a
# committed-golden VALUES tail for one non-SQL-expressible part (the
# oracle_sql() side UNION ALLs these onto the live twin). The predicate
# selects the golden part's rows out of the full query output.
PARTIAL_GOLDEN = {
    # the 8 distributed-BPE merge rows + r4 unigram-LM vocabulary rows
    # beside the counted dictionary
    "q_word_dict": lambda row: str(row["word"]).startswith(("bpe:", "uni:")),
    # the HyperANF neighborhood-function + HyperBall harmonic-centrality
    # rows beside the SQL-twinned profile stats (HLL sketches are
    # deterministic; DuckDB has no compatible estimator); r4 also the
    # stress-centrality digit histogram (exact integers via the φ
    # recursion, but SP-DAG path counting is not SQL-expressible)
    "q_graph_profile": lambda row: row["stat"] in ("nf", "hc", "stress"),
    # r5: Soundex phonetic blocking (no DuckDB soundex) + SoftTFIDF
    # (float ln/sqrt weight chain) — the last pytest-only linking
    # operators, now gated via committed-golden rows
    "q_fuzzy_candidates": lambda row: str(row["block_id"]).startswith(
        ("soundex:", "stfidf")
    ),
}
OUT_PARTIAL = REPO / "fixtures" / "golden_partial_rows.json"


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from golden_horse_spark.config import get_spark

    spark = get_spark("golden-regen", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    out = {}
    for name in GOLDEN_QUERIES:
        df = qs[name](spark, sf)
        cols = df.columns
        runs = [sorted(tuple(r) for r in qs[name](spark, sf).collect())
                for _ in range(2)]
        if runs[0] != runs[1]:
            raise SystemExit(f"{name}: nondeterministic across runs — not writing")
        out[name] = {"columns": cols, "rows": [list(r) for r in runs[0]]}
        print(f"{name}: {len(runs[0])} rows captured")
    OUT.write_text(json.dumps(out, indent=1, ensure_ascii=False))
    print(f"wrote {OUT}")

    partial = {}
    for name, pred in PARTIAL_GOLDEN.items():
        df = qs[name](spark, sf)
        cols = df.columns
        runs = [
            sorted(tuple(r) for r in qs[name](spark, sf).collect()
                   if pred(r.asDict()))
            for _ in range(2)
        ]
        if runs[0] != runs[1]:
            raise SystemExit(f"{name} (partial): nondeterministic — not writing")
        partial[name] = {"columns": cols, "rows": [list(r) for r in runs[0]]}
        print(f"{name} (partial): {len(runs[0])} golden rows captured")
    OUT_PARTIAL.write_text(json.dumps(partial, indent=1, ensure_ascii=False))
    print(f"wrote {OUT_PARTIAL}")


if __name__ == "__main__":
    main()
