"""Round-6 optimization harness (guide §1.4): per-query noop-sink timing
and formatted-plan capture, kept OUT of the frozen bench.py.

Usage:
  python bench_extra.py q_minhash q_tfidf          # time with noop sink
  python bench_extra.py --explain-dir plans/r06 --suffix before q_minhash
  python bench_extra.py --all                      # whole suite
  python bench_extra.py --count                    # use .count() like bench.py

Prints one JSON line {"queries": {name: sec}, "runs": k, "sink": ...}.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BENCH_QUERIES = [
    "q01_pricing_summary", "q03_order_revenue", "q05_nation_revenue",
    "q_window_top_orders", "q_time_rollup", "q_word_dict", "q_text_stats",
    "q_dedup_exact", "q_minhash", "q_cosine_search", "q_embedding_near_dup",
    "q_sentences", "q_asof_join", "q_sessionize", "q_tfidf",
    "q10_top_returners",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--count", action="store_true",
                    help="time .count() (bench.py's action) instead of noop")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()
    names = BENCH_QUERIES if args.all or not args.names else args.names

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from golden_horse_spark.config import get_spark

    spark = get_spark("bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    out: dict = {}
    allruns: dict = {}
    for name in names:
        if args.explain_dir:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            p = Path(args.explain_dir) / f"{name}_{args.suffix}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(plan)
            print(f"# wrote {p}", file=sys.stderr)
        times = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, sf)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
            df = None
            gc.collect()
        spark.sparkContext.setJobDescription(None)
        if times:
            out[name] = min(times)
            allruns[name] = times
            print(f"# {name}: min {out[name]}s of {times}", file=sys.stderr)
    print(json.dumps({
        "queries": out, "all_runs": allruns, "runs": args.runs,
        "sink": "count" if args.count else "noop", "sf": sf,
    }))


if __name__ == "__main__":
    main()
