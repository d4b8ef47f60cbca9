"""golden_horse_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
hltcoe/golden-horse (Peng & Dredze EMNLP'15 / ACL'16 Weibo NER).

Pipeline: documents (interleaved text+media spans) → sentences → NER
(log-bilinear CRF, vectorized NumPy inside Arrow batches) → mentions →
entity-linking candidates (broadcast alias join + MinHash/LSH blocking) →
links → canonical entities (connected components) → (subj, pred, obj)
triples, all as Spark DataFrames.

Reference semantics are cited per-module as /root/reference/<file>:<lines>.
Nothing is copied from the reference; behaviors are re-derived and
re-expressed Spark-first.
"""

__version__ = "0.1.0"

import sys as _sys

if "pyspark.daemon" in _sys.modules:  # we are inside a forked Spark worker
    # Freeze the heap inherited from the pyspark daemon BEFORE any heavy
    # allocation: the first big GC pass in each of N forked workers would
    # otherwise touch every inherited object header and copy-on-write-
    # unshare the daemon heap N times over — a multi-second, kernel-lock-
    # bound stall at 32 workers (measured on this VM). Frozen objects are
    # never scanned again; they live for the worker's lifetime anyway.
    import gc as _gc

    _gc.freeze()
