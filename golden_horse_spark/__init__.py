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
