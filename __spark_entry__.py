"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query on sf0.001.
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + training-data ops); ``oracle_sql()`` gives the DuckDB
twin for every SQL-expressible one. Column aliases match exactly; float
aggregates are rounded and orderings tie-broken on unique keys so the
order-insensitive value-hash comparison is stable across engines.

Non-SQL-expressible entries (NER decode, KG pipeline, IVF/k-means ANN,
xxhash64 simhash, multimodal decode) intentionally omit oracles →
rows-only checks.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

WEIGHTS = str(REPO / "fixtures" / "ner_weights.npz")

# Chinese sentence pool for the NER-chain queries: deterministic,
# self-contained (no external data at query time).
_POOL = [
    "今天天气真好我们一起去北京看升旗吧",
    "张三和李四在上海开了一家科技公司",
    "中国国家博物馆今天免费开放",
    "王小明说他想去清华大学读书",
    "这部电影是刘德华演的真的很好看",
    "记者报道说美国总统访问了日本东京",
]
_ALIASES = ("张三", "李四", "北京", "上海", "刘德华", "清华大学", "中国",
            "国家博物馆", "王小明", "美国", "日本", "东京")


def _ship(spark: SparkSession) -> None:
    from golden_horse_spark.config import ship_package

    ship_package(spark)


def _tables(spark: SparkSession, sf_dir: str, *names: str):
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


def _synth_docs(spark: SparkSession, n: int = 200):
    from golden_horse_spark.sources.documents import synthesize_documents

    return synthesize_documents(
        spark, n, seed=42, sentence_pool=_POOL, partitions=8
    )


def _kg_stages(spark: SparkSession, n_docs: int = 200) -> dict:
    """Run the KG chain in-memory (no checkpoint dir) on synthesized docs."""
    from golden_horse_spark.operators.canonicalize import canonical_entities
    from golden_horse_spark.operators.linking import (
        generate_candidates,
        score_links,
    )
    from golden_horse_spark.operators.ner import (
        extract_mentions,
        mentions_with_ids,
    )
    from golden_horse_spark.operators.sentence_seg import documents_to_sentences
    from golden_horse_spark.operators.triples import materialize_triples

    _ship(spark)
    docs = _synth_docs(spark, n_docs)
    sentences = documents_to_sentences(docs)
    # cache: the coherence-scoring join makes the NER subtree appear in
    # several plan branches; without the cache the pandas-UDF stage would
    # re-run per branch (the checkpointed pipeline gets this from parquet)
    mentions = mentions_with_ids(extract_mentions(sentences, WEIGHTS)).cache()
    aliases = spark.createDataFrame(
        [{"surface_form": s, "entity_id": f"e{i}", "prior": 1.0}
         for i, s in enumerate(_ALIASES)]
    )
    candidates = generate_candidates(mentions, aliases)
    links = score_links(candidates, mentions=mentions)
    entities = canonical_entities(links)
    triples = materialize_triples(mentions, links, entities, n_parts=16)
    return {
        "documents": docs,
        "sentences": sentences,
        "mentions": mentions,
        "candidates": candidates,
        "links": links,
        "entities": entities,
        "triples": triples,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (NER → linking → CC → triples) over
    interleaved documents; also touches the sf0.001 relational tables
    (documents adapter union'd in for plumbing coverage)."""
    from golden_horse_spark.sources.documents import interleaved_from_testdata

    _ship(spark)
    stages = _kg_stages(spark, 200)
    td = interleaved_from_testdata(spark, "/root/testdata/sf0.001")
    from golden_horse_spark.operators.ner import extract_mentions, mentions_with_ids
    from golden_horse_spark.operators.sentence_seg import documents_to_sentences

    # testdata docs flow through the same chain (yield no Chinese mentions,
    # exercising the empty path) and the synthesized corpus yields triples
    _ = mentions_with_ids(
        extract_mentions(documents_to_sentences(td.limit(50)), WEIGHTS)
    )
    return stages["triples"].select("subj", "pred", "obj", "doc_id", "part")


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---------------- relational coverage (joins/aggs/windows/set ops)
    def q01_pricing_summary(spark, sf):
        (li,) = _tables(spark, sf, "lineitem")
        return (
            li.where(F.col("l_shipdate") <= "1998-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.count("*").alias("count_order"),
            )
        )

    q["q01_pricing_summary"] = q01_pricing_summary

    def q03_order_revenue(spark, sf):
        cust, orders, li = _tables(spark, sf, "customer", "orders", "lineitem")
        return (
            cust.where(F.col("c_mktsegment") == "BUILDING")
            .join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10)
        )

    q["q03_order_revenue"] = q03_order_revenue

    def q05_nation_revenue(spark, sf):
        cust, orders, li, supp, nat, reg = _tables(
            spark, sf, "customer", "orders", "lineitem", "supplier", "nation", "region"
        )
        return (
            reg.join(nat, F.col("n_regionkey") == F.col("r_regionkey"))
            .join(supp, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(li, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(
                cust,
                (F.col("c_custkey") == F.col("o_custkey"))
                & (F.col("c_nationkey") == F.col("s_nationkey")),
            )
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
                F.count("*").alias("n_items"),
            )
        )

    q["q05_nation_revenue"] = q05_nation_revenue

    def q_rollup_returns(spark, sf):
        (li,) = _tables(spark, sf, "lineitem")
        return li.rollup("l_returnflag", "l_linestatus").agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )

    q["q_rollup_returns"] = q_rollup_returns

    def q_window_top_orders(spark, sf):
        from pyspark.sql import Window

        (orders,) = _tables(spark, sf, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        return (
            orders.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("o_custkey", "o_orderkey", "rank")
        )

    q["q_window_top_orders"] = q_window_top_orders

    def q_set_except(spark, sf):
        cust, orders = _tables(spark, sf, "customer", "orders")
        with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
        low_bal = cust.where(F.col("c_acctbal") < 0).select(
            F.col("c_custkey").alias("custkey")
        )
        return with_orders.exceptAll(low_bal.distinct()).distinct()

    q["q_set_except"] = q_set_except

    def q_events_hourly(spark, sf):
        (ev,) = _tables(spark, sf, "events")
        return (
            ev.groupBy(
                F.date_trunc("hour", "ts").cast("string").alias("hour"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )

    q["q_events_hourly"] = q_events_hourly

    def q_events_user_stats(spark, sf):
        (ev,) = _tables(spark, sf, "events")
        return (
            ev.groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.countDistinct("event_type").alias("n_types"),
            )
            .where(F.col("n_events") >= 3)
        )

    q["q_events_user_stats"] = q_events_user_stats

    def q_part_brand_stats(spark, sf):
        part, li = _tables(spark, sf, "part", "lineitem")
        return (
            li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.col("l_extendedprice")), 2).alias("revenue"),
                F.round(F.avg("p_retailprice"), 4).alias("avg_retail"),
            )
        )

    q["q_part_brand_stats"] = q_part_brand_stats

    def q_semi_join(spark, sf):
        cust, orders = _tables(spark, sf, "customer", "orders")
        return cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left_semi"
        ).select("c_custkey", "c_name")

    q["q_semi_join"] = q_semi_join

    def q_anti_join(spark, sf):
        part, li = _tables(spark, sf, "part", "lineitem")
        return part.join(
            li, part.p_partkey == li.l_partkey, "left_anti"
        ).select("p_partkey", "p_name")

    q["q_anti_join"] = q_anti_join

    def q_intersect(spark, sf):
        cust, orders = _tables(spark, sf, "customer", "orders")
        building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
            F.col("c_custkey").alias("custkey")
        )
        with_orders = orders.select(F.col("o_custkey").alias("custkey"))
        return building.intersect(with_orders)

    q["q_intersect"] = q_intersect

    def q_date_rollup(spark, sf):
        (orders,) = _tables(spark, sf, "orders")
        return (
            orders.groupBy(
                F.year("o_orderdate").alias("yr"),
                F.month("o_orderdate").alias("mo"),
            )
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
        )

    q["q_date_rollup"] = q_date_rollup

    def q_conditional_agg(spark, sf):
        (li,) = _tables(spark, sf, "lineitem")
        return li.groupBy("l_linestatus").agg(
            F.round(
                F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)),
                2,
            ).alias("returned_qty"),
            # cast to double: DuckDB's round(sum(CASE…),2) yields DOUBLE while
            # Spark's sum of int literals is BIGINT — value-text hash differs
            F.round(
                F.sum(F.when(F.col("l_discount") > 0.05, 1.0).otherwise(0.0)), 2
            ).alias("n_discounted"),
        )

    q["q_conditional_agg"] = q_conditional_agg

    def q_cube_events(spark, sf):
        (ev,) = _tables(spark, sf, "events")
        return (
            ev.cube("event_type", F.hour("ts").alias("hr"))
            .agg(F.count("*").alias("n"))
            .select(
                F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
                F.coalesce("hr", F.lit(-1)).alias("hr"),
                "n",
            )
        )

    q["q_cube_events"] = q_cube_events

    def q_q2b_classes(spark, sf):
        from golden_horse_spark.operators.normalize import char_class_col, q2b_col

        _ship(spark)
        (docs,) = _tables(spark, sf, "documents")
        first_char = F.substring(q2b_col(F.col("text")), 1, 1)
        return (
            docs.select(char_class_col(first_char).alias("cls"))
            .groupBy("cls")
            .agg(F.count("*").alias("n"))
        )

    q["q_q2b_classes"] = q_q2b_classes

    def q_salted_counts(spark, sf):
        from golden_horse_spark.operators.salting import salted_agg

        _ship(spark)
        (li,) = _tables(spark, sf, "lineitem")
        out = salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("count", "l_quantity"), "qty": ("sum", "l_quantity")},
            salt_buckets=16,
        )
        return out.select("l_returnflag", "n", F.round("qty", 2).alias("qty"))

    q["q_salted_counts"] = q_salted_counts

    # ---------------- dictionary building (A1/A2 at corpus scale)
    def q_word_dict(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return (
            docs.select(F.explode(F.split(F.trim("text"), " ")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("freq"))
            .where(F.col("freq") > 50)
        )

    q["q_word_dict"] = q_word_dict

    def q_word_first_seen(spark, sf):
        from golden_horse_spark.operators.ids import sequential_ids

        _ship(spark)
        (docs,) = _tables(spark, sf, "documents")
        toks = docs.select(
            "doc_id", F.posexplode(F.split(F.trim("text"), " ")).alias("pos", "word")
        )
        firsts = toks.groupBy("word").agg(
            F.min(F.col("doc_id") * 100000 + F.col("pos") + 1).alias("first_pos")
        )
        # two-phase id assignment: identical ids to the global window,
        # but no Exchange SinglePartition (operators/ids.py)
        return sequential_ids(firsts, ["first_pos"], "word_id").select(
            "word", "word_id"
        )

    q["q_word_first_seen"] = q_word_first_seen

    # ---------------- sentence stage plumbing (T1 over flat docs)
    def q_sentences(spark, sf):
        from golden_horse_spark.operators.sentence_seg import documents_to_sentences
        from golden_horse_spark.sources.documents import interleaved_from_testdata

        _ship(spark)
        docs = interleaved_from_testdata(spark, sf)
        return documents_to_sentences(docs).select(
            "doc_id", "span_idx", "sent_idx", "text", "offset"
        )

    q["q_sentences"] = q_sentences

    # ---------------- collective link scoring (operators/linking.py:score_links)
    def q_link_coherence(spark, sf):
        """Document-coherence link scoring over a deterministic synthetic
        candidate set: each word-mention gets a 'head' entity (first char,
        prior 0.5) and a 'tail' entity (last char, prior 0.6); coherence
        support = other mentions in the same doc sharing the entity."""
        from golden_horse_spark.operators.linking import score_links

        (docs,) = _tables(spark, sf, "documents")
        mentions = (
            docs.where(F.col("doc_id") % 20 == 0)
            .select(
                "doc_id",
                F.posexplode(F.split(F.trim("text"), " ")).alias("pos", "surface"),
            )
            .where(F.length("surface") >= 3)
            .select(
                (F.col("doc_id") * 100000 + F.col("pos")).alias("mention_id"),
                "doc_id",
                "surface",
            )
        )
        cands = mentions.select(
            "mention_id",
            F.concat(F.lit("h_"), F.substring("surface", 1, 1)).alias("entity_id"),
            F.lit(0.5).alias("score"),
        ).unionByName(
            mentions.select(
                "mention_id",
                F.concat(
                    F.lit("t_"),
                    F.expr("substring(surface, length(surface), 1)"),
                ).alias("entity_id"),
                F.lit(0.6).alias("score"),
            )
        )
        links = score_links(cands, mentions=mentions)
        return links.select(
            "mention_id", "entity_id", F.round("score", 6).alias("score")
        )

    q["q_link_coherence"] = q_link_coherence

    # ---------------- text analysis
    def q_text_stats(spark, sf):
        from golden_horse_spark.operators.text_analysis import (
            fingerprint,
            quality_score,
            token_count,
        )

        (docs,) = _tables(spark, sf, "documents")
        t = F.col("text")
        return docs.select(
            "doc_id",
            token_count(t).alias("n_tokens"),
            quality_score(t).alias("quality"),
            fingerprint(t).alias("fp"),
        )

    q["q_text_stats"] = q_text_stats

    def q_lang_stats(spark, sf):
        (docs,) = _tables(spark, sf, "documents")
        return docs.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )

    q["q_lang_stats"] = q_lang_stats

    # ---------------- dedup family
    def q_dedup_exact(spark, sf):
        from golden_horse_spark.operators.dedup import exact_dup_groups

        _ship(spark)
        (docs,) = _tables(spark, sf, "documents")
        return exact_dup_groups(docs).select("fp", "n_docs", "keeper")

    q["q_dedup_exact"] = q_dedup_exact

    def q_minhash_signatures(spark, sf):
        from golden_horse_spark.operators.dedup import minhash_signatures

        _ship(spark)
        (docs,) = _tables(spark, sf, "documents")
        return minhash_signatures(docs, num_hashes=4, k=3)

    q["q_minhash_signatures"] = q_minhash_signatures

    def q_minhash_dup_pairs(spark, sf):
        from golden_horse_spark.operators.dedup import minhash_dup_pairs

        _ship(spark)
        (docs,) = _tables(spark, sf, "documents")
        return minhash_dup_pairs(docs, num_hashes=4, bands=2, k=3)

    q["q_minhash_dup_pairs"] = q_minhash_dup_pairs

    def q_ngram_jaccard_pairs(spark, sf):
        from golden_horse_spark.operators.dedup import ngram_jaccard_pairs

        _ship(spark)
        (docs,) = _tables(spark, sf, "documents")
        return ngram_jaccard_pairs(
            docs.where(F.col("doc_id") < 300), k=3, min_jaccard=0.2
        )

    q["q_ngram_jaccard_pairs"] = q_ngram_jaccard_pairs

    # ---------------- similarity search
    def q_cosine_topk(spark, sf):
        from golden_horse_spark.operators.similarity import cosine_topk

        _ship(spark)
        (emb,) = _tables(spark, sf, "embeddings")
        qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
        return cosine_topk(emb.where(F.col("vec_id") != 0), qvec, k=10).select(
            "vec_id"
        )

    q["q_cosine_topk"] = q_cosine_topk

    def q_cosine_threshold(spark, sf):
        from golden_horse_spark.operators.similarity import _dot, _norm
        import numpy as np

        _ship(spark)
        (emb,) = _tables(spark, sf, "embeddings")
        qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
        qn = float(np.sqrt(np.dot(qvec, qvec)))
        cos = _dot(F.col("embedding"), qvec) / (_norm(F.col("embedding")) * F.lit(qn))
        return (
            emb.where(F.col("vec_id") != 0)
            .select("vec_id", "label", cos.alias("c"))
            .where(F.col("c") >= 0.25)
            .select("vec_id", "label")
        )

    q["q_cosine_threshold"] = q_cosine_threshold

    def q_embedding_near_dup(spark, sf):
        from golden_horse_spark.operators.dedup import embedding_near_dup_pairs

        _ship(spark)
        (emb,) = _tables(spark, sf, "embeddings")
        return embedding_near_dup_pairs(emb, min_cosine=0.47, max_ids=500).select(
            "id_a", "id_b"
        )

    q["q_embedding_near_dup"] = q_embedding_near_dup

    # ---------------- NER / KG chain (rows-only: no SQL equivalent)
    def q_ner_mentions(spark, sf):
        stages = _kg_stages(spark, 150)
        return (
            stages["mentions"]
            .groupBy("etype", "ntype")
            .agg(F.count("*").alias("n_mentions"))
        )

    q["q_ner_mentions"] = q_ner_mentions

    def q_kg_triples(spark, sf):
        stages = _kg_stages(spark, 150)
        return stages["triples"].groupBy("pred").agg(F.count("*").alias("n"))

    q["q_kg_triples"] = q_kg_triples

    def q_ann_ivf(spark, sf):
        from golden_horse_spark.operators.similarity import (
            assign_cells,
            ivf_topk,
            train_centroids,
        )

        _ship(spark)
        (emb,) = _tables(spark, sf, "embeddings")
        qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
        cents = train_centroids(emb, n_cells=8, sample=500)
        cells = assign_cells(emb.where(F.col("vec_id") != 0), cents)
        # ids only: the committed-golden oracle (VALUES) compares the
        # retrieved set; recall vs exact cosine_topk is pytest territory
        return ivf_topk(cells, cents, qvec, k=10).select("vec_id")

    q["q_ann_ivf"] = q_ann_ivf

    def q_simhash_pairs(spark, sf):
        # md5 bit-plane variant: same simhash arithmetic as the xxhash64
        # production path, but portable → DuckDB oracle twin
        from golden_horse_spark.operators.dedup import simhash_dup_pairs

        _ship(spark)
        (docs,) = _tables(spark, sf, "documents")
        return simhash_dup_pairs(
            docs.where(F.col("doc_id") < 500), bits=32, hash_fn="md5"
        )

    q["q_simhash_pairs"] = q_simhash_pairs

    def q_media_features(spark, sf):
        from golden_horse_spark.operators.multimodal import (
            extract_media_features,
            synthesize_media,
        )

        _ship(spark)
        docs = _synth_docs(spark, 100)
        media = synthesize_media(spark, docs)
        return extract_media_features(media).select(
            "media_ref", "kind", "feat_dim"
        )

    q["q_media_features"] = q_media_features

    return q


def oracle_sql() -> dict[str, str]:
    from golden_horse_spark.operators.normalize import (
        _NUM_EXTRA,
        _PUNC,
        _Q2B_DST,
        _Q2B_SRC,
    )

    punc = "".join(sorted(_PUNC)).replace("'", "''")
    nums = "".join(sorted(c for c in _NUM_EXTRA if len(c) == 1))
    q2b_src = _Q2B_SRC.replace("'", "''")
    q2b_dst = _Q2B_DST.replace("'", "''")

    # md5 simhash twin (32 bit planes): bit b = nibble-bit b%4 of hex
    # digit b//4 of md5(token) — mirrors operators/dedup.py:simhash
    # (hash_fn="md5") digit-for-digit
    _sums = ",\n                       ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substring(h, {1 + b // 4}, 1)) - 1) "
        f">> {b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS c{b}"
        for b in range(32)
    )
    _recompose = " + ".join(
        f"(CASE WHEN c{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    )
    simhash_oracle = f"""
            WITH tok AS (
                SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
                FROM documents WHERE doc_id < 500
            ),
            hashed AS (SELECT doc_id, md5(t) AS h FROM tok),
            sums AS (
                SELECT doc_id,
                       {_sums}
                FROM hashed GROUP BY doc_id
            ),
            sig AS (SELECT doc_id, {_recompose} AS simhash FROM sums)
            SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, l.simhash AS simhash
            FROM sig l JOIN sig r ON l.simhash = r.simhash AND l.doc_id < r.doc_id
    """
    return {
        "q_simhash_pairs": simhash_oracle,
        "q_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "q_anti_join": """
            SELECT p_partkey, p_name FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        """,
        "q_intersect": """
            SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT o_custkey AS custkey FROM orders
        """,
        "q_date_rollup": """
            SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                   count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY 1, 2
        """,
        "q_conditional_agg": """
            SELECT l_linestatus,
                   round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END), 2) AS returned_qty,
                   round(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END), 2) AS n_discounted
            FROM lineitem GROUP BY l_linestatus
        """,
        "q_cube_events": """
            SELECT coalesce(event_type, '(all)') AS event_type,
                   coalesce(hr, -1) AS hr, n
            FROM (SELECT event_type, hour(ts) AS hr, count(*) AS n
                  FROM events GROUP BY CUBE (event_type, hr))
        """,
        "q_q2b_classes": f"""
            SELECT CASE
                     WHEN strpos('{punc}', c) > 0 THEN 'P'
                     WHEN (c BETWEEN '0' AND '9') OR strpos('{nums}', c) > 0 THEN 'N'
                     WHEN strpos('日月年', c) > 0 THEN 'D'
                     WHEN regexp_matches(c, '^[A-Za-z]$') THEN 'E'
                     WHEN NOT regexp_matches(c, '^[一-龥]$') THEN 'S'
                     ELSE 'O'
                   END AS cls,
                   count(*) AS n
            FROM (SELECT substring(translate(text, '{q2b_src}', '{q2b_dst}'), 1, 1) AS c
                  FROM documents)
            GROUP BY 1
        """,
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q03_order_revenue": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q05_nation_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM region
            JOIN nation ON n_regionkey = r_regionkey
            JOIN supplier ON s_nationkey = n_nationkey
            JOIN lineitem ON l_suppkey = s_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "q_rollup_returns": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "q_window_top_orders": """
            SELECT o_custkey, o_orderkey, rank FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "q_set_except": """
            SELECT DISTINCT o_custkey AS custkey FROM orders
            EXCEPT
            SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
        """,
        "q_events_hourly": """
            SELECT cast(date_trunc('hour', ts) AS varchar) AS hour, event_type,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "q_events_user_stats": """
            SELECT user_id, count(*) AS n_events,
                   round(sum(value), 2) AS total_value,
                   count(DISTINCT event_type) AS n_types
            FROM events
            GROUP BY user_id
            HAVING count(*) >= 3
        """,
        "q_part_brand_stats": """
            SELECT p_brand, count(*) AS n,
                   round(sum(l_extendedprice), 2) AS revenue,
                   round(avg(p_retailprice), 4) AS avg_retail
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "q_salted_counts": """
            SELECT l_returnflag, count(l_quantity) AS n,
                   round(sum(l_quantity), 2) AS qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "q_word_dict": """
            SELECT w AS word, count(*) AS freq
            FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
            GROUP BY 1 HAVING count(*) > 50
        """,
        "q_word_first_seen": """
            WITH toks AS (
                SELECT doc_id,
                       unnest([{'w': s[i], 'i': i} for i in range(1, len(s) + 1)]) AS u
                FROM (SELECT doc_id, string_split(trim(text), ' ') AS s FROM documents)
            ),
            firsts AS (
                SELECT u.w AS word, min(doc_id * 100000 + u.i) AS first_pos
                FROM toks GROUP BY 1
            )
            SELECT word, row_number() OVER (ORDER BY first_pos) AS word_id
            FROM firsts
        """,
        "q_link_coherence": """
            WITH toks AS (
                SELECT doc_id,
                       unnest([{'w': s[i], 'i': i - 1} for i in range(1, len(s) + 1)]) AS u
                FROM (SELECT doc_id, string_split(trim(text), ' ') AS s
                      FROM documents WHERE doc_id % 20 = 0)
            ),
            mentions AS (
                SELECT doc_id * 100000 + u.i AS mention_id, doc_id, u.w AS surface
                FROM toks WHERE length(u.w) >= 3
            ),
            cands AS (
                SELECT mention_id, 'h_' || substring(surface, 1, 1) AS entity_id,
                       0.5 AS score FROM mentions
                UNION ALL
                SELECT mention_id,
                       't_' || substring(surface, length(surface), 1),
                       0.6 FROM mentions
            ),
            withdoc AS (
                SELECT c.mention_id, c.entity_id, c.score, m.doc_id
                FROM cands c JOIN mentions m USING (mention_id)
            ),
            support AS (
                SELECT doc_id, entity_id, count(DISTINCT mention_id) AS s
                FROM withdoc GROUP BY 1, 2
            ),
            scored AS (
                SELECT w.mention_id, w.entity_id,
                       1.0 * w.score + 0.5 * ln(1 + (s.s - 1)) AS score
                FROM withdoc w
                JOIN support s ON w.doc_id = s.doc_id AND w.entity_id = s.entity_id
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY mention_id ORDER BY score DESC, entity_id) AS rk
                FROM scored
            )
            SELECT mention_id, entity_id, round(score, 6) AS score
            FROM ranked WHERE rk = 1
        """,
        "q_sentences": """
            SELECT 't' || cast(doc_id AS varchar) AS doc_id,
                   0 AS span_idx, 0 AS sent_idx, text, 0 AS offset
            FROM documents
            WHERE length(text) > 0
        """,
        "q_text_stats": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                   round(
                     (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 100000
                           THEN 0.4 ELSE 0.0 END) +
                     (CASE WHEN (length(regexp_replace(text, '[^.,;:!?，。；：！？]', '', 'g'))
                                 * 1.0 / length(text)) < 0.2 THEN 0.3 ELSE 0.0 END) +
                     (CASE WHEN (length(regexp_replace(text, '\\s+', '', 'g')) * 1.0
                                 / len(string_split_regex(trim(text), '\\s+')))
                                BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
                   , 2) AS quality,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "q_lang_stats": """
            SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "q_dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   count(*) AS n_docs, min(doc_id) AS keeper
            FROM documents GROUP BY 1
        """,
        "q_minhash_signatures": """
            WITH sh AS (
                SELECT doc_id,
                       [array_to_string(w[i:i+2], ' ')
                        for i in range(1, greatest(len(w) - 2, 0) + 1)] AS shingles
                FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
            )
            SELECT doc_id,
                   coalesce(list_min([md5('0|' || s) for s in shingles]), md5('0|')) AS h0,
                   coalesce(list_min([md5('1|' || s) for s in shingles]), md5('1|')) AS h1,
                   coalesce(list_min([md5('2|' || s) for s in shingles]), md5('2|')) AS h2,
                   coalesce(list_min([md5('3|' || s) for s in shingles]), md5('3|')) AS h3
            FROM sh
        """,
        "q_minhash_dup_pairs": """
            WITH sh AS (
                SELECT doc_id,
                       [array_to_string(w[i:i+2], ' ')
                        for i in range(1, greatest(len(w) - 2, 0) + 1)] AS shingles
                FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
            ),
            sig AS (
                SELECT doc_id,
                       list_min([md5('0|' || s) for s in shingles]) AS h0,
                       list_min([md5('1|' || s) for s in shingles]) AS h1,
                       list_min([md5('2|' || s) for s in shingles]) AS h2,
                       list_min([md5('3|' || s) for s in shingles]) AS h3
                FROM sh WHERE len(shingles) > 0
            ),
            banded AS (
                SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS band_key FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS band_key FROM sig
            ),
            capped AS (
                SELECT * FROM banded
                QUALIFY count(*) OVER (PARTITION BY band, band_key) <= 100
            )
            SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS n_bands
            FROM capped l JOIN capped r USING (band, band_key)
            WHERE l.doc_id < r.doc_id
            GROUP BY 1, 2
        """,
        "q_ngram_jaccard_pairs": """
            WITH sh AS (
                SELECT doc_id,
                       list_distinct([array_to_string(w[i:i+2], ' ')
                        for i in range(1, greatest(len(w) - 2, 0) + 1)]) AS shingles
                FROM (SELECT doc_id, string_split(trim(text), ' ') AS w
                      FROM documents WHERE doc_id < 300)
            ),
            ex0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            ex AS (
                SELECT * FROM ex0
                QUALIFY count(*) OVER (PARTITION BY s) < 100
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
            common AS (
                SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS common
                FROM ex l JOIN ex r USING (s)
                WHERE l.doc_id < r.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(common * 1.0 / (sa.n + sb.n - common), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.2
        """,
        "q_cosine_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id FROM embeddings e, q
            WHERE vec_id != 0
            ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, vec_id
            LIMIT 10
        """,
        "q_cosine_threshold": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, label FROM embeddings e, q
            WHERE vec_id != 0
              AND list_cosine_similarity(e.embedding, q.qe) >= 0.25
        """,
        "q_embedding_near_dup": """
            SELECT l.vec_id AS id_a, r.vec_id AS id_b
            FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
            WHERE l.vec_id < 500 AND r.vec_id < 500
              AND list_cosine_similarity(l.embedding, r.embedding) >= 0.47
        """,
    }


if __name__ == "__main__":
    from golden_horse_spark.config import get_spark

    s = get_spark("entry-smoke")
    df = entry(s)
    df.show(20, truncate=False)
    print("rows:", df.count())
