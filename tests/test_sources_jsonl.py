"""JSONL ingestion: round-trip fidelity + corrupt-record quarantine."""

from golden_horse_spark.sources.documents import synthesize_documents
from golden_horse_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_jsonl_round_trip(spark, tmp_path):
    docs = synthesize_documents(spark, n_docs=50, seed=11)
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out)
    back, quarantine = read_documents_jsonl(spark, out)
    assert quarantine.count() == 0
    want = {
        r["doc_id"]: [tuple(s) for s in r["spans"]] for r in docs.collect()
    }
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]] for r in back.collect()
    }
    assert got == want  # spans structs survive byte-for-byte


def test_jsonl_quarantine_split(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": "d1", "spans": [{"kind": "text", "text": "hi",'
                ' "media_ref": null, "offset": 0}]}',
                "not json at all {{{",
                "",  # blank separator noise: dropped, NOT quarantined
                '{"spans": []}',  # parses but has no doc_id -> quarantined
                "   ",
                '{"doc_id": "d2", "spans": []}',
            ]
        )
    )
    docs, quarantine = read_documents_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in docs.collect()) == ["d1", "d2"]
    bad = sorted(r["raw_line"] for r in quarantine.collect())
    assert bad == ["not json at all {{{", '{"spans": []}']
    d1 = {r["doc_id"]: r["spans"] for r in docs.collect()}["d1"]
    assert d1[0]["kind"] == "text" and d1[0]["offset"] == 0
