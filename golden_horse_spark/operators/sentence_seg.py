"""Sentence segmentation (SURVEY.md §2.3 T1) and the documents→sentences
stage.

``segment_sentences`` re-derives the reference segmenter's semantics
(icwb.py:100-130):

* split on runs of 。？！，：；
* a split piece that strips to a single closing quote/bracket (" ” 』) is
  re-attached to the previous sentence (rstripped);
* each piece then absorbs the trailing run of enders that followed it;
* a piece that strips to nothing but enders is appended to the previous
  sentence;
* character offsets are tracked (the reference finds them with
  ``content.index``; we carry them directly — same values, since pieces
  are located left-to-right).

The Spark stage keeps everything declarative except the per-span string
scan, which runs as an Arrow-batched pandas UDF returning
``array<struct<text,start>>`` — then ``posexplode`` so downstream stages
see one row per sentence while the (doc_id, span_idx, sent_idx) key
preserves exact reassembly order (the span-sequence invariant,
BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENDERS = "。？！，：；"
_ENDER_SET = set(_ENDERS)
_WRAPPERS = {'"', "”", "』"}
_SPLIT_RE = re.compile("[%s]+" % _ENDERS)


def segment_sentences(content: str) -> List[Tuple[str, int]]:
    """content → [(sentence_text, char_start)], reference semantics."""
    out: List[Tuple[str, int]] = []
    cursor = 0
    for piece in _SPLIT_RE.split(content):
        if not piece:
            continue
        stripped = piece.strip()
        if len(stripped) == 1 and stripped in _WRAPPERS:
            if out:
                out[-1] = (out[-1][0] + piece.rstrip(), out[-1][1])
            else:
                out.append((piece.rstrip(), content.index(piece[0], cursor)))
            continue
        start = content.index(piece[0], cursor)
        end = start + len(piece)
        while end < len(content) and content[end] in _ENDER_SET:
            piece += content[end]
            end += 1
        cursor = end
        # post-absorb: a piece that strips to exactly one ender char is
        # glued to the previous sentence (icwb.py:123-125; the reference
        # membership test is against the set of single ender chars)
        if piece.strip() in _ENDER_SET:
            if out:
                out[-1] = (out[-1][0] + piece, out[-1][1])
                continue
        out.append((piece, start))
    return out


# ---------------------------------------------------------------------------
# JVM-side segmentation: identical semantics expressed as one SQL aggregate
# fold, so the documents→sentences stage needs NO python worker at all
# (whole-stage codegen feeds the explode directly). Split keeps delimiter
# runs attached to the left piece via lookbehind/lookahead, so pieces tile
# the string exactly and offsets are running sums. Parity with
# ``segment_sentences`` is fuzz-tested (tests/test_sentence_seg.py).
# ---------------------------------------------------------------------------

_E = "。？！，：；"
_SEG_SQL = f"""
aggregate(
  filter(split({{col}}, '(?<=[{_E}])(?![{_E}])'), p -> p != ''),
  named_struct(
    'sents', cast(array() as array<struct<text:string,start:int>>),
    'pos', 0),
  (acc, p) -> named_struct(
    'sents',
    CASE
      -- whitespace-only piece (no enders): plain append
      WHEN trim(p) = '' THEN
        concat(acc.sents, array(named_struct('text', p, 'start', acc.pos)))
      -- pure leading ender-run: dropped (re.split consumes it)
      WHEN substring(p, 1, 1) rlike '[{_E}]' THEN acc.sents
      -- piece stripping to exactly ONE ender char: glue to previous
      WHEN length(trim(p)) = 1 AND trim(p) rlike '[{_E}]' THEN
        CASE
          WHEN size(acc.sents) = 0 THEN
            concat(acc.sents, array(named_struct('text', p, 'start', acc.pos)))
          ELSE concat(
            slice(acc.sents, 1, size(acc.sents) - 1),
            array(named_struct(
              'text', concat(element_at(acc.sents, -1).text, p),
              'start', element_at(acc.sents, -1).start)))
        END
      -- piece whose core is a single closing quote/bracket: re-attach
      WHEN length(trim(regexp_replace(p, '[{_E}]+$', ''))) = 1
           AND trim(regexp_replace(p, '[{_E}]+$', '')) IN ('"', '”', '』') THEN
        CASE
          WHEN size(acc.sents) = 0 THEN
            concat(acc.sents, array(named_struct(
              'text', rtrim(regexp_replace(p, '[{_E}]+$', '')),
              'start', acc.pos)))
          ELSE concat(
            slice(acc.sents, 1, size(acc.sents) - 1),
            array(named_struct(
              'text', concat(element_at(acc.sents, -1).text,
                             rtrim(regexp_replace(p, '[{_E}]+$', ''))),
              'start', element_at(acc.sents, -1).start)))
        END
      ELSE concat(acc.sents, array(named_struct('text', p, 'start', acc.pos)))
    END,
    'pos', acc.pos + length(p)),
  acc -> acc.sents)
"""


def segment_sentences_col(col_name: str):
    """Column expression: text column → array<struct<text,start>> with
    the exact ``segment_sentences`` semantics, fully JVM-side."""
    return F.expr(_SEG_SQL.format(col=col_name))


def documents_to_sentences(documents: DataFrame) -> DataFrame:
    """Interleaved documents → sentences table.

    documents: (doc_id string, spans array<struct<kind,text,media_ref,offset>>)
    returns:   (doc_id, span_idx, sent_idx, text, offset)

    Narrow transforms only (posexplode ×2 + one pandas UDF): no shuffle —
    at 100 TB this stage is a pure map over the scan, and Parquet column
    pruning drops media payload columns entirely.
    """
    spans = documents.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).where(F.col("span.kind") == "text")
    segged = spans.select(
        "doc_id",
        "span_idx",
        F.col("span.offset").alias("span_offset"),
        F.col("span.text").alias("span_text"),
    ).select(
        "doc_id",
        "span_idx",
        "span_offset",
        F.posexplode(segment_sentences_col("span_text")).alias("sent_idx", "sent"),
    )
    return segged.select(
        "doc_id",
        "span_idx",
        "sent_idx",
        F.col("sent.text").alias("text"),
        (F.col("span_offset") + F.col("sent.start")).cast("int").alias("offset"),
    )
