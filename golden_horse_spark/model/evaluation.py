"""Span-level NER evaluation + BIO chunking.

``span_eval`` is a behavior-exact re-expression (fresh Python 3, no code
copied) of the reference's conlleval-style scorer ``eval_ner``
(sighan_ner.py:404-461) including its quirks:

* per-type counters [match, predicted-chunks, gold-chunks]; a type is the
  text after '-', e.g. ``PER.NAM``;
* chunk starts at ``B-``/``S-``; a chunk match is only credited when the
  whole labeled span agrees (position-wise equality of pred and gold);
* the in-chunk state machine closes a matched chunk only when the next
  disagreement is not an ``I-``/``E-`` continuation on either side
  (sighan_ner.py:424-428);
* macro = mean of per-type P/R/F1; micro (the headline) = aggregate counts.

``bio_spans`` extracts (start, end, etype, ntype) mention spans from a BIO
sequence — a chunk is ``B-X`` (or ``S-X``) optionally followed by ``I-X``/
``E-X`` of the same type (sighan_ner.py:404-443 chunk delimiting).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple


def span_eval(
    pred: Sequence[Sequence[str]], gold: Sequence[Sequence[str]]
) -> Dict[str, object]:
    counts: Dict[str, List[int]] = {}

    def bucket(tag_type: str) -> List[int]:
        return counts.setdefault(tag_type, [0, 0, 0])

    for p_sent, g_sent in zip(pred, gold):
        open_match = False  # currently inside a chunk where pred == gold
        open_type = None
        for p, g in zip(p_sent, g_sent):
            p_parts = p.split("-")
            g_parts = g.split("-")
            if len(p_parts) == 2 and p_parts[0] in ("B", "S"):
                bucket(p_parts[1])[1] += 1
            elif len(p_parts) == 2:
                bucket(p_parts[1])  # ensure type key exists, as reference does
            if len(g_parts) == 2 and g_parts[0] in ("B", "S"):
                bucket(g_parts[1])[2] += 1
            elif len(g_parts) == 2:
                bucket(g_parts[1])

            if p != g or len(p_parts) == 1:
                # disagreement (or agreeing 'O'): close any open matched chunk,
                # unless either side continues it with I-/E- (then it's spoiled)
                if (
                    open_match
                    and p_parts[0] not in ("I", "E")
                    and g_parts[0] not in ("I", "E")
                ):
                    bucket(open_type)[0] += 1
                open_match = False
                open_type = None
            else:
                if g_parts[0] in ("B", "S"):
                    if open_match:  # back-to-back chunks: credit the previous
                        bucket(open_type)[0] += 1
                    open_type = g_parts[1]
                if g_parts[0] == "B":
                    open_match = True
                elif g_parts[0] == "S":
                    bucket(open_type)[0] += 1
                    open_match = False
        if open_match:
            bucket(open_type)[0] += 1

    macro = [0.0, 0.0, 0.0]
    agg = [0, 0, 0]
    per_type: Dict[str, Tuple[float, float, float]] = {}
    for k, v in counts.items():
        agg = [x + y for x, y in zip(agg, v)]
        prec = v[0] / v[1] if v[1] else 0.0
        rec = v[0] / v[2] if v[2] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec and rec else 0.0
        per_type[k] = (prec, rec, f1)
        macro[0] += prec
        macro[1] += rec
        macro[2] += f1
    n_types = len(counts) or 1
    prec = agg[0] / agg[1] if agg[1] else 0.0
    rec = agg[0] / agg[2] if agg[2] else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec and rec else 0.0
    return {
        "p": prec,
        "r": rec,
        "f1": f1,
        "macro": tuple(m / n_types for m in macro),
        "per_type": per_type,
        "counts": counts,
    }


def bio_spans(labels: Sequence[str]) -> List[Tuple[int, int, str, str]]:
    """BIO tags → [(start, end_exclusive, etype, ntype)].

    Tag grammar: ``{B,I,S,E}-{PER,LOC,ORG,GPE}.{NAM,NOM}`` or ``O``.
    """
    spans: List[Tuple[int, int, str, str]] = []
    start = None
    cur_type = None
    for i, tag in enumerate(labels):
        parts = tag.split("-", 1)
        head = parts[0]
        ttype = parts[1] if len(parts) == 2 else None
        continues = (
            start is not None and head in ("I", "E") and ttype == cur_type
        )
        if not continues and start is not None:
            spans.append((start, i, *_split_type(cur_type)))
            start, cur_type = None, None
        if head in ("B", "S") and ttype:
            start, cur_type = i, ttype
            if head == "S":
                spans.append((i, i + 1, *_split_type(ttype)))
                start, cur_type = None, None
        elif head in ("I", "E") and ttype and start is None:
            # orphan continuation: treated as chunk start (conlleval lenience)
            start, cur_type = i, ttype
        if head == "E" and start is not None:
            spans.append((start, i + 1, *_split_type(cur_type)))
            start, cur_type = None, None
    if start is not None:
        spans.append((start, len(labels), *_split_type(cur_type)))
    return spans


def _split_type(ttype: str) -> Tuple[str, str]:
    if "." in ttype:
        etype, ntype = ttype.split(".", 1)
    else:
        etype, ntype = ttype, "NAM"
    return etype, ntype


def error_analysis(
    words: Sequence[Sequence[str]],
    preds: Sequence[Sequence[str]],
    golds: Sequence[Sequence[str]],
    mismatches_only: bool = False,
) -> List[Tuple[int, int, str, str, str]]:
    """Structured port of the reference's debug-print ``error_analysis``
    (sighan_ner.py:394-401): one row per token, (sentence_idx, token_idx,
    word, pred_label, gold_label). The reference prints every token (its
    ``if p != g`` filter is commented out there); ``mismatches_only``
    exposes that filter. Returning rows instead of printing makes the
    same information queryable — e.g. wrap in ``spark.createDataFrame``
    and aggregate confusion pairs."""
    out: List[Tuple[int, int, str, str, str]] = []
    for si, (w_sent, p_sent, g_sent) in enumerate(zip(words, preds, golds)):
        for ti, (w, p, g) in enumerate(zip(w_sent, p_sent, g_sent)):
            if mismatches_only and p == g:
                continue
            out.append((si, ti, w, p, g))
    return out
