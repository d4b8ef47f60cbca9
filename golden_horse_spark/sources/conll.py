"""CoNLL corpus readers (driver-side; corpora are small — ≤1,890 sentences).

Format semantics from the reference scan (sighan_ner.py:37-43,176-190):
sentences separated by blank lines; tokens whitespace-split; column 0 is the
character, the LAST column is the label.

Also parses the golden featurizer dumps
``data/crfsuite.weiboNER.charpos.conll.{dev,test}`` (tab-separated: token,
label, then template feature strings) used for token-for-token featurizer
unit tests (FIXTURES.md §3).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

Sentence = Tuple[List[str], List[str]]  # (chars, labels)


def _read_text(path: str | Path) -> str:
    """utf-8 with a surrogatepass fallback: the reference's Python-2 dumps
    contain CESU-8-style lone-surrogate bytes for astral chars (emoji)."""
    raw = Path(path).read_bytes()
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("utf-8", errors="surrogatepass")


def read_conll(path: str | Path) -> List[Sentence]:
    text = _read_text(path).strip()
    sentences: List[Sentence] = []
    for block in text.split("\n\n"):
        chars: List[str] = []
        labels: List[str] = []
        for line in block.strip().split("\n"):
            cols = line.split()
            chars.append(cols[0])
            labels.append(cols[-1])
        sentences.append((chars, labels))
    return sentences


def read_charpos_golden(path: str | Path):
    """Golden featurizer output: per sentence, list of
    (token, label, [feature strings...]). Sentence separators in these
    dumps are whitespace-only lines (some are a single tab)."""
    sentences = []
    rows = []
    for line in _read_text(path).split("\n"):
        if not line.strip():
            if rows:
                sentences.append(rows)
                rows = []
            continue
        cols = line.split("\t")
        rows.append((cols[0], cols[1], cols[2:]))
    if rows:
        sentences.append(rows)
    return sentences


def sanitize_for_arrow(text: str) -> str:
    """Make surrogate-bearing reference text Arrow-safe.

    The reference was written for Python 2 *narrow* builds: astral chars
    (emoji) appear as UTF-16 surrogate PAIRS, one CoNLL line per code
    unit. Pure-Python processing keeps them as-is (faithful), but Arrow
    refuses lone surrogates, so at the Spark boundary we re-pair them
    into real astral chars and replace any unpaired remainder with
    U+FFFD.
    """
    if not any("\ud800" <= c <= "\udfff" for c in text):
        return text
    try:
        return text.encode("utf-16", "surrogatepass").decode("utf-16")
    except UnicodeDecodeError:
        return "".join(
            "�" if "\ud800" <= c <= "\udfff" else c for c in text
        )


def sentences_text(sentences: List[Sentence], arrow_safe: bool = False) -> List[str]:
    """Reassemble sentence strings by joining column-0 chars (FIXTURES.md §1)."""
    texts = ["".join(chars) for chars, _ in sentences]
    if arrow_safe:
        texts = [sanitize_for_arrow(t) for t in texts]
    return texts
