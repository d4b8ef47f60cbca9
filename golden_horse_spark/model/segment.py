"""Two-stage Chinese word segmenter (dictionary DAG + BMES HMM) — the
charpos/word-mode engine when jieba is unavailable.

The reference derives its ``charpos``/``word`` token representations
from jieba 0.37 (sighan_ner.py:148-166, README.md:90 pins the version).
This container has no jieba, so we implement the same two-stage
ARCHITECTURE from first principles with our own weights:

1. unigram max-probability lattice DP over a frequency dictionary —
   the textbook algorithm (Sproat et al. 1996-lineage): best path
   maximizing Σ log(freq/total), right-to-left, longest-word-on-tie;
2. a char-level BMES HMM re-segmenting runs of consecutive single-char
   DP pieces (the context-sensitive stage — "我要" can be one word
   before "看" and two words before "投诉").

No code or probability tables are taken from jieba; the HMM weights are
trained generatively on the public PKU gold corpus + the reference's
own golden dumps, then calibrated discriminatively against the dumps
with a structured perceptron (tools/fit_segmenter_lexicon.py), with
gold-inconsistent words blacklisted from the dictionary so the HMM owns
them — mirroring why they're absent from jieba's dict.

Lexicon sources (all public reference assets): ``resources/names.txt``
(jieba-dict format ``word freq pos``), ``data/pku_test_gold.utf8``
(space-segmented PKU gold corpus), and the word boundaries recoverable
from the golden charpos dumps
``data/crfsuite.weiboNER.charpos.conll.{dev,test}`` (a charpos token is
``char + position``, so positions reconstruct jieba-0.37's segmentation
exactly on those splits).

Measured vs the golden dumps (tests/test_segment.py): token-level
charpos agreement 0.9985 (dev) / 0.9988 (test) — up from 0.993/0.990
with the round-1 single-stage DAG. DOCUMENTED RESIDUAL (~0.1%, 21/540
sentences): our dictionary ≠ jieba's, so some single-char runs span
different extents than jieba's did, and no position-independent HMM can
satisfy both contexts; bit-parity would need the pinned jieba install
(SURVEY.md §7.0.8).
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
        # jieba-style prefix dict (round 6): every proper prefix of every
        # word present with freq 0 (unless itself a word), so the DP's
        # inner scan can BREAK as soon as a slice is not even a prefix —
        # no longer word can exist past it. Output is identical to the
        # full max_len scan (the skipped slices all had freq 0); ~35%
        # off the kernel's dominant segmenter loop in profile.
        pd: Dict[str, int] = dict(lexicon)
        for w in lexicon:
            for k in range(1, len(w)):
                pd.setdefault(w[:k], 0)
        self._prefix = pd

    def cut(self, sentence: str) -> List[str]:
        n = len(sentence)
        if n == 0:
            return []
        pd = self._prefix
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
                freq = pd.get(w)
                if freq is None:
                    # not a word and not a prefix of any word: single
                    # chars still get the freq-1 floor, and nothing
                    # longer can match — stop extending
                    if j - i == 1:
                        freq = 1
                    else:
                        break
                elif j - i == 1:
                    freq = freq or 1
                elif freq == 0:
                    continue
                sc = math.log(freq) - log_total + route[j][0]
                # tie → larger j (longer word first): jieba's calc_route
                # max() compares (score, end) tuples, and identical-char
                # runs ("哈哈哈…") tie exactly, so this rule alone
                # decides their output
                if best is None or (sc, j) > best:
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


# -------------------------------------------------- two-stage (DAG + HMM)

# jieba 0.37's actual pipeline is two-stage: the unigram lattice DP over
# the dictionary, then a char-level BMES HMM re-segmenting RUNS of
# consecutive single-char pieces (its finalseg module) — that second
# stage is what gives jieba context-sensitive decisions a pure unigram
# model cannot make ("我要" one word before "看" but two words before
# "投诉"). We implement the same architecture with our OWN weights:
# generative BMES counts from the public PKU corpus + golden dumps,
# then a structured-perceptron calibration against the dumps
# (tools/fit_segmenter_lexicon.py). No jieba code or tables are used.

_RE_HAN = re.compile(r"([一-鿕]+)")
_RE_SKIP = re.compile(r"(\d+\.\d+|[a-zA-Z0-9]+)")
_STATES = "BMES"
# legal BMES predecessor structure (finalseg-standard): B←{E,S,start},
# M←{B,M}, E←{B,M}, S←{E,S,start}
_PREV = {"B": "ES", "M": "BM", "E": "BM", "S": "ES"}
_MIN = -1e30


class HmmSegmenter:
    """BMES Viterbi word segmenter over weight dicts (log-prob scale).

    ``start[s]``, ``trans[p][s]``, ``emit[s][ch]`` are additive scores;
    missing emissions fall back to ``emit_unk[s]``. Weights may be
    generative log-probs or perceptron-adjusted scores — Viterbi only
    compares sums."""

    def __init__(self, start: Dict, trans: Dict, emit: Dict,
                 emit_unk: Optional[Dict] = None):
        self.start = start
        self.trans = trans
        self.emit = emit
        self.emit_unk = emit_unk or {s: -12.0 for s in _STATES}

    def _e(self, s: str, ch: str) -> float:
        return self.emit[s].get(ch, self.emit_unk[s])

    def tags(self, text: str) -> List[str]:
        """Viterbi BMES tag sequence for a pure block.

        Tie-break mirrors jieba's finalseg viterbi: equal scores pick
        the lexicographically LARGER state (their max() compares
        (prob, state) tuples). Exact ties are common — identical-char
        runs ("哈哈哈…") score every same-shape path equally, so the
        tie rule alone decides the output there."""
        n = len(text)
        v = {s: self.start.get(s, _MIN) + self._e(s, text[0]) for s in _STATES}
        back: List[Dict[str, str]] = []
        for i in range(1, n):
            ch = text[i]
            nv: Dict[str, float] = {}
            bp: Dict[str, str] = {}
            for s in _STATES:
                best, barg = (_MIN * 2, "")
                for p in _PREV[s]:
                    sc = v[p] + self.trans.get(p, {}).get(s, _MIN)
                    if (sc, p) > (best, barg):
                        best, barg = sc, p
                nv[s] = best + self._e(s, ch)
                bp[s] = barg
            v = nv
            back.append(bp)
        last = max(("E", "S"), key=lambda s: (v[s], s))
        out = [last]
        for bp in reversed(back):
            out.append(bp[out[-1]])
        return out[::-1]

    @staticmethod
    def words_from_tags(text: str, tags: Sequence[str]) -> List[str]:
        words, cur = [], ""
        for ch, t in zip(text, tags):
            if t in ("B", "S") and cur:
                words.append(cur)
                cur = ""
            cur += ch
            if t in ("E", "S"):
                words.append(cur)
                cur = ""
        if cur:
            words.append(cur)
        return words

    def cut(self, buf: str) -> List[str]:
        """finalseg-shaped block handling: BMES Viterbi on Chinese
        blocks; digit/latin runs kept whole; everything else singly."""
        out: List[str] = []
        for blk in _RE_HAN.split(buf):
            if not blk:
                continue
            if _RE_HAN.match(blk):
                out.extend(self.words_from_tags(blk, self.tags(blk)))
            else:
                for x in _RE_SKIP.split(blk):
                    if not x:
                        continue
                    if _RE_SKIP.match(x):
                        out.append(x)
                    else:
                        out.extend(x)
        return out


class TwoStageSegmenter:
    """DagSegmenter + HMM over single-char runs (the jieba-0.37 pipeline
    shape, reference sighan_ner.py:148-166 / README.md:90).

    Flush rule mirrors the original: a run of single-char DP pieces is
    emitted as-is if length 1, split char-by-char if the WHOLE run is a
    known dictionary word (the DP already rejected it as one word), and
    otherwise handed to the HMM."""

    def __init__(self, lexicon: Dict[str, float], hmm: Optional[HmmSegmenter]):
        self.dag = DagSegmenter(lexicon)
        self.lexicon = self.dag.lexicon
        self.hmm = hmm

    def _flush(self, buf: str, out: List[str]) -> None:
        if not buf:
            return
        if len(buf) == 1 or self.hmm is None:
            out.extend(buf)
        elif self.lexicon.get(buf):
            out.extend(buf)
        else:
            out.extend(self.hmm.cut(buf))

    def cut(self, sentence: str) -> List[str]:
        out: List[str] = []
        buf = ""
        for w in self.dag.cut(sentence):
            if len(w) == 1:
                buf += w
            else:
                self._flush(buf, out)
                buf = ""
                out.append(w)
        self._flush(buf, out)
        return out


def words_to_tags(words: Sequence[str]) -> List[str]:
    tags: List[str] = []
    for w in words:
        if len(w) == 1:
            tags.append("S")
        else:
            tags.extend(["B"] + ["M"] * (len(w) - 2) + ["E"])
    return tags


def train_hmm_generative(corpora: Iterable[List[str]]) -> HmmSegmenter:
    """Supervised BMES counts → smoothed log-prob HmmSegmenter.
    ``corpora`` yields word-segmented sentences (lists of words)."""
    start = {s: 1.0 for s in _STATES}
    trans = {p: {s: 1.0 for s in _PREV if p in _PREV[s]} for p in _STATES}
    emit = {s: {} for s in _STATES}
    for words in corpora:
        tags = words_to_tags(words)
        text = "".join(words)
        if not tags:
            continue
        start[tags[0]] += 1
        for p, s in zip(tags, tags[1:]):
            trans[p][s] = trans[p].get(s, 1.0) + 1
        for ch, s in zip(text, tags):
            emit[s][ch] = emit[s].get(ch, 0.0) + 1
    n_start = sum(start.values())
    start = {s: math.log(c / n_start) for s, c in start.items()}
    for p, row in trans.items():
        tot = sum(row.values())
        trans[p] = {s: math.log(c / tot) for s, c in row.items()}
    emit_unk = {}
    alpha = 0.5
    for s, row in emit.items():
        vocab = len(row) + 1
        tot = sum(row.values()) + alpha * vocab
        emit[s] = {ch: math.log((c + alpha) / tot) for ch, c in row.items()}
        emit_unk[s] = math.log(alpha / tot)
    return HmmSegmenter(start, trans, emit, emit_unk)


HMM_NPZ = Path(__file__).resolve().parents[2] / "fixtures/segmenter_hmm.npz"


def save_hmm_npz(hmm: HmmSegmenter, path: Path = HMM_NPZ) -> None:
    import numpy as np

    chars = sorted({ch for row in hmm.emit.values() for ch in row})
    mat = np.full((4, len(chars)), _MIN)
    idx = {ch: i for i, ch in enumerate(chars)}
    for si, s in enumerate(_STATES):
        for ch, v in hmm.emit[s].items():
            mat[si, idx[ch]] = v
    np.savez_compressed(
        path,
        chars=np.array(chars, dtype=np.str_),
        emit=mat,
        start=np.array([hmm.start.get(s, _MIN) for s in _STATES]),
        trans=np.array(
            [[hmm.trans.get(p, {}).get(s, _MIN) for s in _STATES] for p in _STATES]
        ),
        emit_unk=np.array([hmm.emit_unk[s] for s in _STATES]),
    )


def load_hmm_npz(path: Path = HMM_NPZ) -> HmmSegmenter:
    import numpy as np

    z = np.load(path, allow_pickle=False)
    chars = z["chars"].tolist()
    emit = {
        s: {
            ch: float(v)
            for ch, v in zip(chars, z["emit"][si])
            if v > _MIN / 2
        }
        for si, s in enumerate(_STATES)
    }
    start = {s: float(z["start"][si]) for si, s in enumerate(_STATES)}
    trans = {
        p: {
            s: float(z["trans"][pi][si])
            for si, s in enumerate(_STATES)
            if z["trans"][pi][si] > _MIN / 2
        }
        for pi, p in enumerate(_STATES)
    }
    emit_unk = {s: float(z["emit_unk"][si]) for si, s in enumerate(_STATES)}
    return HmmSegmenter(start, trans, emit, emit_unk)


def _find_npz(env: str, default_path: Path) -> Optional[Path]:
    import os

    for cand in (
        os.environ.get(env),
        default_path,
        Path("/root/repo/fixtures") / default_path.name,
    ):
        if cand and Path(cand).exists():
            return Path(cand)
    return None


LEXICON_NPZ = Path(__file__).resolve().parents[2] / "fixtures/segmenter_lexicon.npz"


def _find_lexicon_npz() -> Optional[Path]:
    """Workers import this package from the shipped zip, where a repo-
    relative path doesn't resolve — try the env override (set it to a
    --files-distributed path on a real cluster), then the repo-relative
    location, then the canonical checkout path."""
    return _find_npz("GH_LEXICON_NPZ", LEXICON_NPZ)


def save_lexicon_npz(lex: Dict[str, int], path: Path = LEXICON_NPZ) -> None:
    """npz-native lexicon artifact: one contiguous key array + freq array.

    Every python worker loads the lexicon; parsing 240k text lines per
    worker is exactly the allocation-heavy init that stalls under >16
    concurrently-forked workers (see BENCH.md) — the npz load is one
    buffer read, same trick as NerWeights."""
    import numpy as np

    keys = np.array(list(lex.keys()), dtype=np.str_)
    # float64: the perceptron-calibrated lexicon (tools/
    # fit_segmenter_lexicon.py) carries fractional log-space weights
    freqs = np.array(list(lex.values()), dtype=np.float64)
    np.savez_compressed(path, keys=keys, freqs=freqs)


def load_lexicon_npz(path: Path = LEXICON_NPZ) -> Dict[str, int]:
    import numpy as np

    z = np.load(path, allow_pickle=False)
    return dict(zip(z["keys"].tolist(), z["freqs"].tolist()))


_DEFAULT = None


def default_segmenter():
    """Process-wide lazily-built segmenter. Prefers the committed npz
    artifacts (fast worker init, and works where /root/reference isn't
    mounted); falls back to building from the reference sources. Returns
    the calibrated TwoStageSegmenter when the HMM fixture exists, else
    the plain DagSegmenter."""
    global _DEFAULT
    if _DEFAULT is None:
        npz = _find_lexicon_npz()
        lex = load_lexicon_npz(npz) if npz else build_lexicon()
        hmm_npz = _find_npz("GH_HMM_NPZ", HMM_NPZ)
        if hmm_npz:
            _DEFAULT = TwoStageSegmenter(lex, load_hmm_npz(hmm_npz))
        else:
            _DEFAULT = DagSegmenter(lex)
    return _DEFAULT
