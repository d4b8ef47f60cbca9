import random

from golden_horse_spark.operators.tokenize import (
    EOW,
    _encode_word,
    bpe_encode,
    bpe_train,
    word_histogram,
)


def _python_bpe_train(word_counts, num_merges):
    """Reference BPE trainer (Sennrich et al. 2016 learn_bpe semantics):
    overlapping adjacent-pair counts, argmax with (max count, lexico-
    graphically smallest pair) ties, left-to-right non-overlapping
    replacement — the exact contract bpe_train pins."""
    vocab = {tuple(w) + (EOW,): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_classic_example(spark):
    docs = spark.createDataFrame(
        [("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest",)],
        ["text"],
    )
    merges = bpe_train(docs, num_merges=10)
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert merges == _python_bpe_train(wc, 10)
    # the famous outcome: 'newest' collapses into few subwords
    enc = {
        w: _encode_word(w, {(m[0], m[1]): i for i, m in enumerate(merges)})
        for w in wc
    }
    assert enc["newest"] == ["newest" + EOW] or len(enc["newest"]) <= 3


def test_bpe_train_vs_python_reference_random(spark):
    rng = random.Random(13)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 7)))
        for _ in range(40)
    ]
    counts = {}
    for w in words:
        counts[w] = counts.get(w, 0) + rng.randrange(1, 9)
    text = " ".join(w for w, c in counts.items() for _ in range(c))
    docs = spark.createDataFrame([(text,)], ["text"])
    got = bpe_train(docs, num_merges=25)
    want = _python_bpe_train(counts, 25)
    assert got == want


def test_bpe_encode_roundtrip_and_determinism(spark):
    docs = spark.createDataFrame(
        [(f"doc {i} aaa abab banana bandana",) for i in range(20)],
        ["text"],
    )
    merges = bpe_train(docs, num_merges=12)
    out = bpe_encode(docs, merges).collect()
    for r in out:
        # lossless: tokens concatenate back to the words (EOW marks
        # word ends)
        joined = "".join(tok for tok in r["bpe_tokens"])
        assert joined == EOW.join(r["text"].split()) + EOW
    # merge table is deterministic across re-trains (oracle-pinnable)
    assert bpe_train(docs, num_merges=12) == merges


def test_word_histogram_multispace_and_empty(spark):
    docs = spark.createDataFrame([("  a  b\t b\nc ",), ("",), ("   ",)], ["text"])
    rows = {r["word"]: r["count"] for r in word_histogram(docs).collect()}
    assert rows == {"a": 1, "b": 2, "c": 1}
