"""Train the ACL'16 joint CWS+NER fixture (R7) on the reference corpus.

NER task: weiboNER_2nd_conll splits (pre-charpos tokens, consumed in
char mode — the same recipe as fixtures/ner_weights_2nd.npz, README.md:76).
CWS task: data/pku_test_gold.utf8 converted to charpos tokens (positions
come straight from the gold segmentation — no segmenter involved), so
the SHARED embedding sees one vocabulary across both tasks.

Usage: python tools/train_joint_fixture.py [--epochs 40] [--cws-weight 0.7]
       [--dropout 0.1] [--hidden 150] [--out fixtures/joint_weights.npz]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from golden_horse_spark.model.evaluation import span_eval  # noqa: E402
from golden_horse_spark.model.joint_train import (  # noqa: E402
    bies_labels,
    train_joint,
)
from golden_horse_spark.sources.conll import read_conll  # noqa: E402

DATA = Path("/root/reference/data")
ROOT = Path(__file__).resolve().parents[1]


def read_cws_charpos(path, max_len: int = 80):
    """pku gold lines → (charpos tokens, BIES labels)."""
    out = []
    with open(path, encoding="utf-8", errors="surrogatepass") as f:
        for line in f:
            words = line.split()
            if not words:
                continue
            toks = [c + str(i) for w in words for i, c in enumerate(w)]
            if not (2 <= len(toks) <= max_len):
                continue
            out.append((toks, bies_labels(words)))
    return out


def save_joint(model, path):
    np.savez_compressed(
        path,
        words=np.array(list(model.words2idx.keys()), dtype=np.str_),
        word_ids=np.array(list(model.words2idx.values()), dtype=np.int64),
        feats=np.array(list(model.features2idx.keys()), dtype=np.str_),
        feat_ids=np.array(list(model.features2idx.values()), dtype=np.int64),
        cws_labels=np.array(model.cws_labels, dtype=np.str_),
        ner_labels=np.array(model.ner_labels, dtype=np.str_),
        w_emb=model.w_emb, lstm_w=model.lstm["w"], lstm_u=model.lstm["u"],
        lstm_b=model.lstm["b"], lstm_p=model.lstm["p"],
        m1_n=model.m1_n, m1_b=model.m1_b, m1_a=model.m1_a,
        m2_n=model.m2_n, m2_b=model.m2_b, m2_a=model.m2_a,
        w_feat=model.w_feat, mode=np.array(model.mode),
    )


def load_joint(path):
    from golden_horse_spark.model.joint import JointWeights

    z = np.load(path, allow_pickle=False)
    return JointWeights(
        words2idx=dict(zip(z["words"].tolist(), z["word_ids"].tolist())),
        features2idx=dict(zip(z["feats"].tolist(), z["feat_ids"].tolist())),
        cws_labels=z["cws_labels"].tolist(),
        ner_labels=z["ner_labels"].tolist(),
        w_emb=z["w_emb"],
        lstm={"w": z["lstm_w"], "u": z["lstm_u"], "b": z["lstm_b"],
              "p": z["lstm_p"]},
        m1_n=z["m1_n"], m1_b=z["m1_b"], m1_a=z["m1_a"],
        m2_n=z["m2_n"], m2_b=z["m2_b"], m2_a=z["m2_a"],
        w_feat=z["w_feat"], mode=str(z["mode"]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=150)
    ap.add_argument("--cws-weight", type=float, default=0.7)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cws-max", type=int, default=0,
                    help="cap CWS sentences (0 = all)")
    ap.add_argument("--emb", default=str(ROOT / "fixtures/charpos_ppmi_svd.emb"))
    ap.add_argument("--out", default=str(ROOT / "fixtures/joint_weights.npz"))
    args = ap.parse_args()

    stem = "weiboNER_2nd_conll"
    train = read_conll(DATA / f"{stem}.train")
    dev = read_conll(DATA / f"{stem}.dev")
    test = read_conll(DATA / f"{stem}.test")
    cws = read_cws_charpos(DATA / "pku_test_gold.utf8")
    if args.cws_max:
        cws = cws[: args.cws_max]
    print(f"ner {len(train)}/{len(dev)}/{len(test)}  cws {len(cws)}", flush=True)

    model = train_joint(
        train, cws, ner_dev=dev, extra_dict_corpora=[test],
        mode="char", hidden=args.hidden, lr=args.lr,
        cws_weight=args.cws_weight, dropout=args.dropout,
        epochs=args.epochs, seed=args.seed,
        emb_path=args.emb if Path(args.emb).exists() else None,
    )
    for name, split in (("dev", dev), ("test", test)):
        pred = [model.classify_ner(chars) for chars, _ in split]
        res = span_eval(pred, [list(l) for _, l in split])
        print(f"FINAL {name}: micro P={res['p']:.4f} R={res['r']:.4f} "
              f"F1={res['f1']:.4f}", flush=True)
    save_joint(model, args.out)
    print("saved", args.out)


if __name__ == "__main__":
    main()
