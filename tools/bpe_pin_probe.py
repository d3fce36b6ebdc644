#!/usr/bin/env python
"""Measure the BPE OOV-encode fold at production vocab size vs the
pin cadence (VERDICT r7 item 6): ``bpe_apply_merges`` localCheckpoints
the word frame every ``BPE_PIN_EVERY`` merges — at a 2k-merge vocab
that is hundreds of eager materializations, but widening the cadence
nests more ``F.aggregate`` folds into one Catalyst projection (past
whole-stage-codegen's method-size limit the expression falls back to
interpreted eval, and plan-build time itself grows superlinearly in
expression depth).

Method: a REAL rank-ordered merge list is trained python-side (the
same greedy most-frequent-adjacent-pair loop as the tests' reference
model — training cost is irrelevant here, only the encode fold is
measured) over a synthetic 26-letter-suffix vocabulary, then
``bpe_apply_merges`` runs over ~VOCAB_N distinct words with the SAME
merges at each cadence, interleaved in one session (the bench-noise
protocol), min-of-2 per cadence.

Usage: python tools/bpe_pin_probe.py [--merges 2048] [--words 20000]
                                     [--pins 4,16,64,256]
Writes BPE_PIN_PROBE.json at the repo root (evidence for SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def train_merges_py(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE trainer (unweighted) — the tests' pure-python model
    shape, run on distinct words only; ties break (count desc, pair
    asc) like the Spark trainer."""
    segs = {w: tuple(list(w) + ["</w>"]) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks in segs.values():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out = {}
        for w, toks in segs.items():
            res, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == best:
                    res.append(merged)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            out[w] = tuple(res)
        segs = out
    return merges


def main() -> None:
    n_merges = 2048
    n_words = 20_000
    pins = [4, 16, 64, 256]
    if "--merges" in sys.argv:
        n_merges = int(sys.argv[sys.argv.index("--merges") + 1])
    if "--words" in sys.argv:
        n_words = int(sys.argv[sys.argv.index("--words") + 1])
    if "--pins" in sys.argv:
        pins = [int(x) for x in sys.argv[sys.argv.index("--pins") + 1].split(",")]

    import numpy as np

    from meilisync_spark.operators.bpe import bpe_apply_merges
    from meilisync_spark.session import get_spark

    rng = np.random.default_rng(42)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = list(
        {
            "".join(alpha[int(c)] for c in rng.integers(0, 26, size=int(k)))
            for k in rng.integers(4, 12, size=n_words * 2)
        }
    )[:n_words]
    # train on a sample: merge QUALITY is irrelevant to fold cost, but
    # rank-realistic merges make a realistic fraction of them apply
    t0 = time.perf_counter()
    merges = train_merges_py(words[: min(3000, len(words))], n_merges)
    print(f"# trained {len(merges)} merges python-side in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    spark = get_spark(app_name="bpe-pin-probe")
    wdf = spark.createDataFrame([(w,) for w in words], "word string") \
        .repartition(32).localCheckpoint(True)

    from meilisync_spark.operators.bpe import bpe_apply_merges_fast

    results: dict[int, float] = {p: float("inf") for p in pins}
    fast_sec = float("inf")
    for _ in range(2):  # interleaved min-of-2
        for p in pins:
            t0 = time.perf_counter()
            bpe_apply_merges(wdf, merges, pin_every=p).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[p] = min(results[p], dt)
            print(f"# pin_every={p}: {dt:.2f}s", file=sys.stderr)
        t0 = time.perf_counter()
        bpe_apply_merges_fast(wdf, merges).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        fast_sec = min(fast_sec, dt)
        print(f"# fast (classic loop): {dt:.2f}s", file=sys.stderr)
    payload = {
        "n_merges": len(merges),
        "n_words": len(words),
        "sec_by_pin_every": {str(p): round(v, 2) for p, v in results.items()},
        "fast_sec": round(fast_sec, 2),
    }
    print(json.dumps(payload))
    with open(os.path.join(ROOT, "BPE_PIN_PROBE.json"), "w") as fh:
        json.dump(payload, fh)


if __name__ == "__main__":
    main()
