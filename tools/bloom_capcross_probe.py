"""Drive the SHARDED Bloom sidecar end-to-end ACROSS the bitmap-cap
conversion inside a live corpus-ingest stream (VERDICT r10 item 1).

Round 10 built the conversion (`corpus_ingest._load_bloom` →
`ShardedBloom.convert_from_logged`) and unit-tested it, but no stream
had ever run THROUGH it — this probe certifies the design point the
round-10 headline rests on:

- the bitmap cap is patched down (`size_for` cap 2^17 bits) so a
  ~50k-doc feed saturates the LoggedBloom mid-stream exactly the way
  a ~10¹¹-key corpus would saturate the real 1 GiB cap;
- the feed re-sends documents first ingested BEFORE the conversion in
  batches that arrive AFTER it, so a false negative introduced by the
  conversion would show up as a duplicate row in the corpus — final
  corpus rows must equal the unique-doc count;
- per-batch trigger times are recorded with the conversion batch
  marked: the warm line AFTER conversion must be flat (the memmap
  probe path has no per-batch broadcast ship term — executors map the
  shard files; only the bounded delta bitmap rides a broadcast).

Pass criteria (the verdict's "done"): conversion fires mid-stream,
rows == unique docs, post-conversion last-decile mean ≤ ~1.3× the
first-after-conversion decile mean (flat warm line).

Writes BLOOM_CAPCROSS_PROBE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_exponents import gen_corpus  # noqa: E402

CAP_BITS = 1 << 17  # patched cap: ~8.3k keys at 5e-4 target fpp
FLOOR_BITS = 1 << 14


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=120)
    ap.add_argument("--new-docs", type=int, default=400)
    ap.add_argument("--dup-docs", type=int, default=100)
    ap.add_argument("--dup-lag", type=int, default=20,
                    help="dups in batch b are re-sends from batch b-lag")
    ap.add_argument("--shuffle-partitions", type=int, default=8)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BLOOM_CAPCROSS_PROBE.json")
    )
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq_
    from pyspark.sql.streaming import StreamingQueryListener

    from meilisync_spark.functions import bloom as B
    from meilisync_spark.functions import bloom_sharded as BS
    from meilisync_spark.session import get_spark
    from meilisync_spark.streaming.corpus_ingest import run_corpus_ingest

    # --- patch the cap down so the stream crosses it mid-run ---
    orig = B.size_for

    def capped(n_keys, fpp=0.01, floor_bits=B.DEFAULT_BITS,
               cap_bits=1 << 33):
        return orig(n_keys, fpp, floor_bits=min(floor_bits, FLOOR_BITS),
                    cap_bits=min(cap_bits, CAP_BITS))

    B.size_for = capped
    BS.size_for = capped
    # LoggedBloom.fresh builds BloomSidecar() at the DEFAULT_BITS
    # default (bound at def time) — shrink fresh filters too, or the
    # 16 MiB default never saturates at probe scale
    orig_init = B.BloomSidecar.__init__

    def small_init(self, n_bits=FLOOR_BITS, k=B.K_HASHES, bits=None,
                   n_added=0):
        orig_init(self, n_bits=n_bits, k=k, bits=bits, n_added=n_added)

    B.BloomSidecar.__init__ = small_init

    work = tempfile.mkdtemp(prefix="mls_capcross_")
    n_docs = args.batches * args.new_docs
    gen_corpus(n_docs, 0, work)
    src = pq_.read_table(os.path.join(work, "documents.parquet"))
    # gen_corpus plants ~1% EXACT duplicates inside the corpus itself —
    # the expected final row count is the distinct normalized-text
    # count, not n_docs (duckdb mirrors dedup's normalize+hash)
    import duckdb

    unique = duckdb.sql(
        "SELECT count(DISTINCT lower(trim(regexp_replace(text, '\\s+', "
        "' ', 'g')))) FROM read_parquet('"
        + os.path.join(work, "documents.parquet") + "')"
    ).fetchone()[0]
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    for b in range(args.batches):
        parts = [src.slice(b * args.new_docs, args.new_docs)]
        if b >= args.dup_lag:
            parts.append(
                src.slice((b - args.dup_lag) * args.new_docs,
                          args.dup_docs)
            )
        pq_.write_table(pa.concat_tables(parts),
                        os.path.join(feed, f"batch-{b:05d}.parquet"))
    del src

    spark = get_spark(app_name="bloom-capcross-probe",
                      shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")

    idx = os.path.join(work, "idx")
    ck = os.path.join(work, "ck")
    prefix = idx.rstrip("/")

    class _Probe(StreamingQueryListener):
        def __init__(self):
            self.batch_ms: list[float] = []
            self.converted_at: int | None = None

        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = json.loads(event.progress.json)
            self.batch_ms.append(p["durationMs"].get("triggerExecution", 0))
            if self.converted_at is None and BS.ShardedBloom.exists(prefix):
                self.converted_at = len(self.batch_ms)

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    probe = _Probe()
    spark.streams.addListener(probe)
    t0 = time.monotonic()
    try:
        run_corpus_ingest(
            spark, feed, idx, ck,
            near_dedup=False, max_files_per_trigger=1,
            timeout_sec=min(14400.0, 30.0 * args.batches),
        )
    finally:
        time.sleep(3.0)
        spark.streams.removeListener(probe)
    wall = time.monotonic() - t0

    rows = spark.read.parquet(idx).count()
    sb = BS.ShardedBloom.load_cached(prefix)
    ms = probe.batch_ms
    conv = probe.converted_at
    sec = [v / 1000.0 for v in ms]

    def _mean(xs):
        return round(sum(xs) / len(xs), 3) if xs else None

    pre = sec[2:conv - 1] if conv else sec[2:]
    post = sec[conv:] if conv else []
    dec = max(1, len(post) // 10)
    out = {
        "protocol": {
            "batches": args.batches,
            "new_docs": args.new_docs,
            "dup_docs": args.dup_docs,
            "dup_lag": args.dup_lag,
            "cap_bits": CAP_BITS,
            "n_shards": BS.N_SHARDS_DEFAULT,
            "near_dedup": False,
            "host": "local[*] single JVM",
        },
        "wall_sec": round(wall, 1),
        "converted_at_batch": conv,
        "conversion_batch_sec": round(sec[conv - 1], 3) if conv else None,
        "pre_conversion_mean_sec": _mean(pre),
        "post_conversion_first_decile_sec": _mean(post[:dec]),
        "post_conversion_last_decile_sec": _mean(post[-dec:]),
        "post_flatness_last_over_first": round(
            _mean(post[-dec:]) / _mean(post[:dec]), 3
        ) if post else None,
        "batch_sec_every5": [round(v, 3) for v in sec[::5]],
        "corpus_rows": rows,
        "unique_docs": unique,
        "no_false_negatives_across_conversion": rows == unique,
        "final_sharded": sb is not None,
        "final_projected_fpp": round(sb.projected_fpp(), 6) if sb else None,
        "final_per_shard_bits": sb.shards[0].n_bits if sb else None,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "protocol"}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
