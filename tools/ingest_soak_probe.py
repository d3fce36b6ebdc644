"""Soak-test append-only index aging over a long batch run (VERDICT r9
item 1): every micro-batch appends ~one file per touched partition
directory, so without maintenance a 300-batch run accumulates ~10⁴-10⁵
small files and the per-batch constant creeps up with the listing
cost. This probe runs the SAME 300-batch feed through
`run_corpus_ingest` twice — compaction cadence OFF and ON
(operators/maintenance.py, size-tiered per-directory) — recording
per-batch wall time (StreamingQueryListener progress events) and
visible data-file counts sampled every 10 batches.

Pass criterion (the verdict's "done"): with the cadence ON the
per-batch time is flat across the soak (last-decile mean ≈
first-decile mean) and the file count is bounded; with it OFF both
visibly age.

Writes INGEST_SOAK_PROBE.json.
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


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=300)
    ap.add_argument("--batch-docs", type=int, default=200)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--sample-every", type=int, default=10)
    ap.add_argument("--shuffle-partitions", type=int, default=8)
    ap.add_argument(
        "--arms", default="off,on",
        help="which arms to run (comma list of off/on) — rerun one arm "
        "cleanly and merge into an existing probe JSON",
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "INGEST_SOAK_PROBE.json")
    )
    args = ap.parse_args()

    import pyarrow.parquet as pq_
    from pyspark.sql.streaming import StreamingQueryListener

    from meilisync_spark.operators.maintenance import table_file_count
    from meilisync_spark.session import get_spark
    from meilisync_spark.streaming.corpus_ingest import run_corpus_ingest

    work = tempfile.mkdtemp(prefix="mls_soak_")
    total = args.batches * args.batch_docs
    gen_corpus(total, 0, work)
    src = pq_.read_table(os.path.join(work, "documents.parquet"))
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    for b in range(args.batches):
        pq_.write_table(
            src.slice(b * args.batch_docs, args.batch_docs),
            os.path.join(feed, f"batch-{b:05d}.parquet"),
        )
    del src

    spark = get_spark(app_name="ingest-soak-probe",
                      shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")

    class _Probe(StreamingQueryListener):
        def __init__(self, index_path: str, sample_every: int):
            self.index_path = index_path
            self.sample_every = sample_every
            self.batch_ms: list[float] = []
            self.file_counts: list[tuple[int, int]] = []

        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = json.loads(event.progress.json)
            self.batch_ms.append(p["durationMs"].get("triggerExecution", 0))
            n = len(self.batch_ms)
            if n % self.sample_every == 0:
                try:
                    files = table_file_count(self.index_path) + \
                        table_file_count(self.index_path + "_bands")
                except OSError:
                    files = -1
                self.file_counts.append((n, files))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    def run_arm(label: str, compact_every: int) -> dict:
        idx = os.path.join(work, f"idx_{label}")
        ck = os.path.join(work, f"ck_{label}")
        probe = _Probe(idx, args.sample_every)
        spark.streams.addListener(probe)
        t0 = time.monotonic()
        try:
            run_corpus_ingest(
                spark, feed, idx, ck,
                near_dedup=True, max_files_per_trigger=1,
                compact_every=compact_every,
                timeout_sec=min(14400.0, 30.0 * args.batches),
            )
        finally:
            time.sleep(3.0)  # let trailing async progress events land
            spark.streams.removeListener(probe)
        wall = time.monotonic() - t0
        ms = probe.batch_ms
        dec = max(1, len(ms) // 10)
        first = sum(ms[:dec]) / dec / 1000.0
        last = sum(ms[-dec:]) / dec / 1000.0
        return {
            "compact_every": compact_every,
            "batches": len(ms),
            "wall_sec": round(wall, 1),
            "first_decile_mean_sec": round(first, 3),
            "last_decile_mean_sec": round(last, 3),
            "aging_ratio_last_over_first": round(last / first, 3)
            if first else None,
            "final_files": table_file_count(idx)
            + table_file_count(idx + "_bands"),
            "file_count_samples": probe.file_counts,
            "batch_sec_every10": [
                round(v / 1000.0, 3) for v in ms[:: args.sample_every]
            ],
            "corpus_rows": spark.read.parquet(idx).count(),
        }

    out = {}
    if os.path.exists(args.out):  # merge a single-arm rerun
        with open(args.out) as fh:
            out = json.load(fh)
    out["protocol"] = {
        "batches": args.batches,
        "batch_docs": args.batch_docs,
        "near_dedup": True,
        "bloom_prefilter": True,
        "host": "local[*] single JVM",
    }
    arms = args.arms.split(",")
    if "off" in arms:
        out["cadence_off"] = run_arm("off", 0)
    if "on" in arms:
        out["cadence_on"] = run_arm("on", args.compact_every)
    # the two arms must agree on the corpus they built (only
    # comparable when both arms came from the same feed/protocol)
    if "cadence_off" in out and "cadence_on" in out and arms == ["off", "on"]:
        out["rows_match"] = (
            out["cadence_off"]["corpus_rows"]
            == out["cadence_on"]["corpus_rows"]
        )
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "protocol"},
                     default=str)[:2000])
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
