"""Soak the ANN ingest owner (streaming/ann_ingest.py) the way corpus
ingest was soaked (VERDICT r10 item 2): ≥300 add-batches through
`run_ann_ingest`, compaction cadence OFF vs ON, per-batch wall times
and visible file counts sampled along the way, and — the part the
existing cadence test covers only at 2 batches — RECALL asserted at
the end of the 300-batch run: the `_ann_meta` quantizer sidecar and
the `cluster=` partition layout must survive ~hundreds of size-tiered
swaps with served top-k quality unchanged.

Pass criteria: rows identical across arms (dedup unaffected by
compaction), file count bounded ON vs unbounded OFF, per-batch time
flat ON (last-decile ≈ first-decile), and SERVING IDENTITY — the
compacted arm's stored codes and served top-k must equal the
never-compacted arm's exactly (compaction changes file boundaries,
nothing else). Recall@5 is reported with the query shortlist sized to
the probed cell (~total/10 under the clustered twin's 10 caps), so
refine exact-ranks the whole cell: recall then certifies that routing
hits the right cluster= partition and every row in it survived the
swaps.

Writes ANN_SOAK_PROBE.json.
"""

from __future__ import annotations

import glob
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
    ap.add_argument("--batch-vecs", type=int, default=150)
    ap.add_argument("--seed-vecs", type=int, default=20000)
    ap.add_argument("--sample-every", type=int, default=10)
    ap.add_argument(
        "--query-shortlist", type=int, default=None,
        help="ADC shortlist for the recall query (default: cell-sized "
        "= total/10 + 1000, so refine exact-ranks the whole probed "
        "cell)",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=8)
    ap.add_argument("--arms", default="off,on")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "ANN_SOAK_PROBE.json")
    )
    args = ap.parse_args()

    import pyarrow.parquet as pq_
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from meilisync_spark.operators import pq as pq_mod
    from meilisync_spark.operators.ivfpq import query_index, save_index
    from meilisync_spark.operators.maintenance import table_file_count
    from meilisync_spark.operators.similarity import (
        _recall_against_brute,
        clustered_embeddings,
    )
    from meilisync_spark.session import get_spark
    from meilisync_spark.streaming.ann_ingest import run_ann_ingest

    work = tempfile.mkdtemp(prefix="mls_ann_soak_")
    total = args.seed_vecs + args.batches * args.batch_vecs
    gen_corpus(0, total, work)

    spark = get_spark(app_name="ann-soak-probe",
                      shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")

    # clustered twin corpus (tight caps → a real top-k to recover),
    # materialized once so every arm sees identical vectors
    ce_path = os.path.join(work, "clustered")
    clustered_embeddings(
        spark.read.parquet(os.path.join(work, "embeddings.parquet"))
    ).write.parquet(ce_path)
    ce = spark.read.parquet(ce_path)

    # train on the seed range; the rest arrives as add-batches
    seed_idx = os.path.join(work, "idx_seed")
    save_index(ce.where(F.col("vec_id") < args.seed_vecs), seed_idx)

    feed = os.path.join(work, "feed")
    stage = os.path.join(work, "stage")
    (
        ce.where(F.col("vec_id") >= args.seed_vecs)
        .select("vec_id", "embedding")
        .repartitionByRange(32, "vec_id")
        .write.parquet(stage)
    )
    add_tbl = pq_.read_table(stage).sort_by("vec_id")
    os.makedirs(feed)
    for b in range(args.batches):
        pq_.write_table(
            add_tbl.slice(b * args.batch_vecs, args.batch_vecs),
            os.path.join(feed, f"batch-{b:05d}.parquet"),
        )
    del add_tbl

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
                    files = table_file_count(self.index_path)
                except OSError:
                    files = -1
                self.file_counts.append((n, files))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    def run_arm(label: str, compact_every: int) -> dict:
        idx = os.path.join(work, f"idx_{label}")
        shutil.copytree(seed_idx, idx, symlinks=True)
        ck = os.path.join(work, f"ck_{label}")
        probe = _Probe(idx, args.sample_every)
        spark.streams.addListener(probe)
        t0 = time.monotonic()
        try:
            run_ann_ingest(
                spark, feed, idx, ck,
                max_files_per_trigger=1, compact_every=compact_every,
                timeout_sec=min(14400.0, 30.0 * args.batches),
            )
        finally:
            time.sleep(3.0)
            spark.streams.removeListener(probe)
        wall = time.monotonic() - t0
        stored = spark.read.parquet(idx)
        n_rows = stored.count()
        n_distinct = stored.select("vec_id").distinct().count()
        # serving-identity fingerprint: stored (vec_id, codes) content,
        # independent of file boundaries
        codes_hash = stored.selectExpr(
            "sum(hash(vec_id, codes)) AS h", "count(*) AS n"
        ).collect()[0]
        qs = [
            (r.vec_id, list(r.embedding))
            for r in ce.where(f"vec_id < {pq_mod.N_QUERIES}").collect()
        ]
        shortlist = args.query_shortlist or (total // 10 + 1000)
        topk = query_index(spark, idx, qs, k=5, refine=ce,
                           shortlist=shortlist)
        topk_rows = sorted(
            (int(r.q_id), int(r.rank), int(r.neighbor_id))
            for r in topk.select("q_id", "rank", "neighbor_id").collect()
        )
        rec = _recall_against_brute(ce, topk, 5)
        recall = sum(r.recall for r in rec.collect()) / pq_mod.N_QUERIES
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
            "final_files": table_file_count(idx),
            "file_count_samples": probe.file_counts,
            "batch_sec_every10": [
                round(v / 1000.0, 3) for v in ms[:: args.sample_every]
            ],
            "index_rows": n_rows,
            "index_distinct": n_distinct,
            "codes_hash": [int(codes_hash.h), int(codes_hash.n)],
            "topk_rows": topk_rows,
            "query_shortlist": shortlist,
            "cluster_dirs_symlinked": sum(
                1 for e in os.listdir(os.path.realpath(idx))
                if e.startswith("cluster=")
                and os.path.islink(os.path.join(os.path.realpath(idx), e))
            ),
            "recall_at_5": round(recall, 4),
        }

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            out = json.load(fh)
    out["protocol"] = {
        "batches": args.batches,
        "batch_vecs": args.batch_vecs,
        "seed_vecs": args.seed_vecs,
        "total_vecs": total,
        "host": "local[*] single JVM",
    }
    arms = args.arms.split(",")
    if "off" in arms:
        out["cadence_off"] = run_arm("off", 0)
    if "on" in arms:
        out["cadence_on"] = run_arm("on", 1)
    if "cadence_off" in out and "cadence_on" in out:
        off, on = out["cadence_off"], out["cadence_on"]
        out["rows_match"] = off["index_rows"] == on["index_rows"]
        out["serving_identical"] = (
            off.get("codes_hash") == on.get("codes_hash")
            and off.get("topk_rows") == on.get("topk_rows")
        )
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "protocol"},
                     default=str)[:2000])
    shutil.rmtree(work, ignore_errors=True)
    # served-query caches keyed by index path+mtime: the temp dirs are
    # gone, nothing to clean under /tmp/mls_ann_served_*

    _ = glob  # keep import for parity with sibling probes


if __name__ == "__main__":
    main()
