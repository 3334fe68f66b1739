"""``ray job submit`` entrypoint for the flagship pipeline — the
north_rule's launch form (BASELINE.json: "run via ray job submit on fixed N
and 4N node clusters").

On a cluster:

    ray job submit --working-dir /path/to/repo -- \
        python tools/job_flagship.py --sf-dir /data/sf1 --out /data/pairs

The job connects to the submitting cluster (``RAY_ADDRESS`` is injected by
the job server; local runs fall back to a local session), executes the
INPUT-side-resumable flagship (committed shards are skipped before the
read), and prints one JSON line of per-partition metrics + lineage — so a
re-submission after a node failure resumes instead of recomputing, and two
submissions against N- and 4N-node clusters yield the throughput pair the
scaling criterion compares. In this sandbox the same entrypoint runs
single-node (see bench.py --scaling for the N→4N proxy methodology).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True, help="partitioned output dir")
    ap.add_argument("--n-images", type=int, default=None,
                    help="override the sf-derived synthetic table size")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # in a submitted job RAY_ADDRESS points at the cluster; standalone
        # runs get a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from georay import queries as q

    t0 = time.time()
    manifest = q.flagship_resumable(
        args.sf_dir, args.out, n_images=args.n_images,
        lineage=f"job_flagship {args.sf_dir} @{int(t0)}",
    )
    dt = time.time() - t0
    parts = manifest["partitions"]
    rows = sum(p["rows"] for p in parts.values())
    print(json.dumps({
        "metric": "flagship job (resumable, partitioned sink)",
        "seconds": round(dt, 3),
        "partitions": len(parts),
        "pair_rows": rows,
        "out": args.out,
        # distinct lineages show which submission produced each partition
        # (a resumed job leaves earlier submissions' lineage in place)
        "lineages": sorted({str(p.get("lineage")) for p in parts.values()}),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
