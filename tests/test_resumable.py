"""Input-side resumable flagship: committed shards are never re-read."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np


def test_flagship_resumable_skips_committed_shards(ray_session, tmp_path):
    from georay import queries as q
    from georay import runtime

    out = str(tmp_path / "pairs")
    man1 = q.flagship_resumable("/root/testdata/sf0.001", out, lineage="run-1")
    shards = sorted(man1["partitions"])
    assert len(shards) >= 2
    total1 = sum(p["rows"] for p in man1["partitions"].values())
    assert total1 > 0

    # simulate a crash after only the first shard committed: trim the
    # manifest AND drop the other shards' files + _done- sidecars (a
    # sidecar alone keeps a partition committed — the crash-resume design)
    man_path = os.path.join(out, "_manifest.json")
    m = json.load(open(man_path))
    keep = shards[0]
    m["partitions"] = {keep: m["partitions"][keep]}
    json.dump(m, open(man_path, "w"))
    for f in os.listdir(out):
        if f.startswith("part-") and not f.startswith(f"part-{keep.split('.')[0]}"):
            os.remove(os.path.join(out, f))
        if f.startswith("_done-"):
            os.remove(os.path.join(out, f))

    man2 = q.flagship_resumable("/root/testdata/sf0.001", out, lineage="run-2")
    # shard 0 kept run-1's lineage (never reprocessed); others carry run-2's
    assert man2["partitions"][keep]["lineage"] == "run-1"
    redone = [s for s in shards if s != keep]
    for s in redone:
        assert man2["partitions"][s]["lineage"] == "run-2"
    assert sum(p["rows"] for p in man2["partitions"].values()) == total1

    # fully committed -> instant no-op (no pipeline at all)
    import time

    t0 = time.time()
    man3 = q.flagship_resumable("/root/testdata/sf0.001", out)
    assert time.time() - t0 < 0.5
    assert sorted(man3["partitions"]) == shards
