"""Per-partition checkpoint manifest: lineage + metrics + resume.

The north rule requires a killed run to resume at partition granularity with
per-partition lineage and throughput metrics. Layout:

    out_dir/
      part-00000/ ... parquet shards of partition 0
      part-00001/ ...
      _manifest/part-00000.json   # one row of lineage+metrics per partition

A partition is DONE iff its manifest JSON exists with status "ok" — the
output directory is written to a temp name and renamed before the manifest
row is written, so a crash at any point leaves either no manifest (partition
rerun from scratch) or a complete, consistent partition.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, List, Optional


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition_id: int) -> str:
        return os.path.join(self.dir, f"part-{partition_id:05d}.json")

    def partition_dir(self, partition_id: int) -> str:
        return os.path.join(self.out_dir, f"part-{partition_id:05d}")

    def is_done(self, partition_id: int) -> bool:
        path = self._path(partition_id)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                return json.load(f).get("status") == "ok"
        except (json.JSONDecodeError, OSError):
            return False

    def tmp_partition_dir(self, partition_id: int) -> str:
        return os.path.join(self.out_dir, f".tmp-part-{partition_id:05d}")

    def commit_partition(self, partition_id: int, record: Dict) -> None:
        """Atomically promote the temp output dir and write the manifest row."""
        tmp = self.tmp_partition_dir(partition_id)
        final = self.partition_dir(partition_id)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        record = dict(record)
        record.setdefault("status", "ok")
        record["partition_id"] = partition_id
        record["finished_at"] = time.time()
        path = self._path(partition_id)
        with open(path + ".tmp", "w") as f:
            json.dump(record, f)
        os.replace(path + ".tmp", path)

    def update_record(self, partition_id: int, updates: Dict) -> None:
        """Atomically merge ``updates`` into an EXISTING committed
        record without touching the partition directory — the O(delta)
        append path (new files become visible only through the record's
        ``files`` list, so a crash before this write leaves them
        invisible)."""
        path = self._path(partition_id)
        with open(path) as f:
            record = json.load(f)
        record.update(updates)
        record["finished_at"] = time.time()
        with open(path + ".tmp", "w") as f:
            json.dump(record, f)
        os.replace(path + ".tmp", path)

    def cleanup_tmp(self, partition_id: int) -> None:
        tmp = self.tmp_partition_dir(partition_id)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)

    def records(self) -> List[Dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                try:
                    with open(os.path.join(self.dir, name)) as f:
                        out.append(json.load(f))
                except (json.JSONDecodeError, OSError):
                    pass
        return out

    def summary(self) -> Dict:
        recs = self.records()
        return {
            "partitions": len(recs),
            "rows": sum(r.get("row_count", 0) for r in recs),
            "bytes_in": sum(r.get("bytes_in", 0) for r in recs),
            "wall_s": sum(r.get("wall_s", 0.0) for r in recs),
        }


# --- snapshot (time-travel) reads over the ingest ledger ------------------

#: pseudo ingest id naming the store's state before any append
SNAPSHOT_BASE = "__base__"


class SnapshotUnavailable(ValueError):
    """The requested snapshot's delta files were folded into the base by a
    compaction — the history needed to reconstruct it no longer exists."""


def snapshot_files(rec: Dict, as_of: str, delta_name_fn) -> List[str]:
    """File names of ``rec`` as they stood right after ingest ``as_of``.

    Works off two manifest-record facts: ``ingests`` is the ORDERED ledger
    of every ingest the store has seen (all records carry the full ledger
    — untouched partitions get record-only updates), and ``deposits`` is
    the subset that actually wrote rows into THIS partition, each as a
    listed per-ingest delta file whose name is a pure function of the
    ingest id. A snapshot is reconstructible iff every post-``as_of``
    deposit still has its delta file listed separately; compaction folds
    them into the base and raises ``SnapshotUnavailable`` instead of
    silently returning wrong rows. ``SNAPSHOT_BASE`` names the
    pre-any-append state."""
    names = rec.get("files", ["rows.parquet"])
    ingests = rec.get("ingests", [])
    if as_of == SNAPSHOT_BASE:
        later = list(ingests)
    else:
        if as_of not in ingests:
            raise ValueError(f"unknown ingest id {as_of!r} "
                             f"(ledger: {ingests!r})")
        later = ingests[ingests.index(as_of) + 1:]
    # a retention expiry (zonemap.delete_range) REMOVED rows in place:
    # states STRICTLY BEFORE it are unreconstructible — refuse, don't
    # lie (as_of == the expiry itself, or later, reads fine)
    broken = [t for t in rec.get("truncated_at", []) if t in later]
    if broken:
        raise SnapshotUnavailable(
            f"snapshot {as_of!r}: rows were expired in place by "
            f"ingests {broken!r}")
    later_dep = [j for j in later if j in rec.get("deposits", [])]
    drop = {delta_name_fn(j) for j in later_dep}
    folded = [j for j in later_dep if delta_name_fn(j) not in names]
    if folded:
        raise SnapshotUnavailable(
            f"snapshot {as_of!r}: delta files of later ingests {folded!r} "
            "were compacted into the base")
    return [n for n in names if n not in drop]
