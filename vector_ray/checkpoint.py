"""Per-partition checkpoint manifests — resumable batch runs.

The batch analog of Vector's source checkpointing + delivery acks
(lib/file-source-common/src/checkpointer.rs:21-49 persists offsets to
checkpoints.json; finalization.rs:320-334 gates checkpoint advance on
sink acknowledgement).  For a bounded Parquet→Parquet run the same
guarantee is: a partition is "acknowledged" once its output directory
is fully written and its manifest committed atomically; a rerun
processes only partitions without a manifest.

Layout::

    out_dir/
      part-00000/ ... parquet files ...
      part-00001/ ...
      _manifest/part-00000.json   {"partition", "inputs", "rows",
                                   "wall_secs", "stage_metrics", ...}

Commit protocol: write outputs to ``part-X.tmp/`` → fsync-free atomic
``os.replace`` to ``part-X/`` → write manifest ``.tmp`` → replace.
A crash between the two leaves a completed directory without a
manifest: the rerun re-does that partition idempotently (overwrite),
which is the documented at-least-once guarantee.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional, Sequence


def _default_partition_of(f: str) -> str:
    """Stable partition id from the FULL input path — two shards with
    the same basename in different subdirectories (hive partitioning
    produces exactly that) must not collide to one pid.

    FORMAT BREAK vs the round-1 ``part-<basename>`` layout: resume
    recognizes legacy manifests too (``_legacy_partition_of``), so runs
    checkpointed under the old ids skip their completed partitions
    instead of silently reprocessing them (ADVICE r2)."""
    base = os.path.splitext(os.path.basename(f))[0]
    return f"part-{base}-{hashlib.md5(f.encode()).hexdigest()[:8]}"


def _legacy_partition_of(f: str) -> str:
    """Round-1 default partition id (basename only)."""
    base = os.path.splitext(os.path.basename(f))[0]
    return f"part-{base}"


class PartitionCheckpointer:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _mpath(self, pid: str) -> str:
        return os.path.join(self.manifest_dir, f"{pid}.json")

    def is_done(self, pid: str) -> bool:
        return os.path.exists(self._mpath(pid))

    def pending(self, pids: Sequence[str]) -> List[str]:
        return [p for p in pids if not self.is_done(p)]

    def load(self, pid: str) -> dict:
        with open(self._mpath(pid)) as f:
            return json.load(f)

    def manifests(self) -> Dict[str, dict]:
        out = {}
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.endswith(".json"):
                out[f[:-5]] = json.load(open(os.path.join(self.manifest_dir, f)))
        return out

    def partition_dir(self, pid: str) -> str:
        return os.path.join(self.out_dir, pid)

    def commit(self, pid: str, meta: dict) -> None:
        """Atomically record a completed partition (tmp + rename)."""
        path = self._mpath(pid)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"partition": pid, "completed_at": time.time(), **meta}, f)
        os.replace(tmp, path)


def run_partitioned(
    input_files: Sequence[str],
    process: Callable,
    out_dir: str,
    partition_of: Optional[Callable[[str], str]] = None,
    deep_hash: bool = False,
) -> Dict[str, dict]:
    """Process each input shard as one resumable partition.

    ``process(input_file, out_partition_dir) -> dict`` runs the Ray
    pipeline for one shard and returns metrics for the manifest (must
    include "rows").  Completed partitions (manifest present) are
    SKIPPED — the resume guarantee.  Output lands in ``part dir.tmp``
    then renames, so partial writes never count as done.

    Returns {pid: manifest} for this run's newly completed partitions.
    """
    ckpt = PartitionCheckpointer(out_dir)
    use_default = partition_of is None
    partition_of = partition_of or _default_partition_of
    done: Dict[str, dict] = {}
    for f in input_files:
        pid = partition_of(f)
        if ckpt.is_done(pid):
            continue
        # accept manifests committed under the round-1 default id, so
        # upgrading does not reprocess (and re-append) completed work
        if use_default and ckpt.is_done(_legacy_partition_of(f)):
            continue
        pdir = ckpt.partition_dir(pid)
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)  # idempotent overwrite
        os.makedirs(tmp, exist_ok=True)
        t0 = time.time()
        metrics = process(f, tmp)
        # content lineage: hash over the partition's output file names
        # and sizes (cheap — no output re-read, which at 100 TB would
        # double the I/O), so a resume audit catches truncated or
        # out-of-band-replaced partitions.  deep_hash=True additionally
        # digests the bytes for forensic-grade verification.
        content = hashlib.md5()
        all_files = []
        for root, _dirs, files in os.walk(tmp):
            for name in files:
                all_files.append(os.path.join(root, name))
        # sort by RELATIVE path (os.walk's directory order is fs-dependent)
        # and separate fields so ("a","12") never collides with ("a1","2")
        for p in sorted(all_files, key=lambda f: os.path.relpath(f, tmp)):
            content.update(os.path.relpath(p, tmp).encode())
            content.update(b"\0")
            content.update(str(os.path.getsize(p)).encode())
            content.update(b"\0")
            if deep_hash:
                with open(p, "rb") as fh:
                    for chunk in iter(lambda: fh.read(1 << 20), b""):
                        content.update(chunk)
        os.replace(tmp, pdir)
        meta = {
            "inputs": [f],
            "wall_secs": round(time.time() - t0, 3),
            "content_hash": content.hexdigest(),
            **(metrics or {}),
        }
        ckpt.commit(pid, meta)
        done[pid] = meta
    return done
