"""Per-partition checkpointing with lineage metadata + metrics.

≙ the reference's resume machinery — ordinal ``skip=N`` cursor + ``✓``
filename markers (deduplidog/deduplidog.py:196-197, :433-441, :457-459,
:464-467) — re-expressed for a distributed batch engine (north rule):

- the input is split into partitions (groups of input file fragments);
- each partition's signature table is written atomically
  (``<workdir>/<stage>/part-NNNNN.parquet`` via tmp + rename) and recorded
  in ``manifest.jsonl`` with lineage: semantic config hash, partition id,
  the input fragment paths, row count, wall seconds, rows/sec;
- on restart, partitions already in the manifest *under the same semantic
  config hash* are skipped (the anti-join on lineage the survey calls for);
  a config change invalidates the checkpoint automatically.

The manifest doubles as the per-partition throughput metrics stream; skew
metrics (hot-key histogram) are written separately by the pipeline.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


@dataclass
class PartitionRecord:
    stage: str
    partition: int
    config: str
    fragments: list[str]
    rows: int
    seconds: float

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds > 0 else 0.0


class CheckpointManager:
    def __init__(self, workdir: str, semantic_hash: str) -> None:
        self.workdir = workdir
        self.semantic_hash = semantic_hash
        os.makedirs(workdir, exist_ok=True)
        self.manifest_path = os.path.join(workdir, "manifest.jsonl")

    # ---------------------------------------------------------- manifest
    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        out = []
        with open(self.manifest_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def done_partitions(self, stage: str) -> set[int]:
        """Partitions whose LATEST manifest line matches the current
        semantic config. Latest-line semantics (same rule as
        :meth:`is_done`): a later run under a different config overwrote
        the partition directory in place, so an OLD matching line must
        not certify the on-disk data — after a config flip A→B→A, the
        dir holds B's output until A recomputes it."""
        last: dict[int, str] = {}
        for r in self._read_manifest():
            if r["stage"] == stage:
                last[r["partition"]] = r["config"]
        return {p for p, cfg in last.items() if cfg == self.semantic_hash}

    def fragments_hash(self, fragments: list[str]) -> str:
        """Input-lineage hash: paths + sizes + mtimes of a partition's
        fragments. Any added/removed/rewritten input fragment changes the
        hash and invalidates the partition (ADVICE r1: config hash alone
        let a changed data dir silently reuse stale checkpoints)."""
        import hashlib

        h = hashlib.blake2b(digest_size=8)
        for p in sorted(fragments):
            try:
                st = os.stat(p)
                h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(p.encode())
        return h.hexdigest()

    def is_done(self, stage: str, pid: int, input_hash: str | None = None) -> bool:
        """True iff the LATEST manifest line for (stage, pid) matches the
        current semantic config AND (when given) the input lineage hash."""
        last: dict | None = None
        for r in self._read_manifest():
            if r["stage"] == stage and r["partition"] == pid:
                last = r
        if last is None or last["config"] != self.semantic_hash:
            return False
        return input_hash is None or last.get("input_hash") == input_hash

    def stage_files_for(self, stage: str, pids) -> list[str]:
        """Parquet files for an explicit pid list (the current run's
        partitioning — excludes stale higher-numbered partitions left by a
        previous run over a larger input)."""
        import glob

        out: list[str] = []
        for p in sorted(pids):
            out.extend(
                sorted(
                    glob.glob(
                        os.path.join(self.partition_dir(stage, p), "*.parquet")
                    )
                )
            )
        return out

    def metrics(self) -> list[dict]:
        return self._read_manifest()

    # ------------------------------------------------------------ stages
    def partition_dir(self, stage: str, pid: int) -> str:
        return os.path.join(self.workdir, stage, f"part-{pid:05d}")

    def stage_dirs(self, stage: str) -> list[str]:
        done = self.done_partitions(stage)
        return [self.partition_dir(stage, p) for p in sorted(done)]

    def stage_files(self, stage: str) -> list[str]:
        """All parquet part files of completed partitions (read_parquet
        wants files when given a list)."""
        import glob

        out: list[str] = []
        for d in self.stage_dirs(stage):
            out.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        return out

    def write_partition(self, stage: str, pid: int, ds, fragments: list[str],
                        t_start: float, input_hash: str | None = None) -> None:
        """Atomically write one partition's output + manifest line.

        ``ds`` is a ray.data.Dataset — written to a tmp dir then renamed,
        so a kill mid-write never yields a half-recorded partition.
        """
        final = self.partition_dir(stage, pid)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)      # executes the partition pipeline (once)
        import pyarrow.dataset as pads

        rows = pads.dataset(tmp, format="parquet").count_rows()
        os.makedirs(os.path.dirname(final), exist_ok=True)
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        rec = PartitionRecord(
            stage=stage,
            partition=pid,
            config=self.semantic_hash,
            fragments=fragments,
            rows=rows,
            seconds=time.monotonic() - t_start,
        )
        line = {
            **rec.__dict__,
            "rows_per_sec": rec.rows_per_sec,
            "input_hash": (
                input_hash
                if input_hash is not None
                else self.fragments_hash(fragments)
            ),
        }
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(line) + "\n")

    def write_skew_metrics(self, hot_keys: dict[int, int], cap: int) -> None:
        path = os.path.join(self.workdir, "skew_metrics.json")
        with open(path, "w") as f:
            json.dump(
                {
                    "hot_band_cap": cap,
                    "n_hot_keys": len(hot_keys),
                    "max_salts": max(hot_keys.values()) if hot_keys else 0,
                    "config": self.semantic_hash,
                },
                f,
            )


def cached_stage(
    workdir: str,
    stage: str,
    semantic_hash: str,
    input_files: list[str],
    build_fn,
):
    """Generic stage-granular resume for ANY pipeline (not just the
    flagship): run ``build_fn() -> ray.data.Dataset`` once, persist the
    result atomically under ``workdir/stage`` with lineage (semantic
    config hash + input fragment paths/sizes/mtimes), and on every later
    call with the SAME config and inputs return the persisted parquet
    without recomputing. Any config or input change invalidates
    automatically — the same rules the flagship's per-partition
    signature checkpoint enforces, packaged for one-shot stages
    (a decontam gram census, a trained BPE merge table, an IVF coarse
    quantizer) whose recompute dominates a resumed run.

    The write is tmp+rename (kill-safe); the returned Dataset reads the
    checkpoint files, so downstream stages see identical blocks on the
    first and every later run — deterministic resume, not merely cached.
    """
    import ray.data

    ckpt = CheckpointManager(workdir, semantic_hash)
    input_hash = ckpt.fragments_hash(input_files)
    if ckpt.is_done(stage, 0, input_hash):
        files = ckpt.stage_files_for(stage, [0])
        if files:
            return ray.data.read_parquet(files)
    t0 = time.monotonic()
    ckpt.write_partition(stage, 0, build_fn(), input_files, t0,
                         input_hash=input_hash)
    return ray.data.read_parquet(ckpt.stage_files_for(stage, [0]))
