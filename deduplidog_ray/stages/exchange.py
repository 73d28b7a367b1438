"""Shared external-shuffle (hive exchange) utilities.

The flagship near-dup pipeline routes its skinny band rows with a
MapReduce-style exchange — a map-side hive-partitioned parquet write
followed by ONE read+kernel task per partition — instead of Ray's
sort-based ``groupby().map_groups`` (no global sort, no key sampling, no
driver barrier; measured ~3x faster on skinny-row workloads, see
``pipelines/dedup.py:_pairs_hive_exchange``). This module holds the two
pieces every hive-exchange user needs so other operators (landmark audio
fingerprinting, …) can share them instead of growing private copies:

* :func:`exchange_base` — where exchange directories live. With shared
  storage (a workdir on S3/NFS) that path is the classic external-shuffle
  location; on one node tmpfs (``/dev/shm``) keeps the exchange in memory
  so it does not pay disk bandwidth a real cluster's shuffle would not.
* :func:`hive_safe` — whether a directory exchange is CORRECT here: map
  tasks write partitions that every reduce task must be able to read,
  which holds trivially on one node and on a cluster only for shared
  storage (asserted via ``DEDUPLIDOG_SHARED_EXCHANGE=1``; ADVICE r1).

Callers keep Ray's sort-based groupby as the fallback for multi-node
clusters without shared storage — same kernels, different routing.
"""

from __future__ import annotations

import os

import ray

__all__ = ["exchange_base", "hive_safe"]


def exchange_base(workdir: str | None = None) -> str:
    """Exchange-directory root (see module docstring)."""
    if workdir:
        return workdir
    shm = "/dev/shm/deduplidog_ray_exchange"
    try:
        os.makedirs(shm, exist_ok=True)
        return shm
    except OSError:  # pragma: no cover — no tmpfs: fall back to /tmp
        return "/tmp/deduplidog_ray_exchange"


def hive_safe(workdir: str | None = None) -> bool:
    """True when a directory exchange is readable by every reduce task:
    single alive node, or shared storage asserted by the operator with
    ``DEDUPLIDOG_SHARED_EXCHANGE=1``. On a multi-node cluster the
    assertion only helps if the exchange actually LIVES on the shared
    storage — i.e. the caller supplied a ``workdir`` that
    :func:`exchange_base` will root at. Without one the exchange falls
    back to node-local tmpfs, where partitions written by remote
    workers are invisible to readers on other nodes and pairs would be
    silently dropped — so the env var alone is NOT enough."""
    alive = [n for n in ray.nodes() if n.get("Alive", False)]
    if len(alive) <= 1:
        return True
    return (
        os.environ.get("DEDUPLIDOG_SHARED_EXCHANGE") == "1"
        and workdir is not None
    )
