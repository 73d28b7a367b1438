"""deduplidog_ray — a Ray-Data-native near-duplicate detection + clustering engine.

Re-expresses the duplicate semantics of CZ-NIC/deduplidog (reference at
/root/reference, v0.7.2 — a single-process interactive file deduplicator)
as a streaming DAG of ``ray.data.Dataset`` stages over a Lance/Parquet
table of audio clip + transcript pairs:

    read → decode/fingerprint (actor pool) → normalize → signatures
    (MinHash / SimHash / winnowing) → band flat-map → groupby(band)
    shuffle (salted) → pair verify → union-find clustering →
    canonicalize → write (+ per-partition lineage/metrics)

This is NOT a port: the reference tells us *what* duplicate semantics to
compute (see SURVEY.md), not *how*. Everything here is built on the public
Ray Data / pyarrow / numpy APIs.
"""

from deduplidog_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
