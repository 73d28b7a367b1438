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

def _tune_malloc() -> None:
    """Retain freed heap pages instead of returning them to the kernel.

    glibc malloc serves every allocation above ~128 KiB with a fresh
    ``mmap`` and gives the pages back on free, so each large numpy temp in
    the hot kernels re-pays minor-fault cost on first touch. On
    virtualized hosts where fault servicing is slow (measured here:
    30-100 MB/s first-touch vs GB/s re-touch) that dominates wall time.
    Raising M_MMAP_THRESHOLD and disabling trim keeps the heap at its
    high-watermark so steady-state batch temps never fault again —
    standard allocator tuning (same retention policy jemalloc/tcmalloc
    default to). Runs in every process that imports this package,
    including Ray workers deserializing our UDFs; no-op off glibc.
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: keep big allocs on heap
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: never give pages back
    except (OSError, AttributeError):  # musl/macOS — defaults are fine
        pass


_tune_malloc()

from deduplidog_ray.config import DedupConfig  # noqa: E402

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
