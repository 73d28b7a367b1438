"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    # heap-retention malloc tuning for Ray child processes (see
    # deduplidog_ray.__init__._tune_malloc) — must precede ray.init()
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus():
    """Small deterministic corpus with planted clusters + golden labels."""
    from deduplidog_ray.fixtures import make_corpus

    return make_corpus(n_clusters=6, n_singletons=5, seed=7)
