"""The two physical results plans (driver broadcast vs cluster-id hash
partition) must produce identical rows — the distributed plan is the
>driver_results_max path that production-scale runs take."""

from dataclasses import replace

import pandas as pd

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.fixtures import make_corpus
from deduplidog_ray.pipelines.dedup import NearDupPipeline


def _run(table, cfg):
    import ray.data as rd

    df = NearDupPipeline(cfg).run(rd.from_arrow(table)).to_pandas()
    df["reasons"] = df["reasons"].map(lambda r: tuple(r))
    return df.sort_values("clip_id").reset_index(drop=True)


def test_distributed_results_path_matches_driver_path(ray_session):
    table, _ = make_corpus(n_clusters=6, n_singletons=5, seed=7)
    cfg = DedupConfig()
    driver = _run(table, cfg)
    dist = _run(
        table,
        replace(cfg, execution=replace(cfg.execution, driver_results_max=0)),
    )
    pd.testing.assert_frame_equal(driver, dist)
