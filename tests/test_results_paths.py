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


def test_asof_auto_dispatch_parity(ray_session):
    """asof_join_auto must return identical rows whichever branch the
    build-side row count selects (broadcast index vs keyed shuffle)."""
    import ray.data as rd

    from deduplidog_ray.pipelines.joins import asof_join_auto, asof_join_keyed

    sf = "/root/testdata/sf0.001"
    build = rd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    probes = rd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def _norm(ds):
        df = ds.to_pandas()
        return df.sort_values(["event_id", "last_ts"]).reset_index(drop=True)

    kwargs = dict(
        key_col="user_id", ts_col="ts", payload_cols=["event_id"], strict=True
    )
    keyed = _norm(asof_join_keyed(probes, build, **kwargs))
    # threshold high -> broadcast branch; threshold 0 -> keyed branch
    bcast = _norm(asof_join_auto(probes, build, **kwargs))
    via_keyed = _norm(
        asof_join_auto(probes, build, broadcast_threshold_bytes=0, **kwargs)
    )
    pd.testing.assert_frame_equal(bcast[keyed.columns], keyed)
    pd.testing.assert_frame_equal(via_keyed[keyed.columns], keyed)
