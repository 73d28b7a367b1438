"""Hot-key salting path: skew handling without losing connectivity."""

from dataclasses import replace

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.fixtures import make_corpus
from deduplidog_ray.pipelines.dedup import NearDupPipeline


def test_hot_cluster_salted_and_connected(ray_session):
    import ray.data as rd

    table, golden = make_corpus(
        n_clusters=2, n_singletons=2, seed=11, hot_cluster_size=150
    )
    cfg = DedupConfig()
    cfg = replace(cfg, execution=replace(cfg.execution, hot_band_cap=24))
    pipe = NearDupPipeline(cfg)
    res = pipe.run(rd.from_arrow(table)).to_pandas()

    assert pipe.metrics["hot_keys"] > 0        # salting actually triggered
    hot_ids = [c for c, l in golden.items() if l == "hot"]
    roots = set(res[res["clip_id"].isin(hot_ids)]["cluster_id"])
    assert len(roots) == 1                     # all 150 connected via reps
