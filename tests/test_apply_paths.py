"""Dual-path parity for the apply-path operators (VERDICT r4 ask #2):
past ``broadcast_max`` the ray.put broadcast switches to the
co-partitioned hash_join — output must be identical either way, and
unmatched rows must read as singleton keeps on both paths."""

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.apply import annotate_actions, keep_canonical


def _fixture(n_clips: int = 400, n_results: int = 150, seed: int = 7):
    rng = np.random.default_rng(seed)
    clips = pd.DataFrame({
        "clip_id": [f"c{i:05d}" for i in range(n_clips)],
        "n_bytes": rng.integers(100, 10_000, n_clips),
        "payload": [f"blob{i}" for i in range(n_clips)],
    })
    # results cover a subset of clips: clusters of 3, one canonical per
    # cluster, a few quarantines
    rows = []
    for i in range(n_results):
        cl = f"c{(i // 3) * 3:05d}"
        action = ("quarantine" if i % 17 == 0
                  else ("keep" if i % 3 == 0 else "flag"))
        rows.append({
            "clip_id": f"c{i:05d}", "cluster_id": cl,
            "is_canonical": i % 3 == 0 and i % 17 != 0,
            "action": action,
        })
    return clips, pd.DataFrame(rows)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def test_keep_canonical_paths_identical(ray_session):
    clips, results = _fixture()
    broad = keep_canonical(
        rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)), rd.from_arrow(pa.Table.from_pandas(results, preserve_index=False)),
        broadcast_max=10_000,
    ).to_pandas()
    dist = keep_canonical(
        rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)), rd.from_arrow(pa.Table.from_pandas(results, preserve_index=False)),
        broadcast_max=3, partitions=8,   # force the hash_join path
    ).to_pandas()
    assert list(broad.columns) == list(clips.columns)
    assert list(dist.columns) == list(clips.columns)
    pd.testing.assert_frame_equal(_canon(broad), _canon(dist))
    # semantics spot-check: ONLY canonical non-quarantined results
    # survive — the results table is the complete keep plan (the
    # flagship emits one row per clip, singletons included), so clips
    # absent from it drop like any other non-canonical row
    surv = set(results[results["is_canonical"]
                       & (results["action"] != "quarantine")]["clip_id"])
    assert set(broad["clip_id"]) == surv


def test_annotate_actions_paths_identical(ray_session):
    clips, results = _fixture(seed=11)
    broad = annotate_actions(
        rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)), rd.from_arrow(pa.Table.from_pandas(results, preserve_index=False)),
        broadcast_max=10_000,
    ).to_pandas()
    dist = annotate_actions(
        rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)), rd.from_arrow(pa.Table.from_pandas(results, preserve_index=False)),
        broadcast_max=3, partitions=8,
    ).to_pandas()
    assert list(broad.columns) == list(dist.columns)
    pd.testing.assert_frame_equal(_canon(broad), _canon(dist))
    # unmatched rows are singleton keeps on both paths
    un = broad[~broad["clip_id"].isin(set(results["clip_id"]))]
    assert (un["cluster_id"] == un["clip_id"]).all()
    assert un["is_canonical"].all()
    assert (un["action"] == "keep").all()


def test_annotate_actions_empty_results(ray_session):
    clips, _ = _fixture(n_clips=20)
    empty = pd.DataFrame({
        "clip_id": pd.Series(dtype="object"),
        "cluster_id": pd.Series(dtype="object"),
        "is_canonical": pd.Series(dtype="bool"),
        "action": pd.Series(dtype="object"),
    })
    out = annotate_actions(
        rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)), rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))
    ).to_pandas()
    assert len(out) == 20
    assert (out["cluster_id"] == out["clip_id"]).all()
    assert out["is_canonical"].all()
    assert (out["action"] == "keep").all()
    kept = keep_canonical(
        rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)), rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))
    ).to_pandas()
    # with no results table rows, nothing is marked canonical → the
    # broadcast semi-join keeps nothing (results ARE the keep plan)
    assert len(kept) == 0


def test_annotate_actions_null_columns_coalesce_per_column(ray_session):
    """r5 review: a MATCHED results row with a null in one annotation
    column must keep its non-null columns on BOTH paths (per-column
    coalesce, not a single notna(cluster_id) match flag)."""
    clips = pd.DataFrame({
        "clip_id": ["c1", "c2", "c3"],
        "n_bytes": [1, 2, 3],
    })
    results = pd.DataFrame({
        "clip_id": ["c1", "c2"],
        "cluster_id": [None, "g2"],
        "is_canonical": pd.array([False, None], dtype="boolean"),
        "action": ["delete", None],
    })
    outs = {}
    for label, bmax in (("broadcast", 10_000), ("distributed", 0)):
        outs[label] = annotate_actions(
            rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(results, preserve_index=False)),
            broadcast_max=bmax, partitions=4,
        ).to_pandas().set_index("clip_id").sort_index()
    for label, df in outs.items():
        # c1: null cluster_id falls back to the clip id, but the row's
        # own action/is_canonical survive
        assert df.loc["c1", "cluster_id"] == "c1", label
        assert not df.loc["c1", "is_canonical"], label
        assert df.loc["c1", "action"] == "delete", label
        # c2: null is_canonical/action default, cluster kept
        assert df.loc["c2", "cluster_id"] == "g2", label
        assert df.loc["c2", "is_canonical"], label
        assert df.loc["c2", "action"] == "keep", label
        # c3: unmatched singleton
        assert df.loc["c3", "cluster_id"] == "c3", label
    pd.testing.assert_frame_equal(outs["broadcast"], outs["distributed"])


def test_keep_canonical_null_columns_agree_with_annotate(ray_session):
    """r5 review #2: a canonical row with a NULL action (or null
    is_canonical) must survive keep_canonical with the same defaults
    annotate_actions applies — null rows must not be silently dropped
    by the filter, on either path."""
    clips = pd.DataFrame({
        "clip_id": ["c1", "c2", "c3"],
        "n_bytes": [1, 2, 3],
    })
    results = pd.DataFrame({
        "clip_id": ["c1", "c2", "c3"],
        "cluster_id": ["g1", "g2", "g3"],
        "is_canonical": pd.array([True, None, True], dtype="boolean"),
        "action": [None, "keep", "quarantine"],
    })
    for label, bmax in (("broadcast", 10_000), ("distributed", 0)):
        kept = keep_canonical(
            rd.from_arrow(pa.Table.from_pandas(clips, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(results, preserve_index=False)),
            broadcast_max=bmax, partitions=4,
        ).to_pandas()
        # c1: canonical + null action (defaults to keep) -> kept
        # c2: null is_canonical (defaults to True) + keep -> kept
        # c3: quarantined -> dropped
        assert sorted(kept["clip_id"]) == ["c1", "c2"], label
