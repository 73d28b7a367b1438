"""Marker maintenance ops (pipelines/marks.py): flag-prefix undo,
link-target marking, fully-materialized group detection."""

import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.marks import (
    link_only_groups,
    mark_links_by_target,
    strip_flag_prefix,
)


def test_strip_flag_prefix(ray_session):
    df = pd.DataFrame({"clip_id": ["✓a.txt", "b.txt", "✓✓c", "✓"]})
    out = strip_flag_prefix(rd.from_pandas(df)).to_pandas()
    assert list(out["clip_id"]) == ["a.txt", "b.txt", "✓c", ""]
    assert list(out["was_flagged"]) == [True, False, True, True]


def test_mark_links_by_target(ray_session):
    df = pd.DataFrame({
        "clip_id": ["a", "b", "c", "d", "e", "f"],
        "action": ["link", "link", "flag", None, "link", "link"],
        "canonical_id": ["store/1/x", "store/2/x", "store/1/y", None,
                         "store/10/x",   # shares the string prefix only
                         "store/1"],     # exactly the tree root
    })
    out = mark_links_by_target(
        rd.from_pandas(df), target_prefix="store/1"
    ).to_pandas()
    # only link rows UNDER store/1 (segment boundary) get the arrow —
    # store/10 shares the character prefix but is a different tree
    assert list(out["clip_id"]) == ["→a", "b", "c", "d", "e", "→f"]
    assert list(out["marked"]) == [True, False, False, False,
                                   False, True]


def test_link_only_groups(ray_session):
    rows = []
    # cluster 0: keep + 2 links  -> fully materialized
    rows += [(0, "keep"), (0, "link"), (0, "link")]
    # cluster 1: keep + link + flag -> not
    rows += [(1, "keep"), (1, "link"), (1, "flag")]
    # cluster 2: singleton keep -> not (m < 2)
    rows += [(2, "keep")]
    # cluster 3: two keeps + link -> not (n_links != m-1)
    rows += [(3, "keep"), (3, "keep"), (3, "link")]
    df = pd.DataFrame(rows, columns=["cluster_id", "action"])
    out = link_only_groups(
        rd.from_pandas(df).repartition(3)  # layout-invariant partials
    ).to_pandas().sort_values("cluster_id").reset_index(drop=True)
    assert list(out["cluster_id"]) == [0]
    assert list(out["n_members"]) == [3]
    assert list(out["n_links"]) == [2]
