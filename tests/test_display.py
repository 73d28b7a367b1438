"""Common-prefix display shortening (pipelines/display.py — reference
G3): distributed min/max prefix computation, joint pair-column prefix,
snap-to-separator, placeholder, layout invariance."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from deduplidog_ray.pipelines.display import common_prefix_of, shorten_paths


def _ds(vals, col="path", blocks=1):
    ds = rd.from_arrow(pa.table({col: pa.array(vals, pa.string())}))
    return ds.repartition(blocks) if blocks > 1 else ds


def test_common_prefix_basic_and_layout_invariant(ray_session):
    vals = [f"/data/shard{i:02d}/file{i}.parquet" for i in range(37)]
    assert common_prefix_of(_ds(vals), "path") == "/data/shard"
    # same answer regardless of block layout (min/max is associative)
    assert common_prefix_of(_ds(vals, blocks=9), "path") == "/data/shard"
    assert common_prefix_of(_ds(list(reversed(vals)), blocks=4), "path") == (
        "/data/shard"
    )


def test_joint_prefix_over_pair_columns(ray_session):
    """The reference trims the prefix shared by BOTH sides of a change
    pair (deduplidog.py:793) — cols are pooled, not per-column."""
    t = pa.table(
        {
            "work": ["/mnt/a/work/x.mp4", "/mnt/a/work/y.mp4"],
            "orig": ["/mnt/a/orig/x.mp4", "/mnt/a/orig/y.mp4"],
        }
    )
    ds = rd.from_arrow(t)
    assert common_prefix_of(ds, ["work", "orig"]) == "/mnt/a/"
    out, prefix = shorten_paths(ds, ["work", "orig"])
    df = out.to_pandas()
    assert prefix == "/mnt/a/"
    assert sorted(df["work_disp"]) == ["work/x.mp4", "work/y.mp4"]
    assert sorted(df["orig_disp"]) == ["orig/x.mp4", "orig/y.mp4"]


def test_snap_to_separator_and_placeholder(ray_session):
    # raw prefix "/d/ab" would cut mid-component; snapped back to "/d/"
    out, prefix = shorten_paths(_ds(["/d/abc", "/d/abd"]), "path")
    assert prefix == "/d/"
    assert sorted(out.to_pandas()["path_disp"]) == ["abc", "abd"]
    # identical values strip to nothing → placeholder (≙ "(basedir)")
    out, prefix = shorten_paths(_ds(["/same/p.txt", "/same/p.txt"]), "path")
    assert prefix == "/same/"
    assert set(out.to_pandas()["path_disp"]) == {"p.txt"}
    out, _ = shorten_paths(
        _ds(["/same/", "/same/"]), "path", snap_to_sep=False
    )
    assert set(out.to_pandas()["path_disp"]) == {"(basedir)"}
    # raw-cut mode mirrors the reference's character cut
    out, prefix = shorten_paths(
        _ds(["/d/abc", "/d/abd"]), "path", snap_to_sep=False
    )
    assert prefix == "/d/ab" and sorted(out.to_pandas()["path_disp"]) == [
        "c",
        "d",
    ]


def test_nulls_and_no_shared_prefix(ray_session):
    t = pa.table({"path": pa.array(["x/1", None, "y/2"], pa.string())})
    assert common_prefix_of(rd.from_arrow(t), "path") == ""
    out, prefix = shorten_paths(rd.from_arrow(t), "path")
    assert prefix == ""
    got = out.to_pandas()["path_disp"]
    assert set(got.dropna()) == {"x/1", "y/2"}


def test_search_media_id_and_transcript(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from deduplidog_ray.pipelines.display import search_media

    t = pa.table({
        "clip_id": ["clip_000000042_o", "clip_000000042_d",
                    "clip_000000777_o", "other_099"],
        "transcript": ["alpha beta", "alpha beta", "needle in haystack",
                       None],
        "dur_ms": [600, 600, 900, 100],
        "bytes": [b"x", b"y", b"z", b"w"],
    })
    ds = rd.from_arrow(t)
    # id substring, case-insensitive, payload excluded via projection
    got = search_media(
        ds, "00042", columns=["clip_id", "dur_ms"]
    ).to_pandas()
    assert sorted(got["clip_id"]) == ["clip_000000042_d",
                                      "clip_000000042_o"]
    assert list(got.columns) == ["clip_id", "dur_ms"]
    # transcript search finds content the id never carries
    got2 = search_media(
        rd.from_arrow(t), "NEEDLE", text_cols=["transcript"],
        columns=["clip_id"],
    ).to_pandas()
    assert list(got2["clip_id"]) == ["clip_000000777_o"]
    # null text columns never match / never crash
    got3 = search_media(
        rd.from_arrow(t), "zzz-no-hit", text_cols=["transcript"]
    ).to_pandas()
    assert len(got3) == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        search_media(rd.from_arrow(t), "")
