"""Sidecar-metadata application (reference J4, utils.py:196-205):
truncated-key broadcast lookup, COALESCE overwrite, attach-only
columns, ambiguity guard."""

import pandas as pd
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.joins import apply_sidecar_metadata


def _base():
    return pd.DataFrame({
        "clip_id": [
            "album/PXL_20230101_very_long_name_beyond_forty_six_chars_A.jpg",
            "album/PXL_20230101_very_long_name_beyond_forty_six_chars_B.jpg",
            "short_name.jpg",
            "album/other_item_without_any_sidecar_companion_entry.jpg",
        ],
        "ts_taken": [10, 20, 30, 40],
        "codec": ["jpeg"] * 4,
    })


def test_truncated_key_overwrite_and_attach(ray_session):
    df = _base()
    # key = name[:46] — the A/B rows share it ONLY beyond the cut, so a
    # 46-char sidecar key must hit BOTH (the Google-Photos failure mode
    # the reference works around)
    shared = df["clip_id"][0][:46]
    assert shared == df["clip_id"][1][:46]
    sidecar = pd.DataFrame({
        "key": [shared, "short_name.jpg"],
        "ts_taken": [1111, None],
        "camera": ["pixel", "cam0"],
    })
    out = (
        apply_sidecar_metadata(rd.from_pandas(df), sidecar,
                               key_col="clip_id")
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    exp = df.sort_values("clip_id").reset_index(drop=True)
    # sorted order: A, B, album/other..., short_name.jpg
    hit = out["sidecar_applied"].to_numpy()
    assert list(hit) == [True, True, False, True]
    assert list(out["ts_taken"]) == [1111, 1111, 40, 30]  # null sidecar
    # value keeps the original (COALESCE), unmatched rows untouched
    assert list(out["camera"].fillna("")) == ["pixel", "pixel", "", "cam0"]
    # untouched columns ride through
    assert (out["codec"] == exp["codec"]).all()


def test_duplicate_sidecar_keys_raise(ray_session):
    sidecar = pd.DataFrame({
        "key": ["k1", "k1"], "ts_taken": [1, 2],
    })
    with pytest.raises(ValueError, match="ambiguous"):
        apply_sidecar_metadata(rd.from_pandas(_base()), sidecar,
                               key_col="clip_id")


def test_int64_overwrite_keeps_dtype_and_precision(ray_session):
    big = (1 << 60) + 12345   # above 2^53: float64 would corrupt it
    df = pd.DataFrame({
        "clip_id": ["a", "b"],
        "ts_taken": pd.array([big, big + 7], dtype="int64"),
    })
    sidecar = pd.DataFrame({"key": ["a"],
                            "ts_taken": [(1 << 60) + 999]})
    out = (
        apply_sidecar_metadata(rd.from_pandas(df), sidecar,
                               key_col="clip_id", key_trunc=46)
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    assert str(out["ts_taken"].dtype) == "int64"
    assert int(out["ts_taken"][0]) == (1 << 60) + 999   # exact overwrite
    assert int(out["ts_taken"][1]) == big + 7           # exact untouched
