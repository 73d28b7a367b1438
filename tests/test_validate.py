"""Data-contract validation: planted violations counted exactly, clean
tables report zeros, duplicate ids counted once per id."""

import pandas as pd

import ray.data as rd

from deduplidog_ray.pipelines.validate import CHECKS, validate_clips


def _clips(rows):
    return rd.from_pandas(pd.DataFrame(
        rows,
        columns=["clip_id", "bytes", "sr_hz", "dur_ms", "transcript"],
    ))


def _counts(out):
    return dict(zip(out["check"], out["n_violations"]))


def test_clean_table_all_zero(ray_session):
    rows = [(f"c{i}", b"\x01", 8000, 100, "hi") for i in range(10)]
    out = validate_clips(_clips(rows))
    assert set(out["check"]) == set(CHECKS)
    assert (out["n_violations"] == 0).all()


def test_planted_violations(ray_session):
    rows = [(f"c{i}", b"\x01", 8000, 100, "hi") for i in range(10)]
    rows += [
        ("c0", b"\x01", 8000, 100, "hi"),     # dup of c0 (twice more:
        ("c0", b"\x01", 8000, 100, "hi"),     # still ONE duplicated id)
        ("c1", b"\x01", 8000, 100, "hi"),     # second duplicated id
        ("e1", b"", 8000, 100, "hi"),         # empty payload
        ("e2", None, 8000, 100, "hi"),        # null payload
        ("d1", b"\x01", 8000, 0, "hi"),       # zero duration
        ("d2", b"\x01", 8000, -3, "hi"),      # negative duration
        ("s1", b"\x01", 44100, 100, "hi"),    # unknown rate
        ("t1", b"\x01", 8000, 100, ""),       # empty transcript
        ("t2", b"\x01", 8000, 100, None),     # null transcript
    ]
    got = _counts(validate_clips(_clips(rows)))
    assert got == {
        "duplicate_id": 2,
        "empty_payload": 2,
        "nonpositive_duration": 2,
        "unknown_sample_rate": 1,
        "empty_transcript": 2,
    }, got
