"""Data-contract validation: the admission check a corpus runs before
any expensive stage — cheap streaming counts of schema/payload
violations, plus the one check that needs an exchange (id uniqueness).

≙ the reference's upfront `check()` (deduplidog.py:348-416 — validate
the configuration and inputs before touching a file) lifted to the
DATA: a 100-TB ingest wants "how broken is this table" as one cheap
pass with per-check counts, not a crash in stage 7.

SCALE SHAPE: checks 2-5 are per-batch combiner partials (5 ints per
block, summed driver-side — nothing concentrates); the duplicate-id
check is one skinny (id-hash, id) exchange with in-partition TRUE-id
counting (the `pipelines/exact.py` collision rule). The payload is
never decoded — decodability is the decode stage's quarantine job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

CHECKS = (
    "duplicate_id",
    "empty_payload",
    "nonpositive_duration",
    "unknown_sample_rate",
    "empty_transcript",
)


def validate_clips(
    clips: ray.data.Dataset,
    allowed_srs: tuple = (8000, 16000, 22050),
    id_col: str = "clip_id",
    partitions: int = 32,
) -> pd.DataFrame:
    """Violation counts per contract check → (check, n_violations),
    sorted by check name. ``duplicate_id`` counts IDs occurring more
    than once (not the extra rows); the other checks count rows."""
    from deduplidog_ray.stages.hashing import hash_arrow_u64

    srs = pa.array(list(allowed_srs), type=pa.int32())

    def _partials(t: pa.Table) -> pa.Table:
        empty_b = pc.sum(pc.cast(pc.or_kleene(
            pc.is_null(t["bytes"]),
            pc.equal(pc.binary_length(t["bytes"]), 0),
        ), pa.int64())).as_py() or 0
        npos = pc.sum(pc.cast(
            pc.less_equal(t["dur_ms"], 0), pa.int64()
        )).as_py() or 0
        bad_sr = pc.sum(pc.cast(pc.invert(pc.fill_null(
            pc.is_in(t["sr_hz"], value_set=srs), False
        )), pa.int64())).as_py() or 0
        empty_t = pc.sum(pc.cast(pc.or_kleene(
            pc.is_null(t["transcript"]),
            pc.equal(pc.utf8_length(t["transcript"]), 0),
        ), pa.int64())).as_py() or 0
        return pa.table({
            "check": pa.array(list(CHECKS[1:]), type=pa.string()),
            "n": pa.array([empty_b, npos, bad_sr, empty_t],
                          type=pa.int64()),
        })

    counts = (
        clips.map_batches(_partials, batch_format="pyarrow",
                          zero_copy_batch=True)
        .to_pandas()
        .groupby("check", as_index=False)["n"].sum()
    )

    # duplicate ids: skinny exchange, true-id counting in-partition
    def _tag(t: pa.Table) -> pa.Table:
        h = hash_arrow_u64(t[id_col], seed=0x0A1)
        return pa.table({
            id_col: t[id_col],
            "_part": pa.array((h % np.uint64(partitions)).astype(np.int64)),
        })

    def _dups(g: pd.DataFrame) -> pd.DataFrame:
        n = int((g.groupby(id_col, sort=False).size() > 1).sum())
        return pd.DataFrame({"n": [n]})

    dup_n = int(
        clips.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(lambda g: _dups(g.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas()["n"].sum()
    )
    out = pd.concat(
        [counts, pd.DataFrame({"check": ["duplicate_id"], "n": [dup_n]})],
        ignore_index=True,
    ).rename(columns={"n": "n_violations"})
    out["n_violations"] = out["n_violations"].astype("int64")
    return out.sort_values("check").reset_index(drop=True)
