"""Incremental dedup: increment-vs-corpus operators.

Parity rule under test: the incremental near-dup run (corpus streaming,
never shuffled) must emit EXACTLY the pairs a full `text_near_dup_pairs`
run over corpus ∪ increment emits that touch at least one increment doc
— same multiset, same jaccard estimates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from deduplidog_ray.pipelines.incremental import (
    incremental_exact,
    incremental_text_near_dup_pairs,
)
from deduplidog_ray.pipelines.textdedup import text_near_dup_pairs

SF_DIR = "/root/testdata/sf0.001"


def _docs_split(mod: int = 3):
    ds = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )

    def _new(t: pa.Table) -> pa.Table:
        return t.filter(pa.array((t["doc_id"].to_numpy() % mod) != 0))

    def _old(t: pa.Table) -> pa.Table:
        return t.filter(pa.array((t["doc_id"].to_numpy() % mod) == 0))

    return (
        ds.map_batches(_new, batch_format="pyarrow", zero_copy_batch=True),
        ds.map_batches(_old, batch_format="pyarrow", zero_copy_batch=True),
        ds,
    )


def _pair_multiset(df: pd.DataFrame) -> list[tuple]:
    return sorted(
        zip(
            df["a"].astype(np.int64),
            df["b"].astype(np.int64),
            np.round(df["jaccard"].astype(np.float64), 6),
        )
    )


def test_incremental_near_dup_parity_with_full_run(ray_session):
    new, corpus, union = _docs_split()
    inc = incremental_text_near_dup_pairs(new, corpus).to_pandas()
    full = text_near_dup_pairs(union).to_pandas()
    new_ids = set(
        int(x) for x in new.select_columns(["doc_id"]).to_pandas()["doc_id"]
    )
    touching = full[
        full["a"].isin(new_ids) | full["b"].isin(new_ids)
    ].reset_index(drop=True)
    assert len(inc) > 0          # the fixture plants cross-split duplicates
    assert _pair_multiset(inc) == _pair_multiset(touching)
    # and the restriction is real: the full run also finds corpus-corpus
    # pairs that the incremental run must not emit
    assert len(touching) < len(full)


def test_incremental_near_dup_accepts_precomputed_corpus_sigs(ray_session):
    """Deployed shape: the corpus side is the persisted signature table
    (no text re-read). Must give identical pairs."""
    from deduplidog_ray.config import SignatureConfig
    from deduplidog_ray.pipelines.textdedup import make_text_signature_stage

    new, corpus, _ = _docs_split()
    cfg = SignatureConfig()
    sigs = corpus.map_batches(
        make_text_signature_stage(cfg, "text", "doc_id"),
        batch_format="pyarrow",
        batch_size=4096,
        zero_copy_batch=True,
    )
    a = incremental_text_near_dup_pairs(new, corpus, cfg).to_pandas()
    b = incremental_text_near_dup_pairs(
        new, corpus, cfg, corpus_sigs=sigs
    ).to_pandas()
    assert _pair_multiset(a) == _pair_multiset(b)


def test_incremental_exact_semantics(ray_session):
    """Keep-first within the increment; drop any increment key already in
    the corpus; corpus rows never appear in the output."""
    new_tbl = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
            "k": ["a", "a", "b", "c"],  # 10/11 dup within increment
        }
    )
    corpus_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "k": ["b", "z"],            # "b" already ingested
        }
    )
    out = incremental_exact(
        ray.data.from_arrow(new_tbl),
        ray.data.from_arrow(corpus_tbl),
        ["k"],
        "doc_id",
    ).to_pandas()
    assert sorted(out["doc_id"]) == [10, 13]


def test_incremental_exact_large_increment(ray_session):
    """120k-row increment through the vectorized anti-join (VERDICT r2 #2:
    no per-row Python in _drop_seen). Semantics checked against a pandas
    reference over the same synthetic keys."""
    n = 120_000
    ids = np.arange(n, dtype=np.int64)
    # ~40k distinct keys in the increment → heavy keep-first work;
    # corpus holds every 7th key → heavy anti-join work
    new_keys = (ids % 40_000).astype(str)
    corpus_ids = np.arange(5_000, dtype=np.int64)
    corpus_keys = (corpus_ids * 7 % 40_000).astype(str)
    new_ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "k": new_keys})
    ).repartition(8)
    corpus_ds = ray.data.from_arrow(
        pa.table({"doc_id": corpus_ids + 10_000_000, "k": corpus_keys})
    ).repartition(4)
    out = incremental_exact(new_ds, corpus_ds, ["k"], "doc_id").to_pandas()
    # reference: keep-first per key within increment, then drop corpus keys
    ref = (
        pd.DataFrame({"doc_id": ids, "k": new_keys})
        .sort_values("doc_id", kind="stable")
        .drop_duplicates("k", keep="first")
    )
    ref = ref[~ref["k"].isin(set(corpus_keys))]
    assert sorted(out["doc_id"]) == sorted(ref["doc_id"])


def test_incremental_exact_multi_key(ray_session):
    """Composite keys take the merge-indicator path; true-key equality
    (not just hash equality) decides."""
    new_tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "k1": ["a", "a", "b", "b"],
            "k2": ["x", "y", "x", "y"],
        }
    )
    corpus_tbl = pa.table(
        {
            "doc_id": pa.array([100, 101], type=pa.int64()),
            "k1": ["a", "b"],
            "k2": ["y", "x"],  # collides with ids 2 and 3
        }
    )
    out = incremental_exact(
        ray.data.from_arrow(new_tbl),
        ray.data.from_arrow(corpus_tbl),
        ["k1", "k2"],
        "doc_id",
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1, 4]


def test_incremental_exact_empty_sides(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], type=pa.int64()), "k": ["a", "b"]}
    )
    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "k": pa.array([], type=pa.string())}
    )
    # empty corpus → increment passes through (keep-first applies)
    out = incremental_exact(
        ray.data.from_arrow(tbl), ray.data.from_arrow(empty), ["k"], "doc_id"
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]
    # empty increment → empty output
    out2 = incremental_exact(
        ray.data.from_arrow(empty), ray.data.from_arrow(tbl), ["k"], "doc_id"
    ).to_pandas()
    assert len(out2) == 0
