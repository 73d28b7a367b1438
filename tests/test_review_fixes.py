"""Regression gates for the round-3 review findings: float-order argmax,
kNN tie pools beyond argpartition's boundary, xcorr window aliasing,
text-cascade chained roots / null text, epoch_shuffle key ceiling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.audioalign import _xcorr_peak
from deduplidog_ray.pipelines.layout import epoch_shuffle
from deduplidog_ray.pipelines.similarity import nn_self_join
from deduplidog_ray.pipelines.stats import argmax_per_key
from deduplidog_ray.pipelines.tiered import tiered_dedup


def test_argmax_float_order_descending(ray_session):
    # float scores must not be truncated to int64 before negation:
    # 0.9 vs 0.2 both truncate to 0 and the tie column decides
    t = pa.table({
        "src": pa.array(["a", "a", "b", "b"]),
        "score": pa.array([0.2, 0.9, 0.31, 0.3], type=pa.float64()),
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
    })
    got = (
        argmax_per_key(rd.from_arrow(t), key_col="src", order_col="score",
                       tie_col="id", ascending=False)
        .to_pandas().sort_values("src")
    )
    assert got["id"].tolist() == [2, 3]


def test_nn_self_join_many_ties(ray_session):
    # 13 identical vectors, k=3: every query's neighbors all tie at
    # cos 1.0 — far more than the kk+8 argpartition pool — and the
    # winners must still be the 3 SMALLEST other ids
    n = 13
    vecs = [np.array([1.0, 0.0, 0.0])] * n
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    got = nn_self_join(rd.from_arrow(t), k=3).to_pandas()
    for q in range(n):
        nn = got.loc[got["vec_id"] == q].sort_values("rn")["nn_id"].tolist()
        expect = [i for i in range(n) if i != q][:3]
        assert nn == expect, (q, nn, expect)


def test_xcorr_out_of_window_peak_not_aliased():
    # short x contained in long y OUTSIDE the search window: the true
    # peak at +50000 must not wrap onto a bogus in-window negative lag
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 5000)
    y = np.zeros(60000)
    y[50000:55000] = x
    lag, corr = _xcorr_peak(x, y, max_lag=16000)
    assert corr < 0.5, (lag, corr)


def test_tiered_text_chained_roots_and_null_text(ray_session):
    base = ("alpha bravo charl delta echos foxtr golfy hotel india "
            "julie ")                                   # 55 chars
    a_txt = base + "kilom limas mikes novem"
    b_txt = base + "oscar papas quebec romeo"           # same 50-char prefix
    c_txt = "zulu " + a_txt                             # high token-gram overlap
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 7], type=pa.int64()),
        "text": pa.array([c_txt, a_txt, b_txt, None]),
    })
    eye = np.eye(4, dtype=np.float32)
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 7], type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in eye],
                              type=pa.list_(pa.float32())),
    })
    out = tiered_dedup(rd.from_arrow(docs), rd.from_arrow(emb))
    got = out.set_index("doc_id")
    # tier 1 removed B(2) under A(1); tier 2 removed A(1) under C(0);
    # B's reported root must resolve through A to C
    assert got.loc[1, "tier"] == "jaccard" and got.loc[1, "root"] == 0
    assert got.loc[2, "tier"] == "exact" and got.loc[2, "root"] == 0
    # null-text doc is quarantined, never merged
    assert 7 not in got.index
    assert 0 not in got.index


def test_epoch_shuffle_rejects_wide_ids(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 1 << 33], type=pa.int64())})
    # raised inside a Ray task -> surfaces wrapped in RayTaskError
    with pytest.raises(Exception, match=r"doc_id < 2\^32"):
        epoch_shuffle(rd.from_arrow(t)).to_pandas()


def test_incremental_multikey_corpus_key_across_batches(ray_session):
    from deduplidog_ray.pipelines.incremental import incremental_exact

    # the same corpus key appears in TWO corpus blocks: the anti-join's
    # right side must dedupe or the left-merge expands the batch mask
    corp1 = pa.table({"k1": ["a", "x"], "k2": ["p", "q"],
                      "id": pa.array([1, 2], type=pa.int64())})
    corp2 = pa.table({"k1": ["a", "y"], "k2": ["p", "r"],
                      "id": pa.array([3, 4], type=pa.int64())})
    corpus = rd.from_arrow_refs(
        [__import__("ray").put(corp1), __import__("ray").put(corp2)]
    )
    inc = pa.table({"k1": ["a", "z"], "k2": ["p", "z"],
                    "id": pa.array([10, 11], type=pa.int64())})
    out = incremental_exact(rd.from_arrow(inc), corpus,
                            ["k1", "k2"], "id").to_pandas()
    assert out["id"].tolist() == [11]          # (a,p) seen in corpus


def test_dataset_diff_hash_compare_floats(ray_session):
    from deduplidog_ray.pipelines.diff import dataset_diff

    old = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                    "score": pa.array([1.2, 2.0], type=pa.float64())})
    new = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                    "score": pa.array([1.9, 2.0], type=pa.float64())})
    out = dataset_diff(rd.from_arrow(old), rd.from_arrow(new),
                       ["id"], ["score"], hash_compare=True).to_pandas()
    # 1.2 -> 1.9 changed within the same integer part: must be reported
    assert out.set_index("id").loc[1, "status"] == "changed"
    assert 2 not in out["id"].tolist()


def test_hll_null_keys_and_float_values(ray_session):
    from deduplidog_ray.pipelines.sketches import hll_distinct_per_key

    t = pa.table({
        "src": pa.array(["a"] * 9 + ["zz"] + [None] * 50),
        "v": pa.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
                       1.5] + [float(i) for i in range(50)],
                      type=pa.float64()),
    })
    got = hll_distinct_per_key(rd.from_arrow(t), "src", "v")
    got = got.set_index("src")["approx_distinct"]
    # floats sharing an integer part are distinct values (bit hashing)
    assert got.loc["a"] == 9
    # the lexically-last key must NOT absorb the null-key rows
    assert got.loc["zz"] == 1
    assert None not in got.index and "None" not in got.index


def test_editdedup_and_spandedup_null_text(ray_session):
    from deduplidog_ray.pipelines.editdedup import edit_distance_dup_pairs
    from deduplidog_ray.pipelines.spandedup import dedup_repeated_spans

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["hello world text here", None,
                          "hello world text hers", None]),
    })
    pairs = edit_distance_dup_pairs(rd.from_arrow(t)).to_pandas()
    assert pairs.values.tolist() == [[1, 3]]   # nulls never pair
    spans = dedup_repeated_spans(rd.from_arrow(t), span_tokens=2).to_pandas()
    assert len(spans) == 4                      # null docs pass through
    assert spans.set_index("doc_id").loc[2, "n_spans"] == 0


def test_components_self_loop_only_node(ray_session):
    from deduplidog_ray.pipelines.components import connected_components

    pairs = pa.table({"a": pa.array([7, 1], type=pa.int64()),
                      "b": pa.array([7, 2], type=pa.int64())})
    got = (connected_components(rd.from_arrow(pairs))
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["id"].tolist() == [1, 2, 7]
    assert got["cluster_id"].tolist() == [1, 1, 7]


def test_chunk_docs_string_ids(ray_session):
    from deduplidog_ray.pipelines.chunking import chunk_docs

    t = pa.table({
        "doc_id": pa.array(["doc-001"]),
        "text": pa.array(["one two three four five six"]),
    })
    out = chunk_docs(rd.from_arrow(t), chunk_tokens=4, stride=4).to_pandas()
    assert out["doc_id"].tolist() == ["doc-001", "doc-001"]


def _ev_tbl(rows):
    ids, ks, ts, names = zip(*rows)
    return pa.table({
        "eid": pa.array(ids, type=pa.int64()),
        "k": pa.array(ks, type=pa.int64()),
        "ts": pa.array([None if t is None else
                        pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t)
                        for t in ts], type=pa.timestamp("us")),
        "name": pa.array(names, type=pa.string()),
    })


def test_asof_keyed_string_payload_and_null_ts(ray_session):
    from deduplidog_ray.pipelines.joins import asof_join_keyed

    build = _ev_tbl([(1, 5, None, "nullts"), (2, 5, 10, "early")])
    probe = _ev_tbl([(3, 5, 20, "p")])
    out = asof_join_keyed(
        rd.from_arrow(probe), rd.from_arrow(build), "k", "ts",
        payload_cols=["eid", "name"],
    ).to_pandas()
    # string payload rides the tagged union; the null-ts build row is
    # NOT the match (NaT would have been "earliest")
    assert len(out) == 1
    # null probe ts never matches either
    probe2 = _ev_tbl([(4, 5, None, "p2")])
    out2 = asof_join_keyed(
        rd.from_arrow(probe2), rd.from_arrow(build), "k", "ts",
        payload_cols=["eid"],
    ).to_pandas()
    assert len(out2) == 0


def test_asof_auto_string_keys_small_build(ray_session):
    from deduplidog_ray.pipelines.joins import asof_join_auto

    def _t(ids, keys, secs):
        return pa.table({
            "eid": pa.array(ids, type=pa.int64()),
            "k": pa.array(keys, type=pa.string()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
                 for s in secs], type=pa.timestamp("us")),
        })

    build = _t([1], ["u"], [10])
    probe = _t([2], ["u"], [20])
    out = asof_join_auto(rd.from_arrow(probe), rd.from_arrow(build),
                         "k", "ts", payload_cols=["eid"]).to_pandas()
    assert len(out) == 1           # small string-keyed build must not crash


def test_range_join_null_ts_no_crash(ray_session):
    from deduplidog_ray.pipelines.joins import range_join_keyed

    probe = _ev_tbl([(1, 5, 0, "a"), (2, 5, None, "b")])
    build = _ev_tbl([(3, 5, 2, "c")])
    out = range_join_keyed(
        rd.from_arrow(probe), rd.from_arrow(build), "k", "ts",
        probe_cols=["eid"], build_cols={"eid": "match_id"},
        range_seconds=10,
    ).to_pandas()
    assert out["eid"].tolist() == [1]


def test_argmax_null_order_never_wins(ray_session):
    t = pa.table({
        "src": pa.array(["a", "a"]),
        "ts": pa.array([pd.Timestamp("2024-01-02"), None],
                       type=pa.timestamp("us")),
        "id": pa.array([1, 2], type=pa.int64()),
    })
    got = argmax_per_key(rd.from_arrow(t), "src", "ts", "id",
                         ascending=False).to_pandas()
    assert got["id"].tolist() == [1]


def test_sample_hash_null_keys_dropped(ray_session):
    from deduplidog_ray.pipelines.sampling import sample_hash

    t = pa.table({"doc_id": pa.array([1, 2, None, 17], type=pa.int64())})
    out = sample_hash(rd.from_arrow(t), rate_num=1, rate_den=1).to_pandas()
    # rate 1/1 keeps every hashable row; the null key drops (SQL: NULL
    # predicate is not true), never a platform-dependent cast
    assert out["doc_id"].tolist() == [1, 2, 17]


def test_sort_rank_null_key_raises(ray_session):
    from deduplidog_ray.pipelines.sort import distributed_sort_rank

    t = pa.table({"v": pa.array([1, None, 3], type=pa.int64()),
                  "id": pa.array([1, 2, 3], type=pa.int64())})
    with pytest.raises(Exception, match="null key"):
        distributed_sort_rank(rd.from_arrow(t), "v", "id").to_pandas()


def test_checkpoint_config_flipflop(tmp_path):
    import json

    from deduplidog_ray.state.checkpoint import CheckpointManager

    a = CheckpointManager(str(tmp_path), "A")
    with open(a.manifest_path, "a") as f:
        # run under A, then rerun under B (the dir is overwritten in
        # place by write_partition) — the manifest keeps BOTH lines
        f.write(json.dumps({"stage": "sig", "partition": 0,
                            "config": "A"}) + "\n")
        f.write(json.dumps({"stage": "sig", "partition": 0,
                            "config": "B"}) + "\n")
    # the OLD matching A line must not certify B's on-disk data
    assert a.done_partitions("sig") == set()
    assert not a.is_done("sig", 0)
    b = CheckpointManager(str(tmp_path), "B")
    assert b.done_partitions("sig") == {0}
