"""Persistent landmark index: build once, probe many — planted crops
retrieved at frame-accurate offsets, probe reuse without rebuild,
agreement with the one-shot snippet_search."""

import os

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm_textured
from deduplidog_ray.pipelines.audioindex import (
    build_landmark_index,
    search_landmark_index,
)

SR = 8000


def _clip(cid: str, pcm: np.ndarray) -> dict:
    return {
        "clip_id": cid, "bytes": encode(pcm.astype(np.float32), SR,
                                        "pcm_s16le"),
        "sr_hz": SR, "dur_ms": int(1000 * len(pcm) / SR),
        "codec": "pcm_s16le",
    }


def _mk_queries(corpus_pcm, crops):
    qrows = []
    for qid, (src, start_ms) in crops.items():
        s = SR * start_ms // 1000
        qrows.append(_clip(qid, corpus_pcm[src][s: s + SR * 9 // 10]))
    qrows.append(_clip("q_none", make_pcm_textured(999, 900, SR)))
    return rd.from_pandas(pd.DataFrame(qrows))


def test_build_then_probe_twice(ray_session, tmp_path):
    corpus_pcm = {f"c{i}": make_pcm_textured(200 + i, 2500, SR)
                  for i in range(10)}
    corpus = rd.from_pandas(pd.DataFrame(
        [_clip(cid, p) for cid, p in corpus_pcm.items()]
    ))
    idx = build_landmark_index(corpus, str(tmp_path / "lmidx"),
                               partitions=8)
    assert os.path.exists(os.path.join(idx, "manifest.json"))
    assert os.path.exists(os.path.join(idx, "ids.parquet"))

    crops = {"q_a": ("c3", 700), "q_b": ("c7", 300)}
    out = search_landmark_index(idx, _mk_queries(corpus_pcm, crops))
    top = out[out["rank"] == 1].set_index("query_id")
    for qid, (src, start_ms) in crops.items():
        assert top.loc[qid, "clip_id"] == src
        assert abs(int(top.loc[qid, "offset_ms"]) - start_ms) <= 32
    assert "q_none" not in set(out["query_id"])

    # second probe batch against the SAME index dir — no rebuild
    crops2 = {"q_c": ("c0", 1200)}
    out2 = search_landmark_index(idx, _mk_queries(corpus_pcm, crops2))
    t2 = out2[out2["rank"] == 1].set_index("query_id")
    assert t2.loc["q_c", "clip_id"] == "c0"
    assert abs(int(t2.loc["q_c", "offset_ms"]) - 1200) <= 32


def test_index_probe_agrees_with_one_shot_search(ray_session, tmp_path):
    from deduplidog_ray.pipelines.audiofp import snippet_search

    corpus_pcm = {f"c{i}": make_pcm_textured(300 + i, 2000, SR)
                  for i in range(6)}
    corpus = rd.from_pandas(pd.DataFrame(
        [_clip(cid, p) for cid, p in corpus_pcm.items()]
    ))
    crops = {"q_a": ("c1", 500), "q_b": ("c4", 900)}
    queries = _mk_queries(corpus_pcm, crops)
    idx = build_landmark_index(corpus, str(tmp_path / "lmidx2"),
                               partitions=8)
    a = search_landmark_index(idx, queries)
    b = snippet_search(corpus, queries)
    am = a[a["rank"] == 1].set_index("query_id")
    bm = b[b["rank"] == 1].set_index("query_id")
    for qid in crops:
        assert am.loc[qid, "clip_id"] == bm.loc[qid, "clip_id"]
        assert int(am.loc[qid, "offset_ms"]) == int(bm.loc[qid, "offset_ms"])


def test_incremental_ingest(ray_session, tmp_path):
    from deduplidog_ray.pipelines.audioindex import extend_landmark_index

    base_pcm = {f"c{i}": make_pcm_textured(400 + i, 2000, SR)
                for i in range(5)}
    new_pcm = {f"n{i}": make_pcm_textured(500 + i, 2000, SR)
               for i in range(3)}
    idx = build_landmark_index(
        rd.from_pandas(pd.DataFrame(
            [_clip(c, p) for c, p in base_pcm.items()]
        )),
        str(tmp_path / "lmidx3"), partitions=8,
    )
    extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip(c, p) for c, p in new_pcm.items()]
    )))
    # a crop of an INGESTED clip is now retrievable, base clips still are
    crops = {"q_new": ("n1", 600), "q_old": ("c2", 400)}
    allpcm = {**base_pcm, **new_pcm}
    out = search_landmark_index(idx, _mk_queries(allpcm, crops))
    top = out[out["rank"] == 1].set_index("query_id")
    assert top.loc["q_new", "clip_id"] == "n1"
    assert abs(int(top.loc["q_new", "offset_ms"]) - 600) <= 32
    assert top.loc["q_old", "clip_id"] == "c2"

    # re-ingesting the same shard is idempotent (no duplicate votes)
    before = search_landmark_index(idx, _mk_queries(allpcm, crops))
    extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip(c, p) for c, p in new_pcm.items()]
    )))
    after = search_landmark_index(idx, _mk_queries(allpcm, crops))
    pd.testing.assert_frame_equal(before, after)

    # a genuine cid64 collision — same 64-bit routing key already bound
    # to a DIFFERENT clip_id in ids.parquet — must refuse the ingest
    # (plant the colliding entry directly; same-clip_id re-ingest above
    # is the idempotent path, not a collision)
    import pytest as _pytest
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from deduplidog_ray.pipelines.audiofp import _CID_SEED
    from deduplidog_ray.stages.hashing import hash_strings_u64

    victim_cid = int(
        hash_strings_u64(np.array(["x0"]), seed=_CID_SEED)
        .view(np.int64)[0]
    )
    ids_path = os.path.join(idx, "ids.parquet")
    known = _pq.read_table(ids_path).to_pandas()
    planted = pd.concat(
        [known, pd.DataFrame({"cid": [victim_cid],
                              "clip_id": ["not-x0"]})],
        ignore_index=True,
    )
    _pq.write_table(
        _pa.Table.from_pandas(planted, preserve_index=False), ids_path
    )
    with _pytest.raises(RuntimeError, match="collision"):
        extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
            [_clip("x0", make_pcm_textured(777, 1500, SR))]
        )))


def test_ingest_crash_recovery(ray_session, tmp_path):
    """A crash between the bucket-file moves and the ids.parquet commit
    must not leave the rerun appending the increment's landmark rows a
    second time (duplicate rows would inflate votes): the journal +
    commit-point protocol rolls the orphaned ingest back on the next
    call, and the rerun reproduces the clean post-ingest state."""
    import glob
    import json

    import pyarrow.parquet as _pq

    from deduplidog_ray.pipelines.audioindex import extend_landmark_index

    base_pcm = {f"c{i}": make_pcm_textured(600 + i, 2000, SR)
                for i in range(5)}
    new_pcm = {f"n{i}": make_pcm_textured(700 + i, 2000, SR)
               for i in range(3)}
    idx = build_landmark_index(
        rd.from_pandas(pd.DataFrame(
            [_clip(c, p) for c, p in base_pcm.items()]
        )),
        str(tmp_path / "lmidx_crash"), partitions=8,
    )
    ids_path = os.path.join(idx, "ids.parquet")
    ids_before = _pq.read_table(ids_path).to_pandas()
    extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip(c, p) for c, p in new_pcm.items()]
    )))
    allpcm = {**base_pcm, **new_pcm}
    crops = {"q_new": ("n1", 600), "q_old": ("c2", 400)}
    res_clean = search_landmark_index(idx, _mk_queries(allpcm, crops))

    # rewind to the mid-crash state: bucket files moved (+ meta written)
    # but ids.parquet NOT yet committed, journal still on disk
    ids_after = _pq.read_table(ids_path).to_pandas()
    new_cids = sorted(set(ids_after["cid"]) - set(ids_before["cid"]))
    assert len(new_cids) == 3
    ingested = glob.glob(os.path.join(idx, "buckets", "part=*",
                                      "ingest-*-*"))
    assert ingested, "ingest must append token-named bucket files"
    token = os.path.basename(ingested[0]).split("-")[1]
    jpath = os.path.join(idx, f"ingest-{token}.journal.json")
    with open(jpath, "w") as f:
        json.dump({"token": token,
                   "cids": [int(c) for c in new_cids]}, f)
    os.utime(jpath, (1, 1))   # age past the live-ingest grace window
    import pyarrow as _pa
    _pq.write_table(
        _pa.Table.from_pandas(ids_before, preserve_index=False), ids_path
    )

    # rerun the SAME ingest: reconcile removes the orphaned rows first,
    # so votes/offsets come out identical to the clean single ingest
    extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip(c, p) for c, p in new_pcm.items()]
    )))
    res2 = search_landmark_index(idx, _mk_queries(allpcm, crops))
    pd.testing.assert_frame_equal(res_clean, res2)
    assert not glob.glob(os.path.join(idx, "ingest-*.journal.json"))


def test_probe_reconciles_orphaned_ingest(ray_session, tmp_path):
    """A probe against an index whose last ingest crashed mid-move must
    not see the orphaned rows either: search_landmark_index reconciles
    on entry, so votes match a never-ingested index until the ingest is
    properly rerun."""
    import glob
    import json

    import pyarrow.parquet as _pq

    from deduplidog_ray.pipelines.audioindex import extend_landmark_index

    base_pcm = {f"c{i}": make_pcm_textured(800 + i, 2000, SR)
                for i in range(4)}
    new_pcm = {"n0": make_pcm_textured(900, 2000, SR)}
    idx = build_landmark_index(
        rd.from_pandas(pd.DataFrame(
            [_clip(c, p) for c, p in base_pcm.items()]
        )),
        str(tmp_path / "lmidx_probe"), partitions=8,
    )
    crops = {"q_old": ("c1", 500)}
    before = search_landmark_index(idx, _mk_queries(base_pcm, crops))

    ids_path = os.path.join(idx, "ids.parquet")
    ids_before = _pq.read_table(ids_path).to_pandas()
    extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip(c, p) for c, p in new_pcm.items()]
    )))
    # rewind to mid-crash: buckets moved, ids NOT committed, journal left
    ids_after = _pq.read_table(ids_path).to_pandas()
    new_cids = sorted(set(ids_after["cid"]) - set(ids_before["cid"]))
    token = os.path.basename(glob.glob(os.path.join(
        idx, "buckets", "part=*", "ingest-*-*"))[0]).split("-")[1]
    jpath = os.path.join(idx, f"ingest-{token}.journal.json")
    with open(jpath, "w") as f:
        json.dump({"token": token,
                   "cids": [int(c) for c in new_cids]}, f)
    os.utime(jpath, (1, 1))   # age past the live-ingest grace window
    import pyarrow as _pa
    _pq.write_table(
        _pa.Table.from_pandas(ids_before, preserve_index=False), ids_path
    )

    # a PROBE (no re-ingest) rolls the orphans back and answers exactly
    # as the pre-ingest index did
    after = search_landmark_index(idx, _mk_queries(base_pcm, crops))
    pd.testing.assert_frame_equal(before, after)
    assert not glob.glob(os.path.join(idx, "ingest-*.journal.json"))
    assert not glob.glob(os.path.join(idx, "buckets", "part=*",
                                      f"ingest-{token}-*"))


def test_probe_leaves_live_ingest_alone(ray_session, tmp_path):
    """A journal younger than the grace window could belong to a LIVE
    concurrent ingest — a probe must not roll it back (only crashed,
    aged journals are reconciled)."""
    import glob
    import json

    base_pcm = {f"c{i}": make_pcm_textured(950 + i, 2000, SR)
                for i in range(3)}
    idx = build_landmark_index(
        rd.from_pandas(pd.DataFrame(
            [_clip(c, p) for c, p in base_pcm.items()]
        )),
        str(tmp_path / "lmidx_live"), partitions=8,
    )
    # plant a FRESH journal + a fake in-flight bucket file
    jpath = os.path.join(idx, "ingest-deadbeef.journal.json")
    with open(jpath, "w") as f:
        json.dump({"token": "deadbeef", "cids": [12345]}, f)
    part_dir = os.path.join(idx, "buckets", "part=0")
    fake = os.path.join(part_dir, "ingest-deadbeef-x.parquet")
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    _pq.write_table(_pa.table({
        "hash": _pa.array([7], type=_pa.int64()),
        "cid": _pa.array([12345], type=_pa.int64()),
        "t": _pa.array([0], type=_pa.int64()),
    }), fake)
    search_landmark_index(idx, _mk_queries(base_pcm, {"q": ("c0", 400)}))
    assert os.path.exists(jpath), "young journal must survive a probe"
    assert os.path.exists(fake), "in-flight bucket file must survive"


def test_ingest_retry_within_grace_window(ray_session, tmp_path):
    """ADVICE r4 (medium): retrying a crashed ingest IMMEDIATELY — the
    journal still younger than the probe-side grace window — must not
    duplicate landmark rows. The writer path reconciles with
    grace_sec=0 (single-writer contract: no other ingest can be live
    when it runs), so the crashed token's orphan bucket files are
    rolled back BEFORE the rerun appends, and the stale journal can
    never linger past a commit that re-adds the same cids."""
    import glob
    import json

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from deduplidog_ray.pipelines.audioindex import extend_landmark_index

    base_pcm = {f"g{i}": make_pcm_textured(1600 + i, 2000, SR)
                for i in range(5)}
    new_pcm = {f"m{i}": make_pcm_textured(1700 + i, 2000, SR)
               for i in range(3)}
    idx = build_landmark_index(
        rd.from_pandas(pd.DataFrame(
            [_clip(c, p) for c, p in base_pcm.items()]
        )),
        str(tmp_path / "lmidx_grace"), partitions=8,
    )
    ids_path = os.path.join(idx, "ids.parquet")
    ids_before = _pq.read_table(ids_path).to_pandas()
    extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip(c, p) for c, p in new_pcm.items()]
    )))
    allpcm = {**base_pcm, **new_pcm}
    crops = {"q_new": ("m1", 600), "q_old": ("g2", 400)}
    res_clean = search_landmark_index(idx, _mk_queries(allpcm, crops))

    # rewind to the mid-crash state, but leave the journal YOUNG (fresh
    # mtime): the scenario the probe-side grace window would skip
    ids_after = _pq.read_table(ids_path).to_pandas()
    new_cids = sorted(set(ids_after["cid"]) - set(ids_before["cid"]))
    assert len(new_cids) == 3
    ingested = glob.glob(os.path.join(idx, "buckets", "part=*",
                                      "ingest-*-*"))
    assert ingested
    token = os.path.basename(ingested[0]).split("-")[1]
    jpath = os.path.join(idx, f"ingest-{token}.journal.json")
    with open(jpath, "w") as f:
        json.dump({"token": token,
                   "cids": [int(c) for c in new_cids]}, f)
    _pq.write_table(
        _pa.Table.from_pandas(ids_before, preserve_index=False), ids_path
    )

    # immediate retry: writer-side grace_sec=0 rolls the crashed token
    # back first; no orphan files from it may survive, votes identical
    extend_landmark_index(idx, rd.from_pandas(pd.DataFrame(
        [_clip(c, p) for c, p in new_pcm.items()]
    )))
    assert not glob.glob(os.path.join(
        idx, "buckets", "part=*", f"ingest-{token}-*"
    )), "crashed token's orphan bucket files must be rolled back"
    assert not glob.glob(os.path.join(idx, "ingest-*.journal.json"))
    res2 = search_landmark_index(idx, _mk_queries(allpcm, crops))
    pd.testing.assert_frame_equal(res_clean, res2)


def test_bulk_probe_matches_driver_probe(ray_session, tmp_path):
    """search_landmark_index_bulk (the keyed-exchange serving path) must
    reproduce the driver-vote probe exactly: same (query, clip, offset,
    votes, rank) rows — the match kernel is shared and _vote_core is
    per-pair independent, so the only way they differ is a bug."""
    from deduplidog_ray.pipelines.audioindex import (
        search_landmark_index_bulk,
    )

    corpus_pcm = {f"b{i}": make_pcm_textured(2500 + i, 2200, SR)
                  for i in range(10)}
    idx = build_landmark_index(
        rd.from_pandas(pd.DataFrame(
            [_clip(c, p) for c, p in corpus_pcm.items()]
        )),
        str(tmp_path / "lmidx_bulk"), partitions=8,
    )
    crops = {f"q{i}": (f"b{i % 10}", 150 + 70 * i) for i in range(12)}
    queries = _mk_queries(corpus_pcm, crops)

    drv = search_landmark_index(idx, queries)
    blk = search_landmark_index_bulk(idx, queries).to_pandas()
    # the match-stage sub-split must not change a single row
    blk2 = search_landmark_index_bulk(
        idx, queries, match_subsplit=3
    ).to_pandas()
    pd.testing.assert_frame_equal(
        blk.sort_values(["query_id", "rank"]).reset_index(drop=True),
        blk2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )

    key = ["query_id", "rank"]
    drv_s = drv.sort_values(key).reset_index(drop=True)
    blk_s = blk.astype(drv.dtypes.to_dict()).sort_values(
        key).reset_index(drop=True)[drv.columns.tolist()]
    pd.testing.assert_frame_equal(drv_s, blk_s)
    assert len(drv_s) > 0, "non-vacuous: the planted crops must hit"
    # the planted crop for each query must be its rank-1 clip
    top = drv_s[drv_s["rank"] == 1].set_index("query_id")["clip_id"]
    for qid, (src, _off) in crops.items():
        assert top.get(qid) == src, qid


def test_bulk_probe_empty_and_poison_queries(ray_session, tmp_path):
    """r5 review: zero landmark rows (empty query set, or every clip
    undecodable) must yield a typed empty dataset, not an
    AttributeError from schema inference on an empty chain."""
    from deduplidog_ray.pipelines.audioindex import (
        search_landmark_index_bulk,
    )

    corpus_pcm = {f"e{i}": make_pcm_textured(3000 + i, 2000, SR)
                  for i in range(3)}
    idx = build_landmark_index(
        rd.from_pandas(pd.DataFrame(
            [_clip(c, p) for c, p in corpus_pcm.items()]
        )),
        str(tmp_path / "lmidx_empty"), partitions=4,
    )
    poison = rd.from_pandas(pd.DataFrame([{
        "clip_id": "p0", "bytes": b"not audio", "sr_hz": SR,
        "dur_ms": 100, "codec": "pcm_s16le",
    }]))
    out = search_landmark_index_bulk(idx, poison)
    assert out.count() == 0
    # Ray's to_pandas drops columns at zero rows; the DATASET schema is
    # the contract
    assert sorted(out.schema().names) == sorted(
        ["query_id", "clip_id", "offset_ms", "votes", "rank"]
    )
    # truly EMPTY query dataset (zero rows before the landmark stage)
    empty_q = rd.from_pandas(pd.DataFrame({
        "clip_id": pd.Series(dtype="object"),
        "bytes": pd.Series(dtype="object"),
        "sr_hz": pd.Series(dtype="int32"),
        "dur_ms": pd.Series(dtype="int32"),
        "codec": pd.Series(dtype="object"),
    }))
    out2 = search_landmark_index_bulk(idx, empty_q)
    assert out2.count() == 0
