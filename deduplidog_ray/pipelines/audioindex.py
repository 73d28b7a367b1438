"""Persistent landmark index: build the corpus fingerprint index ONCE,
probe it many times — the index-build + lookup split of
`audiofp.snippet_search` (whose one-shot union re-hashes the corpus per
query batch; fine for dedup, wrong for serving).

≙ the reference's cached ``file_list`` reuse (deduplidog.py:216-217,
:273-278 — "bring the precomputed original-side index to the next run")
taken to the fingerprint domain, and the same state-reuse contract as
the flagship's signature checkpoints (pipelines/dedup.py).

ON-DISK LAYOUT (one directory, self-describing):

    index_dir/
      manifest.json            # STFT/landmark params + partition count;
                               # probes MUST hash queries identically
      buckets/part=0..P-1/     # skinny landmark rows (hash, cid, t),
                               # hive-partitioned by hash % P
      ids.parquet              # cid64 -> clip_id (collision-checked)
      meta.parquet             # cid64 -> (n_lm, n_hash) per clip

SCALE SHAPE: the build is one streaming landmark pass + one map-side
partitioned write (no sort shuffle) + one |clips|-bounded meta
aggregate. A probe touches ONLY the bucket partitions its query hashes
land in, emits pair rows bounded by |query landmarks| × ``index_cap``
(stop hashes skipped, like the dedup op's bucket_cap), votes once, and
resolves ids/meta for the CANDIDATE clips only via a streaming filtered
read — the id map is never loaded wholesale. `search_landmark_index`
assumes a serving-sized query batch (the vote concentrates on the
driver); `search_landmark_index_bulk` (r5) is the million-query path —
the vote moves into keyed exchanges and nothing touches the driver
(shared match kernel, per-pair-identical results, parity-tested).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from deduplidog_ray.pipelines.audiofp import (
    _LandmarkStage,
    _vote_core,
)

_MANIFEST = "manifest.json"
_PARAM_KEYS = (
    "work_sr", "n_fft", "hop", "peaks_per_frame", "fanout", "zone_dt",
)


def _bucket_part(h: np.ndarray, partitions: int,
                 sentinel: bool = False) -> np.ndarray:
    """The index's on-disk partition contract: bucket = hash (viewed
    uint64) mod ``partitions``; with ``sentinel=True`` negative hashes
    (the id-map rows the build emits) route to partition ``partitions``.
    ONE definition — build, ingest and both probe paths must hash
    identically or probes read the wrong buckets (manifest comment)."""
    part = (h.view(np.uint64) % np.uint64(partitions)).astype(np.int64)
    if sentinel:
        part = np.where(h < 0, np.int64(partitions), part)
    return part


def _atomic_write_table(t: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


#: journals younger than this are presumed to belong to a LIVE ingest
#: and are left alone — rolling back an in-flight writer would corrupt
#: the index (delete bucket rows whose cids it then commits). A crashed
#: ingest's journal ages past the grace window long before anyone
#: needs its clips; a real multi-writer deployment coordinates ingests
#: externally (the same single-writer contract Delta/Lance-style table
#: formats place on commits without a lock service).
_RECONCILE_GRACE_SEC = 15 * 60


def _reconcile_ingests(index_dir: str, grace_sec: float | None = None) -> None:
    """Crash recovery for `extend_landmark_index`: each ingest writes a
    journal BEFORE moving bucket files and commits by atomically
    replacing ids.parquet LAST. A leftover journal therefore means
    either (a) the commit happened but the journal delete didn't — all
    its cids are in ids.parquet, just drop the journal — or (b) the
    ingest died mid-move — its `ingest-<token>-*` bucket files are
    partial AND its cids are absent from ids.parquet, so a rerun would
    append their rows a second time; remove the orphans (and any meta
    rows for uncommitted cids) so the rerun starts clean.

    Journals younger than the grace window are SKIPPED (could be a
    live concurrent ingest, not a crash); journal removal tolerates a
    concurrent reconciler having removed it first. Probing a read-only
    index with no leftover journals performs no writes."""
    if grace_sec is None:
        grace_sec = _RECONCILE_GRACE_SEC
    journals = glob.glob(os.path.join(index_dir, "ingest-*.journal.json"))
    if not journals:
        return
    import time as _time

    now = _time.time()
    ids_path = os.path.join(index_dir, "ids.parquet")
    known = set(
        pq.read_table(ids_path, columns=["cid"])["cid"].to_pylist()
    ) if os.path.exists(ids_path) else set()
    for jpath in journals:
        try:
            age = now - os.path.getmtime(jpath)
            with open(jpath) as f:
                j = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue  # vanished or mid-write — another party owns it
        token, cids = j["token"], set(j["cids"])
        committed = bool(cids) and cids <= known
        if not committed and age < grace_sec:
            continue  # possibly a LIVE ingest — never roll it back
        if not committed:
            # crashed: remove this ingest's bucket files + meta rows.
            # Two reconcilers can race on the same aged journal (two
            # probes, or probe + writer): file removal must tolerate
            # the loser finding the orphan already gone, exactly like
            # the journal removal below does.
            for f2 in glob.glob(os.path.join(
                    index_dir, "buckets", "part=*", f"ingest-{token}-*")):
                try:
                    os.remove(f2)
                except FileNotFoundError:
                    pass
            meta_path = os.path.join(index_dir, "meta.parquet")
            if os.path.exists(meta_path) and cids:
                try:
                    old = pq.read_table(meta_path).to_pandas()
                except FileNotFoundError:
                    old = None
                if old is not None:
                    keep = old[~old["cid"].isin(cids)]
                    if len(keep) != len(old):
                        _atomic_write_table(
                            pa.Table.from_pandas(keep, preserve_index=False),
                            meta_path,
                        )
        try:
            os.remove(jpath)
        except FileNotFoundError:
            pass


@ray.remote
def _meta_of_bucket(d: str) -> pa.Table:
    """Per-partition per-clip partials: (cid, n_lm, n_hash). A hash
    value lives wholly in one partition, so distinct-hash partials are
    additive across partitions."""
    files = glob.glob(os.path.join(d, "*.parquet"))
    t = pa.concat_tables(
        [pq.read_table(f, columns=["hash", "cid"]) for f in files]
    )
    if not len(t):
        return pa.table({"cid": pa.array([], type=pa.int64()),
                         "n_lm": pa.array([], type=pa.int64()),
                         "n_hash": pa.array([], type=pa.int64())})
    cid = t["cid"].to_numpy()
    h = t["hash"].to_numpy()
    order = np.lexsort((h, cid))
    cid_s, h_s = cid[order], h[order]
    firsts = np.r_[True, cid_s[1:] != cid_s[:-1]]
    gid = np.cumsum(firsts) - 1
    n_lm = np.bincount(gid)
    hnew = firsts | (h_s != np.r_[h_s[0] - 1, h_s[:-1]])
    n_hash = np.bincount(gid, weights=hnew).astype(np.int64)
    return pa.table({"cid": pa.array(cid_s[firsts]),
                     "n_lm": pa.array(n_lm.astype(np.int64)),
                     "n_hash": pa.array(n_hash)})


def build_landmark_index(
    corpus: ray.data.Dataset,
    index_dir: str,
    work_sr: int = 8000,
    n_fft: int = 512,
    hop: int = 128,
    peaks_per_frame: int = 5,
    fanout: int = 6,
    zone_dt: int = 32,
    partitions: int = 32,
    id_col: str = "clip_id",
) -> str:
    """Hash the corpus once and persist the probe-ready index; returns
    ``index_dir``. See module docstring for layout and scale shape."""
    params = dict(
        work_sr=work_sr, n_fft=n_fft, hop=hop,
        peaks_per_frame=peaks_per_frame, fanout=fanout, zone_dt=zone_dt,
    )
    lm = corpus.map_batches(
        _LandmarkStage,
        fn_constructor_kwargs=dict(**params, id_col=id_col, skinny=True),
        concurrency=(1, 16),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _part(t: pa.Table) -> pa.Table:
        part = _bucket_part(t["hash"].to_numpy(), partitions, sentinel=True)
        return t.append_column("part", pa.array(part))

    buckets = os.path.join(index_dir, "buckets")
    lm.map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(buckets, partition_cols=["part"])

    # id map from the sentinel rows (hash = -1 partition)
    id_dir = os.path.join(buckets, f"part={partitions}")
    id_files = glob.glob(os.path.join(id_dir, "*.parquet"))
    ids = pa.concat_tables(
        [pq.read_table(f, columns=["cid", "clip_id"]) for f in id_files]
    ) if id_files else pa.table(
        {"cid": pa.array([], type=pa.int64()),
         "clip_id": pa.array([], type=pa.string())}
    )
    df = ids.to_pandas().drop_duplicates()
    dup = df[df["cid"].duplicated(keep=False)]
    if len(dup):
        raise RuntimeError(
            f"cid64 collision across distinct clip ids: {sorted(set(dup['clip_id']))[:4]}"
        )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(index_dir, "ids.parquet"))

    part_dirs = sorted(
        d for d in glob.glob(os.path.join(buckets, "part=*"))
        if d != id_dir
    )
    metas = ray.get([_meta_of_bucket.remote(d) for d in part_dirs])
    mt = pa.concat_tables([t for t in metas if len(t)]) if any(
        len(t) for t in metas
    ) else pa.table({"cid": pa.array([], type=pa.int64()),
                     "n_lm": pa.array([], type=pa.int64()),
                     "n_hash": pa.array([], type=pa.int64())})
    mdf = mt.to_pandas().groupby("cid", sort=True, as_index=False).sum()
    pq.write_table(pa.Table.from_pandas(mdf, preserve_index=False),
                   os.path.join(index_dir, "meta.parquet"))

    with open(os.path.join(index_dir, _MANIFEST), "w") as f:
        json.dump({**params, "partitions": partitions,
                   "hop_ms": hop * 1000.0 / work_sr}, f)
    return index_dir


def _match_bucket(
    d: str, qh: np.ndarray, qt: np.ndarray, qi: np.ndarray, index_cap: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Match one query sub-batch against one bucket partition: returns
    (query row idx, cid, dt, hash) cross rows. Per-hash index segments
    larger than ``index_cap`` are stop hashes — skipped, like the dedup
    op's bucket_cap. Pure function — shared by the driver-vote probe
    (`search_landmark_index`, via the remote wrapper) and the bulk
    keyed-exchange probe (`search_landmark_index_bulk`)."""
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        e = np.empty(0, np.int64)
        return e, e, e, e
    t = pa.concat_tables(
        [pq.read_table(f, columns=["hash", "cid", "t"]) for f in files]
    )
    h = t["hash"].to_numpy()
    cid = t["cid"].to_numpy()
    tt = t["t"].to_numpy()
    order = np.argsort(h, kind="stable")
    h, cid, tt = h[order], cid[order], tt[order]
    starts = np.nonzero(np.r_[True, h[1:] != h[:-1]])[0]
    sizes = np.diff(np.r_[starts, len(h)])
    seg_h = h[starts]
    pos = np.searchsorted(seg_h, qh)
    ok = (pos < len(seg_h))
    ok[ok] &= seg_h[pos[ok]] == qh[ok]
    s = pos[ok]
    keep = sizes[s] <= index_cap
    s = s[keep]
    q_keep = np.nonzero(ok)[0][keep]
    m = sizes[s]
    if not len(s) or m.sum() == 0:
        e = np.empty(0, np.int64)
        return e, e, e, e
    total = int(m.sum())
    base = np.repeat(starts[s], m)
    excl = np.repeat(np.cumsum(m) - m, m)
    idx = base + (np.arange(total) - excl)
    q_rep = np.repeat(q_keep, m)
    return (
        qi[q_rep], cid[idx], tt[idx] - qt[q_rep], h[idx],
    )


_probe_bucket = ray.remote(_match_bucket)


def search_landmark_index(
    index_dir: str,
    queries: ray.data.Dataset,
    top_k: int = 3,
    min_votes: int = 12,
    min_coverage: float = 0.02,
    min_hash_coverage: float = 0.065,
    index_cap: int = 64,
    id_col: str = "clip_id",
) -> pd.DataFrame:
    """Probe a persisted index with query snippets: per query, the
    corpus clips containing it — (query_id, clip_id, offset_ms, votes,
    rank), offset = the snippet's start inside the corpus clip. Coverage
    gates apply to the QUERY side (same rationale as snippet_search)."""
    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    _reconcile_ingests(index_dir)
    params = {k: man[k] for k in _PARAM_KEYS}
    partitions = int(man["partitions"])
    hop_ms = float(man["hop_ms"])

    qlm = queries.map_batches(
        _LandmarkStage,
        fn_constructor_kwargs=dict(**params, id_col=id_col, skinny=False),
        concurrency=(1, 8),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    out_cols = ["query_id", "clip_id", "offset_ms", "votes", "rank"]
    if not len(qlm):
        return pd.DataFrame(columns=out_cols)
    qids, qcodes = np.unique(qlm["clip_id"].to_numpy(), return_inverse=True)
    qh = qlm["hash"].to_numpy()
    qt = qlm["t"].to_numpy()
    qmeta = (
        qlm.drop_duplicates("clip_id")
        .set_index("clip_id")[["n_lm", "n_hash"]]
    )

    part = _bucket_part(qh, partitions)
    futs = []
    for p in np.unique(part):
        sel = part == p
        futs.append(_probe_bucket.remote(
            os.path.join(index_dir, "buckets", f"part={p}"),
            qh[sel], qt[sel], qcodes[sel].astype(np.int64), index_cap,
        ))
    outs = ray.get(futs)
    qi = np.concatenate([o[0] for o in outs])
    if not len(qi):
        return pd.DataFrame(columns=out_cols)
    cid = np.concatenate([o[1] for o in outs])
    dt = np.concatenate([o[2] for o in outs])
    hh = np.concatenate([o[3] for o in outs])

    ucid, ccodes = np.unique(cid, return_inverse=True)
    order, first_idx, win_dt, win_votes, hmatch, _amb = _vote_core(
        qi, ccodes.astype(np.int64), dt, hh
    )
    sel = order[first_idx]
    r_qi, r_cc = qi[sel], ccodes[sel]

    # resolve ids + meta for CANDIDATE clips only (streaming filtered
    # read — the id map never loads wholesale)
    cand = pa.array(ucid)
    import pyarrow.compute as pc

    def _flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["cid"], value_set=cand))

    ids_df = ray.data.read_parquet(
        os.path.join(index_dir, "ids.parquet")
    ).map_batches(_flt, batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()

    qmeta = qmeta.reindex(qids)
    q_nlm = qmeta["n_lm"].to_numpy()[r_qi]
    q_nh = qmeta["n_hash"].to_numpy()[r_qi]
    qcov = win_votes / np.maximum(q_nlm, 1)
    qhcov = hmatch / np.maximum(q_nh, 1)
    ok = (win_votes >= min_votes) & (
        (qcov >= min_coverage) | (qhcov >= min_hash_coverage)
    )
    idmap = dict(zip(ids_df["cid"], ids_df["clip_id"]))
    out = pd.DataFrame({
        "query_id": qids[r_qi[ok]],
        "clip_id": [idmap.get(int(c), "") for c in ucid[r_cc[ok]]],
        "offset_ms": np.round(win_dt[ok] * hop_ms).astype(np.int64),
        "votes": win_votes[ok].astype(np.int64),
    })
    out = out.sort_values(
        ["query_id", "votes", "clip_id"], ascending=[True, False, True]
    )
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    out = out[out["rank"] <= top_k]
    return out[out_cols].reset_index(drop=True)


def extend_landmark_index(
    index_dir: str,
    new_clips: ray.data.Dataset,
    id_col: str = "clip_id",
) -> str:
    """Incrementally ingest new clips into an EXISTING index — hash only
    the increment, append its bucket rows as new parquet files inside
    the existing ``part=`` directories (readers glob the directory, so
    append = add files; no rewrite of prior data), and extend the id
    map + meta. ≙ the incremental-corpus contract of
    `pipelines/incremental.py` applied to the serving index: the corpus
    already indexed is never re-read, never re-hashed, never shuffled.

    New clip ids must be new: a cid64 already present in ids.parquet
    with a DIFFERENT clip_id raises (collision), with the SAME clip_id
    is skipped idempotently (re-ingest of the same shard is a no-op for
    the id map; its landmark rows are deduplicated by skipping).
    """
    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    # WRITER-PATH reconcile runs with grace_sec=0: under the
    # single-writer contract (module docstring) no other ingest can be
    # live when this writer starts, so any leftover journal — however
    # young — is a crash to roll back NOW. Without this, retrying a
    # crashed ingest inside the probe-side grace window would re-append
    # the same cids under a new token; once ids.parquet contained them,
    # the stale journal would read as committed and its orphan
    # ingest-<token>-* bucket files would inflate search votes forever.
    _reconcile_ingests(index_dir, grace_sec=0)
    params = {k: man[k] for k in _PARAM_KEYS}
    partitions = int(man["partitions"])

    ids_path = os.path.join(index_dir, "ids.parquet")
    known = pq.read_table(ids_path).to_pandas()
    known_map = dict(zip(known["cid"], known["clip_id"]))

    lm = new_clips.map_batches(
        _LandmarkStage,
        fn_constructor_kwargs=dict(**params, id_col=id_col, skinny=True),
        concurrency=(1, 16),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _part(t: pa.Table) -> pa.Table:
        part = _bucket_part(t["hash"].to_numpy(), partitions, sentinel=True)
        return t.append_column("part", pa.array(part))

    import uuid

    stage = os.path.join(index_dir, f"ingest-{uuid.uuid4().hex[:8]}")
    lm.map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(stage, partition_cols=["part"])

    # id map first: detect collisions / already-ingested ids BEFORE any
    # bucket rows move
    import shutil

    id_dir = os.path.join(stage, f"part={partitions}")
    id_files = glob.glob(os.path.join(id_dir, "*.parquet"))
    new_ids = pa.concat_tables(
        [pq.read_table(f, columns=["cid", "clip_id"]) for f in id_files]
    ).to_pandas().drop_duplicates() if id_files else pd.DataFrame(
        {"cid": pd.Series(dtype=np.int64),
         "clip_id": pd.Series(dtype=object)}
    )
    dup_in_new = new_ids[new_ids["cid"].duplicated(keep=False)]
    clash = [
        (c, s) for c, s in zip(new_ids["cid"], new_ids["clip_id"])
        if known_map.get(c, s) != s
    ]
    if len(dup_in_new) or clash:
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(f"cid64 collision on ingest: {clash[:4]}")
    skip_cids = {
        int(c) for c in new_ids["cid"] if int(c) in known_map
    }
    fresh = new_ids[~new_ids["cid"].isin(skip_cids)]

    # increment meta BEFORE moving (the staged files hold exactly the
    # increment's rows — meta stays increment-bounded, never a re-read
    # of the whole index). Crash-safety protocol (see _reconcile_ingests):
    # journal first, then bucket moves + meta, then ids.parquet replaced
    # atomically as the COMMIT POINT, then journal removed — a crash at
    # any step leaves either a fully-committed ingest or one the next
    # call rolls back, never silently duplicated landmark rows.
    token = uuid.uuid4().hex[:8]
    stage_parts = sorted(
        d for d in glob.glob(os.path.join(stage, "part=*")) if d != id_dir
    )
    metas = ray.get([_meta_of_bucket.remote(d) for d in stage_parts])
    journal = os.path.join(index_dir, f"ingest-{token}.journal.json")
    jtmp = journal + ".tmp"
    with open(jtmp, "w") as f:
        json.dump({"token": token,
                   "cids": [int(c) for c in fresh["cid"]]}, f)
    os.replace(jtmp, journal)
    for d in stage_parts:
        # heartbeat: an ingest moving many bucket files can outlive the
        # probe-side grace window; refreshing the journal mtime per
        # partition keeps a LIVE ingest inside the window so a
        # concurrent probe's reconcile never rolls back files this
        # writer is still moving
        try:
            os.utime(journal)
        except OSError:
            pass
        dest = os.path.join(index_dir, "buckets", os.path.basename(d))
        os.makedirs(dest, exist_ok=True)
        for f in glob.glob(os.path.join(d, "*.parquet")):
            # per-file heartbeat too: one partition with many fragments
            # can alone outlive the grace window (r5 review)
            try:
                os.utime(journal)
            except OSError:
                pass
            t = pq.read_table(f, columns=["hash", "cid", "t", "clip_id"])
            if skip_cids:
                keep = ~np.isin(t["cid"].to_numpy(), list(skip_cids))
                t = t.filter(pa.array(keep))
            if len(t):
                pq.write_table(
                    t,
                    os.path.join(
                        dest, f"ingest-{token}-{os.path.basename(f)}"
                    ),
                )
    shutil.rmtree(stage, ignore_errors=True)

    if len(fresh):
        fresh_set = set(fresh["cid"].astype(np.int64))
        mt = pa.concat_tables([t for t in metas if len(t)])
        mdf = mt.to_pandas().groupby("cid", sort=True, as_index=False).sum()
        mdf = mdf[mdf["cid"].isin(fresh_set)]
        old = pq.read_table(
            os.path.join(index_dir, "meta.parquet")
        ).to_pandas()
        _atomic_write_table(
            pa.Table.from_pandas(
                pd.concat([old[~old["cid"].isin(fresh_set)], mdf],
                          ignore_index=True),
                preserve_index=False,
            ),
            os.path.join(index_dir, "meta.parquet"),
        )
        # commit point: once the new cids land in ids.parquet, the
        # ingest is final and the journal is a no-op to reconcile
        _atomic_write_table(
            pa.Table.from_pandas(
                pd.concat([known, fresh], ignore_index=True),
                preserve_index=False,
            ),
            ids_path,
        )
    try:
        os.remove(journal)
    except FileNotFoundError:
        pass  # a reconciler saw the committed state first — same outcome
    return index_dir


def search_landmark_index_bulk(
    index_dir: str,
    queries: ray.data.Dataset,
    top_k: int = 3,
    min_votes: int = 12,
    min_coverage: float = 0.02,
    min_hash_coverage: float = 0.065,
    index_cap: int = 64,
    id_col: str = "clip_id",
    join_partitions: int = 32,
    query_partitions: int = 32,
    match_subsplit: int = 1,
) -> ray.data.Dataset:
    """Bulk probe — same semantics as :func:`search_landmark_index`
    but NOTHING concentrates on the driver: the keyed-exchange variant
    the module docstring deferred ("a million-query batch would move
    the vote into a second keyed exchange").

    Per-pair identical to the driver-vote path by construction: the
    match kernel is the shared :func:`_match_bucket`, `_vote_core` is
    per-(query, clip) independent, and the id join is LEFT with
    unresolved cids emitted as ``clip_id=""`` — exactly the driver
    path's ``idmap.get(cid, "")`` — so ranks agree even when probing
    mid-ingest (parity test: tests/test_audioindex.py).

    SCALE SHAPE — candidate-bounded keyed exchanges, none corpus-sized,
    and NO per-query dispatch: (1) query landmarks hash-partition to
    the bucket layout (`_bucket_part`, the shared on-disk contract) and
    each partition task matches against ONLY its bucket files (index
    rows stream from disk, never shuffle); (2) match rows — bounded by
    |query landmarks| × index_cap — exchange once on hash(query_id) %
    ``query_partitions``; each partition task runs ONE vectorized
    `_vote_core` over its factorized (query, clip) codes (the
    audiofp exchange-2 shape — not one UDF call per query); (3) gated
    candidates hash-join cid→clip_id (both sides stream,
    joins.py:hash_join); (4) one more query-hash exchange ranks with a
    vectorized groupby-cumcount and cuts top_k. Per-query gate meta
    (n_lm, n_hash) rides on the match rows — no second lookup. The
    candidate table is materialized once between vote and join (it
    must be computed anyway; this also keeps `hash_join`'s schema
    probe from re-executing the match/vote pipeline) and an empty
    candidate set short-circuits to a typed empty dataset.
    """
    from deduplidog_ray.stages.hashing import hash_arrow_u64

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    _reconcile_ingests(index_dir)
    params = {k: man[k] for k in _PARAM_KEYS}
    partitions = int(man["partitions"])
    hop_ms = float(man["hop_ms"])
    buckets = os.path.join(index_dir, "buckets")

    out_schema = pa.schema([
        ("query_id", pa.string()), ("clip_id", pa.string()),
        ("offset_ms", pa.int64()), ("votes", pa.int64()),
        ("rank", pa.int64()),
    ])

    qlm = queries.map_batches(
        _LandmarkStage,
        fn_constructor_kwargs=dict(**params, id_col=id_col, skinny=False),
        concurrency=(1, 16),
        batch_size=32,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _part(t: pa.Table) -> pa.Table:
        part = _bucket_part(t["hash"].to_numpy(), partitions)
        t = t.append_column("part", pa.array(part))
        if match_subsplit > 1:
            # sub-split the query side of each bucket: parallelism and
            # per-task memory of the match stage are otherwise capped
            # by the INDEX's on-disk partition count (probe-time width
            # would need a rebuild). Cost: each bucket's files are read
            # match_subsplit times — raise it only when the query batch
            # is the bigger side (the million-query case; r5 review)
            qs = (
                hash_arrow_u64(t["clip_id"], seed=0x517B)
                % np.uint64(match_subsplit)
            ).astype(np.int64)
            part2 = t["part"].to_numpy() * np.int64(match_subsplit) + qs
            t = t.drop_columns(["part"]).append_column(
                "part", pa.array(part2)
            )
        return t

    _match_schema = pa.schema([
        ("query_id", pa.string()), ("cid", pa.int64()),
        ("dt", pa.int64()), ("h", pa.int64()),
        ("q_nlm", pa.int64()), ("q_nhash", pa.int64()),
    ])

    def _match(g: pa.Table) -> pa.Table:
        if not len(g):
            return _match_schema.empty_table()
        p = int(g["part"][0].as_py()) // match_subsplit
        qh = g["hash"].to_numpy()
        qt = g["t"].to_numpy()
        qi = np.arange(len(g), dtype=np.int64)
        ri, cid, dt, hh = _match_bucket(
            os.path.join(buckets, f"part={p}"), qh, qt, qi, index_cap
        )
        if not len(ri):
            return _match_schema.empty_table()
        take = pa.array(ri)
        return pa.table({
            "query_id": g["clip_id"].take(take),
            "cid": pa.array(cid),
            "dt": pa.array(dt),
            "h": pa.array(hh),
            "q_nlm": g["n_lm"].take(take),
            "q_nhash": g["n_hash"].take(take),
        })

    matches = qlm.map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("part").map_groups(_match, batch_format="pyarrow")

    def _qpart(t: pa.Table) -> pa.Table:
        # hash_arrow_u64: no to_pylist round trip on the pipeline's
        # largest intermediate (VERDICT r2 #8's measured fix, r5 review)
        qp = (
            hash_arrow_u64(t["query_id"], seed=0x9B1C)
            % np.uint64(query_partitions)
        ).astype(np.int64)
        return t.append_column("qpart", pa.array(qp))

    _cand_schema = pa.schema([
        ("query_id", pa.string()), ("cid", pa.int64()),
        ("offset_ms", pa.int64()), ("votes", pa.int64()),
    ])

    def _vote(g: pa.Table) -> pa.Table:
        if not len(g):
            return _cand_schema.empty_table()
        qarr = g["query_id"].to_numpy(zero_copy_only=False)
        # pd.factorize: hash-based codes, no O(n log n) Python string
        # compares (same fix audiofp._vote_partition documents)
        qcodes, uq = pd.factorize(qarr)
        uq = np.asarray(uq)
        cid = g["cid"].to_numpy()
        dt = g["dt"].to_numpy()
        hh = g["h"].to_numpy()
        ucid, ccodes = np.unique(cid, return_inverse=True)
        order, first_idx, win_dt, win_votes, hmatch, _amb = _vote_core(
            qcodes.astype(np.int64), ccodes.astype(np.int64), dt, hh
        )
        sel = order[first_idx]
        n_lm = g["q_nlm"].to_numpy()[sel]
        n_hash = g["q_nhash"].to_numpy()[sel]
        qcov = win_votes / np.maximum(n_lm, 1)
        qhcov = hmatch / np.maximum(n_hash, 1)
        ok = (win_votes >= min_votes) & (
            (qcov >= min_coverage) | (qhcov >= min_hash_coverage)
        )
        if not ok.any():
            return _cand_schema.empty_table()
        return pa.table({
            "query_id": pa.array(uq[qcodes[sel][ok]], type=pa.string()),
            "cid": pa.array(ucid[ccodes[sel][ok]]),
            "offset_ms": pa.array(
                np.round(win_dt[ok] * hop_ms).astype(np.int64)
            ),
            "votes": pa.array(win_votes[ok].astype(np.int64)),
        })

    cands = matches.map_batches(
        _qpart, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("qpart").map_groups(
        _vote, batch_format="pyarrow"
    ).materialize()
    if cands.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    from deduplidog_ray.pipelines.joins import hash_join

    ids = ray.data.read_parquet(os.path.join(index_dir, "ids.parquet"))
    # runtime_filter: one keys-only pass over the (candidate-bounded)
    # left side prunes the corpus-sized id map BEFORE the shuffle —
    # the module contract says the id map is never moved wholesale,
    # and joins.py guarantees the filtered result is identical
    resolved = hash_join(
        cands, ids, key="cid",
        left_cols=["query_id", "offset_ms", "votes"],
        right_cols=["clip_id"], how="left",
        partitions=join_partitions,
        runtime_filter=True,
    )

    def _fill_unresolved(t: pa.Table) -> pa.Table:
        # driver-path parity: a cid not (yet) in ids.parquet — e.g. a
        # probe racing a live ingest between the bucket moves and the
        # id-map commit — still occupies its rank slot, as clip_id ""
        c = pa.compute.fill_null(
            pa.compute.cast(t["clip_id"], pa.string()), ""
        )
        return t.drop_columns(["clip_id"]).append_column("clip_id", c)

    def _rank(g: pa.Table) -> pa.Table:
        if not len(g):
            return out_schema.empty_table()
        # final cid tie-break reproduces the driver path exactly even
        # for two unresolved (clip_id="") candidates that tie on votes:
        # the driver frame's input order is cid-ascending, and its
        # stable sort preserves that (r5 review)
        df = g.to_pandas().sort_values(
            ["query_id", "votes", "clip_id", "cid"],
            ascending=[True, False, True, True], kind="stable",
        )
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        df = df[df["rank"] <= top_k]
        return pa.Table.from_pandas(
            df[["query_id", "clip_id", "offset_ms", "votes", "rank"]],
            preserve_index=False,
        ).cast(out_schema)

    return resolved.map_batches(
        _fill_unresolved, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _qpart, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("qpart").map_groups(_rank, batch_format="pyarrow")
