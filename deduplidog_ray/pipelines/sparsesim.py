"""IDF-weighted shingle-set cosine near-dup pairs (sparse lexical
similarity — the TF-IDF-family cousin of the set Jaccard in textdedup.py
and the dense embedding cosine in similarity.py).

Measure: a document is the SET of its distinct word-3-gram shingles over
RE2 ``\\w+`` tokens of the lowercased text (docs with < 3 tokens
contribute their whole token string as one shingle — same convention as
the Jaccard oracle). Each shingle carries a fixed-point idf weight

    w(t) = floor(ln(N / df_t) * 1000 + 0.5)   (int64)

and shingles with ``df_t > max_df`` are excluded from the measure
(stop-shingle pruning — sklearn's ``max_df``; it is also exactly what
bounds the per-key pair fan-out at scale: one shuffle key can never meet
more than ``max_df`` documents). The similarity is

    cos(A, B) = sum_{t in A∩B} w(t)^2
                / ( sqrt(sum_{t in A} w(t)^2) * sqrt(sum_{t in B} w(t)^2) )

Unlike plain Jaccard, agreement on RARE shingles counts more — two
documents sharing one distinctive sentence outrank two documents sharing
the same amount of boilerplate.

EXACTNESS BY CONSTRUCTION: every sum is int64 over fixed-point weights
(associative — no float-summation-order caveat), w^2 <= ~7.6e8 and
per-doc/per-pair sums stay far below 2^53, so the one float division at
the end is an IEEE-deterministic function of identical integers on the
Ray and DuckDB sides — the same trick as the integer fixed-point
PageRank (graph.py). ≙ reference stem-index candidate join
(deduplidog.py:285-288) generalized: every rare shingle is a join key,
not just the normalized name.

Shape (2 bounded shuffles):
  1. distinct (shingle, doc) postings → ``groupby(part)`` partition
     kernel: per shingle with df <= max_df emit C(df,2) pair partials
     (a, b, w^2) PLUS per-member diagonal norm partials (d, d, w^2);
     df > max_df emits nothing. Partial count <= postings * max_df / 2.
  2. ``groupby(a, b).sum`` — off-diagonal rows ARE the candidate dots
     (only docs co-occurring under a sub-max_df shingle ever meet:
     candidate generation and exact scoring are one exchange),
     diagonal rows are the per-doc norm².
  Finalization is pairs-bounded: the off-diagonal stream comes to the
  driver (pairs, small), and norms are fetched from the diagonal stream
  with one ``pc.is_in`` filter over the pair MEMBERS (<= 2·|pairs|) —
  the whole per-doc norm table never concentrates anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

#: ASCII unit separator — cannot appear inside a ``\w+`` token, so
#: joining tokens with it is collision-free (same choice as the Jaccard
#: oracle's chr(30)).
_SEP = "\x1e"


def _shingle_postings(
    t: pa.Table, text_col: str, id_col: str, k: int
) -> pa.Table:
    """Distinct (shingle, doc) postings of one batch — vectorized RE2
    tokenization (Arrow ASCII ``\\w``, mirroring the DuckDB oracle's
    ``regexp_extract_all('\\w+')`` on any corpus), Python only for the
    per-doc k-gram join."""
    low = pc.utf8_lower(pc.fill_null(t[text_col], ""))
    parts = pc.split_pattern_regex(low, pattern=r"[^\w]+")
    ids = t[id_col].to_numpy(zero_copy_only=False)
    sh_parts: list[np.ndarray] = []
    doc_parts: list[np.ndarray] = []
    for i, toks in enumerate(parts.to_pylist()):
        ts = [x for x in toks if x]
        if len(ts) >= k:
            sg = {_SEP.join(ts[j: j + k]) for j in range(len(ts) - k + 1)}
        else:
            sg = {_SEP.join(ts)} - {""}
        if sg:
            arr = np.array(sorted(sg), dtype=object)
            sh_parts.append(arr)
            doc_parts.append(np.full(len(arr), ids[i], dtype=np.int64))
    if not sh_parts:
        return pa.table(
            {"token": pa.array([], type=pa.string()),
             "doc": pa.array([], type=pa.int64())}
        )
    return pa.table(
        {"token": pa.array(np.concatenate(sh_parts), type=pa.string()),
         "doc": pa.array(np.concatenate(doc_parts))}
    )


def _partition_kernel(
    g: pd.DataFrame, n_docs: int, max_df: int
) -> pd.DataFrame:
    """All shingle groups of one hash partition, vectorized: sort once,
    segment by shingle, emit diagonal norm partials for every kept
    posting and triu pair partials per shingle with 2 <= df <= max_df.
    The only Python loop is over shingles with df >= 2 (rare by
    definition of the measure), with triu index templates cached per
    group size."""
    if not len(g):
        return pd.DataFrame(
            {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
             "v": np.empty(0, np.int64)}
        )
    toks = g["token"].to_numpy()
    docs = g["doc"].to_numpy().astype(np.int64)
    order = np.argsort(toks, kind="stable")
    toks, docs = toks[order], docs[order]
    _, starts = np.unique(toks, return_index=True)
    sizes = np.diff(np.r_[starts, len(toks)])
    keep_seg = sizes <= max_df
    # fixed-point idf per segment; df > max_df segments drop out
    w = np.floor(
        np.log(float(n_docs) / sizes.astype(np.float64)) * 1000.0 + 0.5
    ).astype(np.int64)
    w2 = w * w
    # diagonal (norm) partials: every posting of every kept segment
    keep_post = np.repeat(keep_seg, sizes)
    diag_docs = docs[keep_post]
    diag_v = np.repeat(w2, sizes)[keep_post]
    a_parts = [diag_docs]
    b_parts = [diag_docs]
    v_parts = [diag_v]
    tri_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for si in np.nonzero(keep_seg & (sizes >= 2))[0]:
        k = int(sizes[si])
        tri = tri_cache.get(k)
        if tri is None:
            tri = np.triu_indices(k, k=1)
            tri_cache[k] = tri
        seg = docs[starts[si]: starts[si] + k]
        a_parts.append(seg[tri[0]])
        b_parts.append(seg[tri[1]])
        v_parts.append(np.full(len(tri[0]), w2[si], dtype=np.int64))
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    # canonical pair order (a < b); diagonal rows already equal
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pd.DataFrame({"a": lo, "b": hi, "v": np.concatenate(v_parts)})


def idf_cosine_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    max_df: int = 200,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> pd.DataFrame:
    """(doc_a, doc_b, cos) for all pairs with idf-weighted shingle-set
    cosine >= ``threshold`` — see module docstring for the measure and
    the exchange shape."""
    import ray

    n_docs = ds.count()
    if partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if (
            ray.is_initialized()
        ) else 8
        partitions = max(8, min(64, cpus))

    posts = ds.map_batches(
        lambda t: _shingle_postings(t, text_col, id_col, shingle_k),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def _part(t: pa.Table) -> pa.Table:
        # stable shuffle key: xxhash of the shingle mod P
        from deduplidog_ray.stages.hashing import hash_strings_u64

        h = hash_strings_u64(t["token"].to_pylist(), seed=0x51A5)
        return t.append_column(
            "part", pa.array((h % np.uint64(partitions)).astype(np.int64))
        )

    parts = posts.map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("part").map_groups(
        lambda g: _partition_kernel(g, n_docs, max_df),
        batch_format="pandas",
    )

    # pair-sum exchange: ONE single-key int64 hash shuffle + a C-level
    # pandas group-sum per partition. (Ray's native multi-key
    # groupby(["a","b"]).aggregate sort-aggregates the whole partial set
    # — measured 100 s on 1.5M partials vs ~2 s for this shape.) Hash
    # collisions only co-locate rows; the true (a, b) keys group inside
    # the partition, so the sum is exact.
    def _pairkey(t: pa.Table) -> pa.Table:
        from deduplidog_ray.stages.hashing import mix64

        a = t["a"].to_numpy().view(np.uint64)
        b = t["b"].to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            h = mix64(a * np.uint64(0x9E3779B97F4A7C15) + b, seed=0x5EED)
        return t.append_column(
            "p2", pa.array((h % np.uint64(partitions)).astype(np.int64))
        )

    def _pairsum(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["a", "b"], sort=False)["v"].sum().reset_index()
        )
        return out.rename(columns={"v": "s"})

    agg = parts.map_batches(
        _pairkey, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("p2").map_groups(
        _pairsum, batch_format="pandas"
    ).materialize()

    # pairs-bounded finalization: off-diagonal rows to the driver …
    pair_chunks = []
    for b in agg.map_batches(
        lambda t: t.filter(pc.not_equal(t["a"], t["b"])),
        batch_format="pyarrow", zero_copy_batch=True,
    ).iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        pair_chunks.append(b)
    empty = pd.DataFrame({
        "doc_a": pd.Series(dtype=np.int64),
        "doc_b": pd.Series(dtype=np.int64),
        "cos": pd.Series(dtype=np.float64),
    })
    if not pair_chunks:
        return empty
    pairs = pa.concat_tables(pair_chunks).to_pandas()
    # … and norms only for the pairs' MEMBERS (<= 2·|pairs| rows out of
    # the doc-bounded diagonal — never the whole norm table)
    members = pa.array(
        np.unique(np.r_[pairs["a"].to_numpy(), pairs["b"].to_numpy()])
    )

    def _member_norms(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["a"], t["b"]))
        return t.filter(pc.is_in(t["a"], value_set=members)).select(["a", "s"])

    norm_chunks = [
        b for b in agg.map_batches(
            _member_norms, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        if len(b)
    ]
    norms = pa.concat_tables(norm_chunks).to_pandas()
    n2 = dict(zip(norms["a"], norms["s"]))
    na = pairs["a"].map(n2).to_numpy(dtype=np.float64)
    nb = pairs["b"].map(n2).to_numpy(dtype=np.float64)
    # one IEEE division over exact integers — bit-identical to the SQL
    # oracle's CAST(... AS DOUBLE) arithmetic
    cos = pairs["s"].to_numpy(dtype=np.float64) / (np.sqrt(na) * np.sqrt(nb))
    keep = cos >= threshold
    out = pd.DataFrame({
        "doc_a": pairs["a"].to_numpy()[keep],
        "doc_b": pairs["b"].to_numpy()[keep],
        "cos": cos[keep],
    })
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def source_keywords(
    ds: ray.data.Dataset,
    top_k: int = 3,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    partitions: int | None = None,
) -> pd.DataFrame:
    """Per-source distinguishing key-shingles by c-TF-IDF: score(s, t) =
    tf(s, t) · w(t), with tf = number of docs in source s containing
    shingle t (distinct-per-doc) and w(t) the fixed-point idf over
    SOURCES, floor(ln(S / df_sources(t)) · 1000 + 0.5). Integer scores
    ⇒ exact, order-free; ties break by shingle string — bit-reproducible
    by a SQL QUALIFY oracle.

    The corpus-QA question "what is each source's signature content?" —
    the per-source counterpart of `textops.top_tokens` (raw heavy
    hitters), weighted so cross-source boilerplate drops out.

    Shape: ONE shingle-hash-partitioned exchange. A shingle lives wholly
    in one partition, so per-partition per-source top-k partials are
    globally correct candidates; the driver merges S × P × k tiny rows.
    """
    import ray

    n_sources = ds.map_batches(
        lambda t: pa.table({group_col: pc.unique(t[group_col])}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()[group_col].nunique()
    if partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if (
            ray.is_initialized()
        ) else 8
        partitions = max(8, min(64, cpus))

    def _postings(t: pa.Table) -> pa.Table:
        # distinct (shingle, doc) postings + the doc's source
        p = _shingle_postings(t, text_col, id_col, shingle_k)
        src_of = dict(zip(t[id_col].to_pylist(), t[group_col].to_pylist()))
        docs = p["doc"].to_pylist()
        return p.append_column(
            group_col,
            pa.array([src_of[d] for d in docs], type=pa.string()),
        )

    def _part(t: pa.Table) -> pa.Table:
        from deduplidog_ray.stages.hashing import hash_strings_u64

        h = hash_strings_u64(t["token"].to_pylist(), seed=0x51A5)
        return t.append_column(
            "part", pa.array((h % np.uint64(partitions)).astype(np.int64))
        )

    def _topk_partial(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({group_col: pd.Series(dtype=object),
                                 "shingle": pd.Series(dtype=object),
                                 "score": pd.Series(dtype=np.int64)})
        # per-shingle source df (over ALL sources) and per (source,
        # shingle) doc counts — the shingle is whole in this partition
        dfs = g.groupby("token", sort=False)[group_col].nunique()
        w = np.floor(
            np.log(float(n_sources) / dfs.to_numpy(np.float64)) * 1000.0
            + 0.5
        ).astype(np.int64)
        wmap = dict(zip(dfs.index, w))
        tf = (
            g.groupby([group_col, "token"], sort=False)
            .size().reset_index(name="tf")
        )
        tf["score"] = tf["tf"].to_numpy(np.int64) * np.fromiter(
            (wmap[t] for t in tf["token"]), dtype=np.int64, count=len(tf)
        )
        tf = tf.sort_values(
            ["score", "token"], ascending=[False, True], kind="stable"
        )
        out = tf.groupby(group_col, sort=False).head(top_k)
        return pd.DataFrame({
            group_col: out[group_col].to_numpy(),
            "shingle": out["token"].to_numpy(),
            "score": out["score"].to_numpy(np.int64),
        })

    partials = ds.map_batches(
        _postings, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("part").map_groups(_topk_partial, batch_format="pandas")

    cand = partials.to_pandas()          # <= S x P x k rows
    cand = cand.sort_values(
        ["score", "shingle"], ascending=[False, True], kind="stable"
    )
    out = cand.groupby(group_col, sort=False).head(top_k)
    out = out.rename(columns={group_col: group_col})
    out["rank"] = out.groupby(group_col, sort=False).cumcount() + 1
    return (
        out.sort_values([group_col, "rank"])
        .reset_index(drop=True)[[group_col, "shingle", "score", "rank"]]
    )
