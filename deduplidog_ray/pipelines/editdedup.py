"""Edit-distance near-dup (typo-level): FastSS deletion-neighborhood
candidates + vectorized Levenshtein verify.

A dedup family the MinHash/SimHash/containment stack doesn't cover:
strings equal up to <= k character edits (typos, OCR slips, serial-number
variants). MinHash's shingle Jaccard barely moves under one edit in a
short key, and SimHash Hamming is the wrong metric; the classical exact
scheme is FastSS (Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries"): if lev(a, b) <= k then the deletion neighborhoods
D_<=k(a) and D_<=k(b) intersect — so variant equality is a complete
candidate generator and true Levenshtein <= k decides.

Shape:
1. variant stage (stateless map_batches): the <= k-deletion variants of
   the per-row key are built by ARROW kernels — for each deletion
   position d one `utf8_slice + binary_join` pass over the whole batch
   (L kernel calls per edit level, never a per-row Python loop) — and
   hashed; rows ship (variant_hash, id, key): the FastSS inflation is
   x(L+1) rows per edit level, each ~(16 B + key).
2. ONE groupby(hash % P) exchange; per partition: sort by variant hash,
   segment all-pairs via the counts/repeat expansion (capped by
   ``max_group`` — a hot variant means a boilerplate key; raise, don't
   silently drop pairs), local (a, b) dedup, then the verify kernel.
3. verify: banded DP across ALL candidate pairs at once — the j-th
   column of every pair's DP table advances together; the in-row
   left-to-right dependency collapses to `j + min-accumulate(tmp - j)`,
   so the whole verify is O(L^2) numpy passes over a (pairs,) lane, no
   per-pair Python.
4. verified pairs can surface in several variant groups → one final
   |pairs|-bounded exact dedup exchange.

≙ reference P3's "accepted hash diff" tolerance (deduplidog.py:147-148)
transplanted to the string-key axis; no direct reference analog —
target-side addition (SURVEY §2.8 near-dup family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from deduplidog_ray.stages.hashing import hash_arrow_u64

DEFAULT_PARTITIONS = 64


def _deletion_variants(key: pa.ChunkedArray | pa.Array,
                       key_len: int) -> list[pa.Array]:
    """All 1-deletion variants of every row at once: one
    slice+slice+join Arrow pass per deletion position."""
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    out = []
    for d in range(key_len):
        head = pc.utf8_slice_codeunits(key, 0, d)
        tail = pc.utf8_slice_codeunits(key, d + 1, key_len + 1)
        out.append(pc.binary_join_element_wise(head, tail, ""))
    return out


def lev_le_k(a: list[str], b: list[str], k: int) -> np.ndarray:
    """Vectorized bounded Levenshtein over parallel string lists:
    returns a bool mask lev(a_i, b_i) <= k. Full DP, row-major, with
    the min-accumulate collapse of the in-row dependency — O(|a|·|b|)
    numpy column passes across all pairs simultaneously."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    la = np.fromiter((len(s) for s in a), np.int64, n)
    lb = np.fromiter((len(s) for s in b), np.int64, n)
    ml_a, ml_b = int(la.max()), int(lb.max())
    big = np.int64(1 << 20)
    ca = np.full((n, ml_a), -1, dtype=np.int64)
    cb = np.full((n, ml_b), -2, dtype=np.int64)
    for i, s in enumerate(a):
        ca[i, : len(s)] = np.frombuffer(
            s.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
    for i, s in enumerate(b):
        cb[i, : len(s)] = np.frombuffer(
            s.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
    # dp[j] = edit distance between a[:i] and b[:j], advanced i -> i+1
    j_idx = np.arange(ml_b + 1, dtype=np.int64)
    dp = np.broadcast_to(j_idx, (n, ml_b + 1)).copy()
    dp[j_idx[None, :] > lb[:, None]] = big          # past each b's end
    for i in range(ml_a):
        active = i < la
        prev = dp
        sub = prev[:, :-1] + (ca[:, i, None] != cb).astype(np.int64)
        tmp = np.minimum(prev[:, 1:] + 1, sub)
        tmp = np.concatenate(
            [(prev[:, :1] + 1), tmp], axis=1
        )
        tmp[:, 0] = i + 1                            # dist(a[:i+1], "")
        # in-row left dependency: dp[j] = min_m<=j (tmp[m] + (j - m))
        acc = np.minimum.accumulate(tmp - j_idx, axis=1)
        new = acc + j_idx
        new[j_idx[None, :] > lb[:, None]] = big
        dp = np.where(active[:, None], new, prev)
    return dp[np.arange(n), lb] <= k


def _pairs_partition(
    g: pd.DataFrame, k: int, max_group: int
) -> pa.Table:
    """One hash partition: all variant groups at once — sort by variant
    hash, counts/repeat all-pairs expansion, local dedup, verify.
    Arrow out: the result feeds dedupe_exact's hash + groupby exchange,
    which sorts ~10× faster over Arrow blocks than pandas ones."""
    empty = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
    })
    if len(g) < 2:
        return empty
    vh = g["_vh"].to_numpy()
    order = np.argsort(vh, kind="stable")
    vh = vh[order]
    ids = g["_id"].to_numpy()[order]
    keys = g["_key"].to_numpy()[order]
    starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
    lens = np.diff(np.r_[starts, len(vh)])
    if int(lens.max()) > max_group:
        raise RuntimeError(
            f"hot deletion-variant group ({int(lens.max())} members > "
            f"max_group={max_group}): the key column has boilerplate "
            "values — pre-filter or raise max_group explicitly"
        )
    m = lens
    pair_counts = m * (m - 1) // 2
    total = int(pair_counts.sum())
    if total == 0:
        return empty
    # vectorized triangular expansion over every segment at once
    seg = np.repeat(np.arange(len(starts)), pair_counts)
    base = np.repeat(np.cumsum(pair_counts) - pair_counts, pair_counts)
    t = np.arange(total) - base                       # 0..C(m,2)-1 in seg
    mm = m[seg].astype(np.float64)
    # row r of the triangle: largest r with r*m - r(r+1)/2 <= t
    r = np.floor(
        (2 * mm - 1 - np.sqrt((2 * mm - 1) ** 2 - 8 * t)) / 2
    ).astype(np.int64)
    first_in_row = r * m[seg] - r * (r + 1) // 2
    c = t - first_in_row + r + 1
    ia = starts[seg] + r
    ib = starts[seg] + c
    a_ids, b_ids = ids[ia], ids[ib]
    swap = a_ids > b_ids
    a_ids[swap], b_ids[swap] = b_ids[swap], a_ids[swap]
    ka = np.where(swap, keys[ib], keys[ia])
    kb = np.where(swap, keys[ia], keys[ib])
    cand = pd.DataFrame({"id_a": a_ids, "id_b": b_ids,
                         "_ka": ka, "_kb": kb})
    cand = cand[cand.id_a != cand.id_b].drop_duplicates(["id_a", "id_b"])
    if not len(cand):
        return empty
    ok = lev_le_k(cand["_ka"].tolist(), cand["_kb"].tolist(), k)
    out = cand.loc[ok, ["id_a", "id_b"]]
    return pa.table({
        "id_a": pa.array(out["id_a"].to_numpy(dtype=np.int64)),
        "id_b": pa.array(out["id_b"].to_numpy(dtype=np.int64)),
    })


def edit_distance_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_len: int = 24,
    max_edits: int = 1,
    partitions: int = DEFAULT_PARTITIONS,
    max_group: int = 4096,
) -> ray.data.Dataset:
    """All pairs whose ``key_len``-prefix keys are within ``max_edits``
    Levenshtein edits → (id_a, id_b), id_a < id_b, exact (candidate
    generation is complete by the FastSS theorem; verify is true
    Levenshtein). ``max_edits`` 1 or 2 — the deletion neighborhood
    grows x L per level (k=2 emits ~L^2/2 more rows; beyond that
    FastSS stops paying)."""
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2")

    def _variants(t: pa.Table) -> pa.Table:
        # null text cannot be edit-compared: without this filter, null
        # keys fill to one common hash, every null pair becomes a
        # candidate, and the verify kernel crashes on len(None)
        t = t.filter(pc.is_valid(t[text_col]))
        key = pc.utf8_slice_codeunits(t[text_col], 0, key_len)
        ids = t[id_col]
        levels = [key.combine_chunks() if isinstance(key, pa.ChunkedArray)
                  else key]
        one_del = _deletion_variants(levels[0], key_len)
        levels.extend(one_del)
        if max_edits == 2:
            # distinct 2-deletion subsequences: positions i < j of the
            # original == delete d1, then d2 >= d1 in the shortened key
            for d1, v in enumerate(one_del):
                two = _deletion_variants(v, key_len - 1)
                levels.extend(two[d1:])
        tables = []
        for v in levels:
            vh = hash_arrow_u64(v, seed=0xFA57).view(np.int64)
            tables.append(pa.table({
                "_vh": pa.array(vh),
                "_part": pa.array(
                    (vh.view(np.uint64) % np.uint64(partitions))
                    .astype(np.int64)
                ),
                "_id": ids,
                "_key": key,
            }))
        return pa.concat_tables(tables)

    variants = ds.map_batches(_variants, batch_format="pyarrow",
                              zero_copy_batch=True)
    pairs = variants.groupby("_part").map_groups(
        lambda g: _pairs_partition(g, max_edits, max_group),
        batch_format="pandas",
    )
    # the same pair can surface under several shared variants (and thus
    # several partitions) — one final |pairs|-bounded exact dedup
    from deduplidog_ray.pipelines.exact import dedupe_exact

    return dedupe_exact(pairs, ["id_a", "id_b"], "id_a",
                        partitions=max(8, partitions // 4))
