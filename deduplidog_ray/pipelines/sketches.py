"""Mergeable sketches: per-group HyperLogLog distinct counts and an
ε-rank quantile summary.

Exact per-group COUNT DISTINCT (`pipelines/exact.py:dup_stats_by_group`)
shuffles one row per distinct key — correct, but at 10^12-row scale a
group with 10^9 distinct members ships 10^9 rows. The HLL path ships a
CONSTANT 2^p bytes per (group, batch) partial regardless of
cardinality, and the merge is an associative register-max — the
textbook mergeable-sketch combiner (Flajolet et al. 2007; the same
shape Ray Data's own approx aggregates use).

Execution shape:

- **partial** (`map_batches`): hash the value column (blake2b-64 via
  `stages/hashing`), p leading bits pick a register, the count of
  leading zeros of the rest (+1) is the rank; one
  ``np.maximum.at`` per (group, batch) → rows of
  ``(group, registers: binary(2^p))``.
- **merge** (`groupby(group).map_groups``): element-wise ``np.maximum``
  over the partial register arrays — associative + commutative +
  idempotent, so block layout, partial ordering and retries cannot
  change the estimate (pytest-gated).
- **estimate**: the standard HLL-with-corrections formula (linear
  counting below 2.5·m with empty registers; no large-range correction
  needed at 64-bit hashes).

Relative error ≈ 1.04/√(2^p) — 1.6 % at the default p = 12 (4 KiB per
group). Approximate ⇒ rows-only for the driver; the pytest gate checks
every group's estimate against the exact distinct count within 5·σ and
bit-identical results across layouts.

≙ reference G1/G2 run counters (deduplidog.py:517-519) generalized to
the cardinality question a corpus report actually asks ("how many
distinct documents/urls/speakers per source?") at a size where exact
counting is a shuffle you can't afford.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.hashing import hash_strings_u64, mix64
from deduplidog_ray.stages.textguards import assert_sql_exact_text


def _hash_col(col: pa.ChunkedArray | pa.Array, seed: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_strings_u64(col.to_pylist(), seed=seed)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "f":
        # bit-pattern hash: a value cast would truncate floats sharing an
        # integer part into one hash (0.1..0.9 → one distinct)
        arr = np.ascontiguousarray(arr, dtype=np.float64).view(np.uint64)
        return mix64(arr, seed=seed)
    if arr.dtype.kind == "M":
        arr = arr.astype("datetime64[us]").astype(np.int64)
    return mix64(arr.astype(np.uint64), seed=seed)


def _rank_and_register(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index from the top p bits, leading-zero rank + 1 of the
    remaining 64-p bits)."""
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # leading zeros of `rest` via float64 exponent trick is lossy at 64
    # bits; use a vectorized bit scan instead: 64 - bit_length(rest)
    # bit_length via log2 is unsafe near 2^53 — do an exact halving scan
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint8(shift)
        cur[mask] = cur[mask] << np.uint64(shift)
    return reg, (lz + 1).astype(np.uint8)


def hll_distinct_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    p: int = 12,
    seed: int = 0x4117,
) -> pd.DataFrame:
    """→ DataFrame (key, approx_distinct:int64), keys sorted.

    Constant-size partials per (group, batch); register-max merge.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p

    def _partial(t: pa.Table) -> pa.Table:
        keys, uniq = pd.factorize(t[key_col].to_pandas(), sort=False)
        h = _hash_col(t[val_col], seed)
        ok = keys >= 0          # factorize codes nulls -1, which would
        if not ok.all():        # scatter null-key rows into uniq[-1]
            keys, h = keys[ok], h[ok]
        if len(uniq) == 0:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "_regs": pa.array([], type=pa.binary())})
        reg, rank = _rank_and_register(h, p)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (keys, reg), rank)
        return pa.table(
            {
                key_col: pa.array(uniq),
                "_regs": pa.array([r.tobytes() for r in regs],
                                  type=pa.binary()),
            }
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m, dtype=np.uint8)
        for b in g["_regs"]:
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "_regs": [acc.tobytes()]}
        )

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )

    alpha = 0.7213 / (1 + 1.079 / m)
    out_keys, out_est = [], []
    for _, row in merged.iterrows():
        regs = np.frombuffer(row["_regs"], dtype=np.uint8).astype(np.float64)
        est = alpha * m * m / np.sum(np.exp2(-regs))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)          # linear counting
        out_keys.append(row[key_col])
        out_est.append(int(round(est)))
    out = pd.DataFrame({key_col: out_keys, "approx_distinct": out_est})
    return out.sort_values(key_col).reset_index(drop=True)


def quantile_sketch_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    k: int = 512,
) -> pd.DataFrame:
    """Approximate per-key quantiles via a mergeable rank summary —
    the extreme-cardinality path promised by ``stats.group_quantiles``
    (exact needs every group value co-located; the sketch ships ≤ k
    (value, weight) rows per (group, batch) no matter the cardinality).

    Summary rule (deterministic, RNG-free): each batch sorts its group's
    values and keeps the elements at ranks ``floor((i+0.5)·m/k)`` with
    weight ``m/k`` — a uniform rank thinning whose per-partial rank
    error is ≤ m/(2k). Merging concatenates weighted points; errors add
    across partials, so the TOTAL rank error is ≤ n/(2k) for any block
    layout (ε = 1/(2k) relative). The estimate for quantile q is the
    smallest value whose cumulative weight reaches q·n.

    Unlike the HLL register-max, weighted-point merging is layout-
    SENSITIVE in its exact output (different batch splits thin different
    elements) — but the ε-rank guarantee holds for every layout, which
    is what the pytest gate asserts (exact answers, when required, come
    from ``group_quantiles``).
    """
    names = [f"p{int(round(q * 100))}" for q in qs]

    def _partial(t: pa.Table) -> pa.Table:
        keys, uniq = pd.factorize(t[key_col].to_pandas(), sort=False)
        vals = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = keys >= 0          # null keys would segment-label uniq[-1]
        if not ok.all():
            keys, vals = keys[ok], vals[ok]
        order = np.lexsort((vals, keys))
        keys_s, vals_s = keys[order], vals[order]
        starts = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])
        lens = np.diff(np.r_[starts, len(keys_s)])
        out_k, out_v, out_w = [], [], []
        for st, m in zip(starts.tolist(), lens.tolist()):
            kk = min(k, m)
            ranks = np.floor((np.arange(kk) + 0.5) * m / kk).astype(np.int64)
            out_k.extend([uniq[keys_s[st]]] * kk)
            out_v.append(vals_s[st + ranks])
            out_w.append(np.full(kk, m / kk))
        return pa.table(
            {
                key_col: pa.array(out_k),
                "v": pa.array(np.concatenate(out_v) if out_v
                              else np.empty(0, np.float64)),
                "w": pa.array(np.concatenate(out_w) if out_w
                              else np.empty(0, np.float64)),
            }
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["v"].to_numpy(), kind="stable")
        v = g["v"].to_numpy()[order]
        w = g["w"].to_numpy()[order]
        cum = np.cumsum(w)
        n = cum[-1]
        row = {key_col: [g[key_col].iloc[0]]}
        for q, name in zip(qs, names):
            idx = int(np.searchsorted(cum, q * n, side="left"))
            row[name] = [v[min(idx, len(v) - 1)]]
        return pd.DataFrame(row)

    return (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
        .sort_values(key_col)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Bloom filter — the broadcastable membership sketch (no false negatives)
# ---------------------------------------------------------------------------
#
# Completes the mergeable family: HLL (distinct counts, max-merge),
# ε-rank summary (quantiles, weighted merge), Bloom (membership,
# OR-merge), CMS (frequencies, +-merge). The Bloom path is the documented
# scale upgrade for `pipelines/decontam.py`: the exact holdout-gram array
# grows ∝ distinct grams (8 B each), while a Bloom at the same recall
# (recall is ALWAYS 1 — no false negatives by construction) is a fixed
# 2^b-bit broadcast whose false-positive rate, not correctness, is the
# tuning knob. A Bloom FP only FLAGS a clean train doc — the same safe
# asymmetry documented in decontam.py.

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bloom_positions(h: np.ndarray, n_hashes: int, n_bits: int) -> np.ndarray:
    """(n_hashes, n) bit positions via Kirsch–Mitzenmacher double
    hashing: pos_i = h1 + i·h2 (h2 forced odd). n_bits must be 2^b."""
    h1 = h
    h2 = ((h * _BLOOM_MIX) ^ (h >> np.uint64(31))) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :])
            & np.uint64(n_bits - 1)).astype(np.int64)


def _bloom_set(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
    )


def bloom_contains(words: np.ndarray, h: np.ndarray,
                   n_hashes: int) -> np.ndarray:
    """Vectorized membership probe: True ⇔ all k probe bits set."""
    if len(h) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(h, n_hashes, len(words) * 64)
    bits = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) \
        & np.uint64(1)
    return bits.all(axis=0)


def build_ngram_bloom(
    holdout_ds: ray.data.Dataset,
    k: int = 3,
    seed: int = 0x5EED,
    text_col: str = "text",
    log2_bits: int = 22,
    n_hashes: int = 7,
) -> np.ndarray:
    """Bloom over the holdout's token-k-gram hashes (shingle semantics
    identical to decontam.holdout_ngram_set). One streaming pass emits a
    fixed 2^log2_bits-bit partial per block; the merge is bitwise OR —
    associative/commutative/idempotent, so layout and retries cannot
    change the filter (pytest-gated bit equality)."""
    from deduplidog_ray.stages.signatures import shingle_hashes

    n_bits = 1 << log2_bits
    n_words = n_bits // 64

    def _partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        flat, _ = shingle_hashes(t[text_col].to_pylist(), k, seed)
        if len(flat):
            _bloom_set(words, _bloom_positions(flat, n_hashes, n_bits))
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    out = np.zeros(n_words, dtype=np.uint64)
    for b in holdout_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for blob in b["words"].to_pylist():
            out |= np.frombuffer(blob, dtype=np.uint64)
    return out


def decontaminate_bloom(
    train_ds: ray.data.Dataset,
    holdout_ds: ray.data.Dataset,
    k: int = 3,
    seed: int = 0x5EED,
    text_col: str = "text",
    min_hits: int = 1,
    log2_bits: int = 22,
    n_hashes: int = 7,
) -> ray.data.Dataset:
    """`decontam.decontaminate(mode="flag")` with the holdout set
    replaced by a constant-size Bloom broadcast. Guarantees: every doc
    the exact path flags is flagged here too (no false negatives);
    extra flags are Bloom FPs at the documented rate
    (≈ (1 − e^{−kn/m})^k). Columns: ``n_hits_est``, ``contaminated``."""
    import ray as _ray

    from deduplidog_ray.stages.signatures import shingle_hashes

    words_ref = _ray.put(build_ngram_bloom(
        holdout_ds, k, seed, text_col, log2_bits, n_hashes))

    def _score(t: pa.Table) -> pa.Table:
        words = _ray.get(words_ref)  # plasma view, cached per worker
        texts = t[text_col].to_pylist()
        n = len(texts)
        flat, off = shingle_hashes(texts, k, seed)
        # DISTINCT grams per doc — identical accounting to the exact
        # path (decontam.py:_score), so flagged ⊇ exact-flagged holds
        # row for row, not just in aggregate
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        order = np.lexsort((flat, doc_idx))
        d_s, f_s = doc_idx[order], flat[order]
        keep = np.r_[True, (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])] \
            if len(f_s) else np.zeros(0, dtype=bool)
        d_u, f_u = d_s[keep], f_s[keep]
        hit = bloom_contains(words, f_u, n_hashes)
        n_hits = np.bincount(d_u[hit], minlength=n).astype(np.int64)
        t = t.append_column("n_hits_est", pa.array(n_hits))
        return t.append_column(
            "contaminated", pa.array(n_hits >= min_hits)
        )

    return train_ds.map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — LINEAR frequency summary (+-merge is exact)
# ---------------------------------------------------------------------------


def cms_add(
    sketch: np.ndarray, h: np.ndarray, counts: np.ndarray, seeds: np.ndarray
) -> None:
    """Add ``counts`` for hashed keys ``h`` into a (depth, width) CMS."""
    depth, width = sketch.shape
    for d in range(depth):
        cols = (mix64(h, seed=int(seeds[d])) % np.uint64(width)).astype(
            np.int64
        )
        np.add.at(sketch[d], cols, counts)


def cms_estimate(sketch: np.ndarray, h: np.ndarray,
                 seeds: np.ndarray) -> np.ndarray:
    """Point-query estimates (≥ true count always; ≤ true + εN w.h.p.,
    ε = e/width)."""
    depth, width = sketch.shape
    est = None
    for d in range(depth):
        cols = (mix64(h, seed=int(seeds[d])) % np.uint64(width)).astype(
            np.int64
        )
        v = sketch[d][cols]
        est = v if est is None else np.minimum(est, v)
    return est


def cms_token_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    width: int = 1 << 14,
    depth: int = 4,
    seed: int = 0xC0DE,
) -> tuple[np.ndarray, np.ndarray]:
    """(sketch, row_seeds): corpus token-frequency CMS. The sketch is
    LINEAR (CMS(A ⊎ B) = CMS(A) + CMS(B) elementwise), so per-block
    partials sum to EXACTLY the single-pass sketch — layout, ordering
    and retry-free-ness are bit-testable, unlike probabilistic merges.
    Per-block partial size is a constant depth×width×8 bytes."""
    import pyarrow.compute as pc

    seeds = (np.uint64(seed) + np.arange(depth, dtype=np.uint64)
             * np.uint64(0x9E37)).astype(np.uint64)

    def _partial(t: pa.Table) -> pa.Table:
        sk = np.zeros((depth, width), dtype=np.int64)
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(t[text_col], ""), pattern=" ")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        if len(toks):
            vc = pd.Series(toks.to_pandas(), dtype="object").value_counts()
            h = hash_strings_u64(list(vc.index), seed=seed)
            cms_add(sk, h, vc.to_numpy().astype(np.int64), seeds)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    out = np.zeros((depth, width), dtype=np.int64)
    for b in ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for blob in b["sk"].to_pylist():
            out += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return out, seeds


# ---------------------------------------------------------------------------
# SQL-reproducible md5 variants (driver-oracle-checkable sketch states)
# ---------------------------------------------------------------------------
#
# The blake2b family above is the production path (faster, seedable); the
# md5 family below computes THE SAME sketch structures with per-cell
# hashes DuckDB can reproduce (`md5_number_upper(s)` ==
# `int.from_bytes(md5(s).digest()[:8], "little")` — the byte-order
# contract established by textdedup._md5_shingles), so the driver's SQL
# oracle can pin the exact deterministic sketch state, not just bounds.


def _md5_u64(strings) -> np.ndarray:
    import hashlib

    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(s.encode()).digest()[:8], "little")
         for s in strings),
        dtype=np.uint64, count=len(strings),
    )


def cms_token_counts_md5(
    ds: ray.data.Dataset,
    text_col: str = "text",
    width: int = 1 << 14,
    depth: int = 4,
) -> np.ndarray:
    """Corpus token-frequency CMS whose cell indices are SQL-exact:
    bucket for depth row d = md5_u64(str(d) + chr(31) + token) % width.
    Tokenization matches `textops.token_freq` (lowercase ASCII \\w+ —
    the RE2 semantics its oracle already pins). Linear merge of
    constant-size per-block partials, like :func:`cms_token_counts`."""
    import pyarrow.compute as pc

    def _partial(t: pa.Table) -> pa.Table:
        sk = np.zeros((depth, width), dtype=np.int64)
        low = pc.utf8_lower(pc.fill_null(t[text_col], ""))
        toks = pc.list_flatten(
            pc.split_pattern_regex(low, pattern=r"[^\w]+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        if len(toks):
            vc = pd.Series(toks.to_pandas(), dtype="object").value_counts()
            cnt = vc.to_numpy().astype(np.int64)
            for d in range(depth):
                cols = (
                    _md5_u64([f"{d}\x1f{tok}" for tok in vc.index])
                    % np.uint64(width)
                ).astype(np.int64)
                np.add.at(sk[d], cols, cnt)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    out = np.zeros((depth, width), dtype=np.int64)
    for b in ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for blob in b["sk"].to_pylist():
            out += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return out


def cms_estimate_md5(sketch: np.ndarray, tokens: list) -> np.ndarray:
    """Point-query estimates for the md5-cell CMS (min over depth rows)."""
    depth, width = sketch.shape
    est = None
    for d in range(depth):
        cols = (
            _md5_u64([f"{d}\x1f{tok}" for tok in tokens])
            % np.uint64(width)
        ).astype(np.int64)
        v = sketch[d][cols]
        est = v if est is None else np.minimum(est, v)
    return est


def _gram_strings(texts: list, k: int) -> tuple[list, np.ndarray]:
    """Per-doc token-k-gram STRINGS (chr(30)-joined; docs under k tokens
    emit one combined gram — the `textdedup._md5_shingles` construction,
    kept as strings so per-probe-index md5 prefixing stays SQL-exact).

    Loud precondition (ADVICE r4): reserved separators / non-ASCII
    whitespace would silently break engine/oracle tokenizer parity —
    refused per batch by :func:`stages.textguards.assert_sql_exact_text`.
    """
    assert_sql_exact_text(texts, "sketches md5-gram family")
    sep = "\x1e"
    flat: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for i, t in enumerate(texts):
        toks = t.split() if t else []
        if len(toks) >= k:
            flat.extend(
                sep.join(toks[j:j + k]) for j in range(len(toks) - k + 1)
            )
        else:
            flat.append(sep.join(toks))
        offsets[i + 1] = len(flat)
    return flat, offsets


def _md5_bloom_positions(grams: list, n_hashes: int,
                         n_bits: int) -> np.ndarray:
    """(n_hashes, n) bit positions, each SQL-exact:
    pos_i = md5_u64(str(i) + chr(31) + gram) % n_bits."""
    if not grams:
        return np.empty((n_hashes, 0), dtype=np.int64)
    return np.stack([
        (_md5_u64([f"{i}\x1f{g}" for g in grams])
         % np.uint64(n_bits)).astype(np.int64)
        for i in range(n_hashes)
    ])


def build_ngram_bloom_md5(
    holdout_ds: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    log2_bits: int = 22,
    n_hashes: int = 7,
) -> np.ndarray:
    """`build_ngram_bloom` with SQL-exact md5 bit positions (per-probe
    md5 instead of Kirsch–Mitzenmacher double hashing — k independent
    md5 calls cost more CPU but every set bit is reproducible by the
    DuckDB oracle). OR-merge of constant-size per-block partials."""
    n_bits = 1 << log2_bits
    n_words = n_bits // 64

    def _partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        grams, _ = _gram_strings(t[text_col].to_pylist(), k)
        if grams:
            _bloom_set(words, _md5_bloom_positions(grams, n_hashes, n_bits))
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    out = np.zeros(n_words, dtype=np.uint64)
    for b in holdout_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for blob in b["words"].to_pylist():
            out |= np.frombuffer(blob, dtype=np.uint64)
    return out


def decontaminate_bloom_md5(
    train_ds: ray.data.Dataset,
    holdout_ds: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    min_hits: int = 1,
    log2_bits: int = 22,
    n_hashes: int = 7,
) -> ray.data.Dataset:
    """`decontaminate_bloom` with the md5 position family: the ENTIRE
    deterministic filter state — every set bit, every probe, every
    per-doc hit count — is reproducible by the DuckDB oracle, so the
    driver checks values, not just the no-false-negative bound.
    Distinct-gram accounting is by gram STRING (exactly what the SQL
    DISTINCT does). Columns appended: ``n_hits_est``, ``contaminated``."""
    import ray as _ray

    n_bits = 1 << log2_bits
    words_ref = _ray.put(build_ngram_bloom_md5(
        holdout_ds, k, text_col, log2_bits, n_hashes))

    def _score(t: pa.Table) -> pa.Table:
        words = _ray.get(words_ref)  # plasma view, cached per worker
        texts = t[text_col].to_pylist()
        n = len(texts)
        grams, off = _gram_strings(texts, k)
        n_hits = np.zeros(n, dtype=np.int64)
        if grams:
            # hash each DISTINCT gram once for the whole batch (the md5
            # calls dominate), probe vectorized, then count per-doc
            # distinct hits with one bincount over deduped (doc, gram)
            uniq, inv = np.unique(np.asarray(grams, dtype=object),
                                  return_inverse=True)
            pos = _md5_bloom_positions(list(uniq), n_hashes, n_bits)
            bits = (
                words[pos >> 6]
                >> (pos.astype(np.uint64) & np.uint64(63))
            ) & np.uint64(1)
            gram_hit = bits.all(axis=0)                   # per unique gram
            doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(off))
            order = np.lexsort((inv, doc_idx))
            d_s, g_s = doc_idx[order], inv[order]
            keep = np.r_[True,
                         (d_s[1:] != d_s[:-1]) | (g_s[1:] != g_s[:-1])]
            d_u, g_u = d_s[keep], g_s[keep]
            n_hits = np.bincount(
                d_u[gram_hit[g_u]], minlength=n
            ).astype(np.int64)
        t = t.append_column("n_hits_est", pa.array(n_hits))
        return t.append_column(
            "contaminated", pa.array(n_hits >= min_hits)
        )

    return train_ds.map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


def hll_distinct_per_key_md5(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    p: int = 6,
) -> pd.DataFrame:
    """`hll_distinct_per_key` with a fully SQL-exact md5 register state
    AND estimate: register = top p bits of md5_u64(value), rank =
    leading zeros + 1 of the guarded remainder (computable in DuckDB as
    65 - length(bin(...)) — pure integers), and the harmonic-mean sum
    is evaluated as an EXACT RATIONAL (sum of 2^(K-reg) integers / 2^K)
    so float summation ORDER cannot perturb the estimate — the one
    rounding happens in a fixed-shape expression both engines evaluate
    identically. Same constant-size mergeable partials as the blake2b
    path; the estimate is approximate, the STATE is deterministic, so
    the driver oracle can check values, not just error bounds."""
    if not 4 <= p <= 12:
        raise ValueError("p must be in [4, 12]")
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )

    def _partial(t: pa.Table) -> pa.Table:
        keys, uniq = pd.factorize(t[key_col].to_pandas(), sort=False)
        vals = [
            v if v is not None else ""
            for v in t[val_col].to_pylist()
        ]
        h = _md5_u64(vals)
        ok = keys >= 0
        if not ok.all():
            keys, h = keys[ok], h[ok]
        if len(uniq) == 0:
            return pa.table({key_col: pa.array([], type=t[key_col].type),
                             "_regs": pa.array([], type=pa.binary())})
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
        # 65 - bit_length(rest), exact halving scan (same as
        # _rank_and_register's clz — reused inline for the md5 family)
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += np.uint8(shift)
            cur[mask] = cur[mask] << np.uint64(shift)
        rank = (lz + 1).astype(np.uint8)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (keys, reg), rank)
        return pa.table({
            key_col: pa.array(uniq),
            "_regs": pa.array([r.tobytes() for r in regs],
                              type=pa.binary()),
        })

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m, dtype=np.uint8)
        for b in g["_regs"]:
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "_regs": [acc.tobytes()]}
        )

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )

    import math

    out_keys, out_est = [], []
    for _, row in merged.iterrows():
        regs = np.frombuffer(row["_regs"], dtype=np.uint8)
        K = int(regs.max())
        zeros = int((regs == 0).sum())
        # exact rational: sum(2^-reg) == S / 2^K with S an exact int
        S = int(sum(1 << (K - int(r)) for r in regs))
        est = alpha * float(m) * float(m) * (2.0 ** K) / float(S)
        if est <= 2.5 * m and zeros:
            est = float(m) * math.log(float(m) / zeros)
        out_keys.append(row[key_col])
        # half-UP rounding (floor(x+0.5)) in a fixed shape both engines
        # share — Python round() is banker's, DuckDB round() is
        # half-away-from-zero; floor(+0.5) is identical in both
        out_est.append(int(math.floor(est + 0.5)))
    out = pd.DataFrame({key_col: out_keys, "approx_distinct": out_est})
    return out.sort_values(key_col).reset_index(drop=True)
