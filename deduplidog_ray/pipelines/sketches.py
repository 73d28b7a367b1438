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


def _hash_col(col: pa.ChunkedArray | pa.Array, seed: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_strings_u64(col.to_pylist(), seed=seed)
    return mix64(col.to_numpy(zero_copy_only=False).astype(np.uint64),
                 seed=seed)


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
