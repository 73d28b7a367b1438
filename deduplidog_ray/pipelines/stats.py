"""Grouped order statistics: exact per-group discrete quantiles.

≙ the reference's end-of-run counters (SURVEY §2.7 G1) extended with the
distribution shape every corpus report wants (length percentiles per
source/domain). Exact, not sketched: groups are hash-partitioned by key
(every group fully co-located, the `pipelines/exact.py` exchange rule),
then ONE lexsort per partition answers every group's every quantile via
segment arithmetic — no per-key UDF dispatch (stages/verify.py
"EXECUTION SHAPE").

Quantile definition: the lower discrete quantile — element at 0-based
index ``ceil(q*n) - 1`` of the sorted group — matching DuckDB's
``quantile_disc`` (verified empirically across group sizes; use
binary-exact q values like 0.25/0.5/0.75 so ``q*n`` has no
floating-point ambiguity). Discrete (an actual element, not an
interpolation) keeps integer columns integer and the SQL oracle
bit-exact. For 100-TB cardinalities where even one value column per
group is too wide, swap the partition kernel for a mergeable sketch
(t-digest / KLL); the exchange shape stays identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.hashing import hash_strings_u64, mix64


def group_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key discrete quantiles of ``val_col`` → columns p25/p50/... ."""
    names = [f"p{int(round(q * 100))}" for q in qs]

    def _tag(t: pa.Table) -> pa.Table:
        key = t[key_col]
        if pa.types.is_string(key.type) or pa.types.is_large_string(key.type):
            h = hash_strings_u64(key.to_pylist(), seed=0x57A7)
        else:
            h = mix64(key.to_numpy().astype(np.uint64), seed=0x57A7)
        return t.append_column(
            "_part", pa.array((h % np.uint64(partitions)).astype(np.int64))
        )

    def _quant(g: pd.DataFrame) -> pd.DataFrame:
        keys, uniq = pd.factorize(g[key_col], sort=False)
        vals = g[val_col].to_numpy()
        order = np.lexsort((vals, keys))
        keys_s, vals_s = keys[order], vals[order]
        seg_start = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])
        seg_len = np.diff(np.r_[seg_start, len(keys_s)])
        out = {key_col: uniq[keys_s[seg_start]]}
        for q, name in zip(qs, names):
            idx = seg_start + np.ceil(q * seg_len).astype(np.int64) - 1
            out[name] = vals_s[idx]
        return pd.DataFrame(out)

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_part").map_groups(_quant, batch_format="pandas")


def global_top_n(
    ds: ray.data.Dataset,
    by: str,
    n: int = 100,
    ascending: bool = False,
    tie_col: str | None = None,
) -> pd.DataFrame:
    """Global ORDER BY ``by`` LIMIT ``n`` without sorting the corpus.

    The scale-right top-N shape: every batch emits only its local top-n
    rows (one ``argpartition`` + small argsort per batch — O(B + n log n),
    not O(B log B)), and the driver merges blocks × n candidate rows.
    A ``ds.sort().limit()`` plan would shuffle and sort EVERY row to
    discard all but n; here shuffle volume is O(blocks × n), independent
    of corpus size. ``tie_col`` breaks equal ``by`` values
    deterministically (ascending), making the result total-order stable
    and SQL-exact (ORDER BY by [DESC], tie_col LIMIT n).
    """
    sign = 1 if ascending else -1

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        v = t[by].to_numpy(zero_copy_only=False)
        k = min(n, len(v))
        if tie_col is not None:
            tie = t[tie_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((tie, sign * v))
            take = order[:k]
        else:
            part = np.argpartition(sign * v, k - 1)[:k]
            take = part[np.argsort(sign * v[part], kind="stable")]
        return t.take(pa.array(take))

    cand = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    keys = [by] if tie_col is None else [by, tie_col]
    asc = [ascending] if tie_col is None else [ascending, True]
    return cand.sort_values(keys, ascending=asc).head(n).reset_index(drop=True)


def quantile_threshold_filter(
    ds: ray.data.Dataset,
    val_col: str,
    q: float = 0.25,
    keep: str = "ge",
) -> ray.data.Dataset:
    """Keep rows whose ``val_col`` clears the corpus-wide exact discrete
    q-quantile (the "drop the bottom quartile by length/quality" filter).

    Two streaming passes, zero shuffle:

    1. **Histogram combiner** — each batch emits (value, count) partials
       via one bincount-style value_counts; a single ``groupby(value)``
       sum merges them. Shuffle volume is O(|distinct values|) — for
       bounded-domain metrics (char counts, 0-100 scores) that's
       constant in corpus size, the same |vocab|-bounded trick as
       ``token_freq``. The exact quantile falls out of the histogram's
       cumulative sum at 0-based index ``ceil(q*n) - 1`` (DuckDB
       ``quantile_disc``, same rule as :func:`group_quantiles`).
    2. **Broadcast filter** — the scalar threshold ships to a stateless
       ``map_batches`` predicate.

    Exact for any value type Arrow can group (int/float/string); never
    sorts the corpus and never collects it.
    """
    if keep not in ("ge", "le"):
        raise ValueError("keep must be 'ge' or 'le'")

    def _hist(t: pa.Table) -> pa.Table:
        vc = pd.Series(
            t[val_col].to_numpy(zero_copy_only=False)
        ).value_counts()
        return pa.table(
            {"v": pa.array(vc.index.to_numpy()),
             "c": pa.array(vc.to_numpy().astype(np.int64))}
        )

    hist = (
        ds.map_batches(_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .sum("c")
        .to_pandas()
        .sort_values("v")
    )
    n = int(hist["sum(c)"].sum())
    if n == 0:
        return ds
    idx = int(np.ceil(q * n)) - 1
    cum = hist["sum(c)"].cumsum().to_numpy()
    thr = hist["v"].to_numpy()[np.searchsorted(cum, idx + 1)]

    def _filter(t: pa.Table) -> pa.Table:
        v = t[val_col].to_numpy(zero_copy_only=False)
        mask = v >= thr if keep == "ge" else v <= thr
        return t.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)


def top_tokens_per_key(
    ds: ray.data.Dataset,
    key_col: str = "source",
    text_col: str = "text",
    k_top: int = 3,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key heavy hitters: the ``k_top`` most frequent whitespace
    tokens per key (count desc, token asc tie-break) — the corpus-QA
    question "what dominates each source/domain?".

    Combiner shape end-to-end: per-batch partial (key, token) counts (one
    row per distinct pair per batch, never per occurrence), one global
    ``groupby(key+token).sum`` over partials, then a quota-style hash
    partition by KEY where one sort answers every key's top-k. Exactly
    SQL: QUALIFY row_number() OVER (PARTITION BY key ORDER BY c DESC,
    token) <= k.
    """
    from deduplidog_ray.stages.signatures import tokenize_offsets

    SEP = "\x1e"

    def _partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        toks, off = tokenize_offsets(t[text_col].to_pylist())
        rep = np.repeat(np.arange(len(keys)), np.diff(off))
        vc = pd.Series(
            [f"{keys[i]}{SEP}{tok}" for i, tok in zip(rep, toks)],
            dtype="object",
        ).value_counts()
        return pa.table(
            {
                "kt": pa.array(vc.index.to_numpy(), type=pa.string()),
                "c": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kt")
        .sum("c")
    )

    def _split(t: pa.Table) -> pa.Table:
        kt = t["kt"].to_pylist()
        pairs = [s.split(SEP, 1) for s in kt]
        keys = [p[0] for p in pairs]
        h = hash_strings_u64(keys, seed=0x707)
        return pa.table(
            {
                key_col: pa.array(keys, type=pa.string()),
                "token": pa.array([p[1] for p in pairs], type=pa.string()),
                "c": t["sum(c)"],
                "_part": pa.array(
                    (h % np.uint64(partitions)).astype(np.int64)
                ),
            }
        )

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(
            [key_col, "c", "token"], ascending=[True, False, True],
            kind="stable",
        )
        return (
            out.groupby(key_col, sort=False).head(k_top).drop(columns=["_part"])
        )

    return (
        merged.map_batches(_split, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(_topk, batch_format="pandas")
    )


def rollup_agg(
    ds: ray.data.Dataset,
    group_cols: list[str],
    value_col: str,
    count_alias: str = "n_rows",
    sum_alias: str = "sum_val",
    lvl_col: str = "lvl",
) -> pd.DataFrame:
    """GROUP BY ROLLUP(c1, .., ck): the hierarchical-subtotal aggregate.

    Exactly ONE distributed aggregation — the leaf level
    ``groupby(group_cols)`` with combiner-style partials (Ray Data's
    hash aggregate) — then every coarser level is derived from the leaf
    table, which is |leaf groups|-bounded (never the corpus). Count and
    integer sums are exactly additive, so deriving upper levels from
    the leaf is bit-exact, not an approximation; ``value_col`` must be
    integer-typed for that guarantee (float re-summation differs in
    rounding — refuse rather than drift from the oracle).

    Rolled-up key columns are NULL; ``lvl_col`` carries how many
    trailing keys were rolled (0 = leaf .. k = grand total), matching
    SQL ``GROUPING(c1)+..+GROUPING(ck)`` so genuine NULL key values
    stay distinguishable from subtotal rows.

    ≙ reference G1 run counters (deduplidog.py:317-325) generalized to
    the subtotal hierarchy a corpus report prints per (source, lang, ..).
    """
    from ray.data.aggregate import Count, Sum

    schema = dict(zip(ds.schema().names, ds.schema().types))
    if not pa.types.is_integer(schema[value_col]):
        raise TypeError(
            f"rollup_agg needs an integer value column for exact "
            f"re-aggregation; {value_col} is {schema[value_col]}"
        )
    leaf = (
        ds.groupby(group_cols)
        .aggregate(
            Count(alias_name=count_alias),
            Sum(value_col, alias_name=sum_alias),
        )
        .to_pandas()
    )
    k = len(group_cols)
    out = [leaf.assign(**{lvl_col: 0})]
    for i in range(k - 1, -1, -1):
        keep = group_cols[:i]
        if keep:
            lvl = (
                leaf.groupby(keep, sort=False, dropna=False)[
                    [count_alias, sum_alias]
                ]
                .sum()
                .reset_index()
            )
        else:
            lvl = pd.DataFrame(
                {
                    count_alias: [int(leaf[count_alias].sum())],
                    sum_alias: [int(leaf[sum_alias].sum())],
                }
            )
        for c in group_cols[i:]:
            lvl[c] = None
        lvl[lvl_col] = k - i
        out.append(lvl[group_cols + [count_alias, sum_alias, lvl_col]])
    res = pd.concat(out, ignore_index=True)
    res[count_alias] = res[count_alias].astype(np.int64)
    res[sum_alias] = res[sum_alias].astype(np.int64)
    res[lvl_col] = res[lvl_col].astype(np.int64)
    return res


def cube_agg(
    ds: ray.data.Dataset,
    group_cols: list[str],
    value_col: str,
    count_alias: str = "n_rows",
    sum_alias: str = "sum_val",
    lvl_col: str = "lvl",
) -> pd.DataFrame:
    """GROUP BY CUBE(c1, .., ck): every subset of the grouping keys.

    Same execution contract as :func:`rollup_agg` — ONE distributed
    leaf aggregate, every other level derived exactly from the
    |groups|-bounded leaf — but over all 2^k subsets. ``lvl_col`` is
    the GROUPING bitmask (bit i set = group_cols[i] rolled up, MSB
    first, matching SQL ``GROUPING(c1)*2^(k-1) + .. + GROUPING(ck)``),
    which — unlike a rolled-count — uniquely identifies the subset, so
    genuine NULL key values never collide with subtotal rows."""
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    schema = dict(zip(ds.schema().names, ds.schema().types))
    if not pa.types.is_integer(schema[value_col]):
        raise TypeError(
            f"cube_agg needs an integer value column; {value_col} is "
            f"{schema[value_col]}"
        )
    leaf = (
        ds.groupby(group_cols)
        .aggregate(
            Count(alias_name=count_alias),
            Sum(value_col, alias_name=sum_alias),
        )
        .to_pandas()
    )
    k = len(group_cols)
    out = []
    for keep_n in range(k, -1, -1):
        for keep in combinations(range(k), keep_n):
            keep_cols = [group_cols[i] for i in keep]
            if keep_cols == group_cols:
                lvl = leaf.copy()
            elif keep_cols:
                lvl = (
                    leaf.groupby(keep_cols, sort=False, dropna=False)[
                        [count_alias, sum_alias]
                    ]
                    .sum()
                    .reset_index()
                )
            else:
                lvl = pd.DataFrame(
                    {
                        count_alias: [int(leaf[count_alias].sum())],
                        sum_alias: [int(leaf[sum_alias].sum())],
                    }
                )
            mask = 0
            for i in range(k):
                if i not in keep:
                    lvl[group_cols[i]] = None
                    mask |= 1 << (k - 1 - i)
            lvl[lvl_col] = mask
            out.append(lvl[group_cols + [count_alias, sum_alias, lvl_col]])
    res = pd.concat(out, ignore_index=True)
    for c in (count_alias, sum_alias, lvl_col):
        res[c] = res[c].astype(np.int64)
    return res


def _best_rows(
    df: pd.DataFrame,
    key_col: str,
    order_col: str,
    tie_col: str,
    ascending: bool,
) -> pd.DataFrame:
    """Keep each key's best row: (order asc|desc, tie asc). One lexsort
    + one first-in-run mask, every key at once."""
    if not len(df):
        return df
    # null order values can never be a winner: NaT casts to int64 min,
    # which after descending negation OVERFLOWS back to int64 min and
    # sorts first either way — drop such rows before ranking
    valid = df[order_col].notna().to_numpy()
    if not valid.all():
        df = df[valid]
        if not len(df):
            return df
    o = df[order_col].to_numpy()
    if o.dtype.kind == "M":
        o = o.astype("datetime64[us]").astype(np.int64)
    if not ascending:
        # negate in the column's OWN kind: casting a float score to
        # int64 first would truncate 0.9 and 0.2 both to 0 and hand the
        # decision to the tie column
        o = -o.astype(np.int64 if o.dtype.kind in "iub" else np.float64,
                      copy=False)
    codes, _ = pd.factorize(df[key_col], sort=False)
    idx = np.lexsort((df[tie_col].to_numpy(), o, codes))
    c_sorted = codes[idx]
    first = np.r_[True, c_sorted[1:] != c_sorted[:-1]]
    return df.iloc[idx[first]]


def argmax_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    tie_col: str,
    ascending: bool = False,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Greatest-row-per-group (SQL's ``QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY order [DESC], tie) = 1``) as an
    ASSOCIATIVE combiner — each batch first reduces to at most one row
    per key it contains, so the exchange ships |keys seen per batch|
    rows, never the corpus; the per-partition finish runs the exact
    same kernel. Contrast with `quota_per_key` (which must co-locate
    and sort every group member): argmax needs only the winners.

    Deterministic: ties on ``order_col`` break by ascending
    ``tie_col`` (unique id). ≙ the reference's per-stem "first
    matching candidate wins" reduced over an explicit order instead of
    scan order (deduplidog.py:707-714)."""

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        best = _best_rows(df, key_col, order_col, tie_col, ascending)
        h = hash_strings_u64(best[key_col].astype(str).tolist(), seed=0x9B)\
            if best[key_col].dtype == object else \
            mix64(best[key_col].to_numpy().astype(np.uint64), seed=0x9B)
        best = best.copy()
        best["_part"] = (h % np.uint64(partitions)).astype(np.int64)
        return pa.Table.from_pandas(best, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = partials.groupby("_part").map_groups(
        lambda g: _best_rows(g, key_col, order_col, tie_col, ascending),
        batch_format="pandas",
    )
    return out.drop_columns(["_part"])


def _percent_rank_partition(
    g: pd.DataFrame, key_col: str, val_col: str, out_col: str
) -> pd.DataFrame:
    """All keys of one hash partition: SQL ``percent_rank() OVER
    (PARTITION BY key ORDER BY val)`` = (rank−1)/(n−1), ties share the
    min rank, single-row groups → 0.0. One lexsort; tie-run starts are
    forward-filled with maximum.accumulate — no per-key dispatch. The
    division is one IEEE double op over exact ints, so the oracle is
    bit-reproducible."""
    g = g.drop(columns=["_part"])
    if not len(g):
        out = g.copy()
        out[out_col] = pd.Series(dtype=np.float64)
        return out
    codes, _ = pd.factorize(g[key_col], sort=False)
    v = g[val_col].to_numpy()
    order = np.lexsort((v, codes))
    c_s, v_s = codes[order], v[order]
    n = len(c_s)
    pos = np.arange(n, dtype=np.int64)
    new_key = np.r_[True, c_s[1:] != c_s[:-1]]
    key_start = np.maximum.accumulate(np.where(new_key, pos, 0))
    new_run = new_key | np.r_[True, v_s[1:] != v_s[:-1]]
    run_start = np.maximum.accumulate(np.where(new_run, pos, 0))
    rank = run_start - key_start + 1          # min rank within key, 1-based
    # group sizes, broadcast back to rows
    starts = np.flatnonzero(new_key)
    lens = np.diff(np.r_[starts, n])
    n_k = np.repeat(lens, lens)
    pr = np.where(n_k > 1, (rank - 1) / np.maximum(n_k - 1, 1), 0.0)
    out = g.iloc[order].copy()
    out[out_col] = pr
    return out


def group_percent_rank(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "pct_rank",
    partitions: int = 64,
) -> ray.data.Dataset:
    """Per-group percentile rank of every row (SQL ``percent_rank()``) —
    the per-row counterpart of `group_quantiles`: normalize a quality /
    length signal into [0,1] within its source so thresholds transfer
    across heterogeneous domains (the standard quality-pruning step
    before mixing corpora). Same exchange as every grouped op here: ONE
    ``hash(key) % P`` shuffle, one lexsort per partition, P dispatches."""

    def _part(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_strings_u64(col.to_pylist(), seed=0x9C)
        else:
            h = mix64(col.to_numpy().astype(np.uint64), seed=0x9C)
        return t.append_column(
            "_part", pa.array((h % np.uint64(partitions)).astype(np.int64))
        )

    parted = ds.map_batches(_part, batch_format="pyarrow",
                            zero_copy_batch=True)
    return parted.groupby("_part").map_groups(
        lambda g: _percent_rank_partition(g, key_col, val_col, out_col),
        batch_format="pandas",
    )


def mad_outliers(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    k: int = 3,
    out_col: str = "is_outlier",
    partitions: int = 64,
) -> ray.data.Dataset:
    """Robust per-group outlier flag: |x − median| > k · MAD, both the
    median and the MAD (median absolute deviation) the exact discrete
    quantile of :func:`group_quantiles` (DuckDB ``quantile_disc`` rule)
    — so with integer values the whole predicate is integer compares
    and the SQL oracle is bit-exact.

    Median/MAD (not mean/σ) because corpus length and quality columns
    are heavy-tailed: one 100 MB document shifts a mean filter's
    threshold arbitrarily but moves the median by at most one rank.

    Shape: two |keys|-bounded grouped-quantile passes (each ONE keyed
    shuffle of (key, value) pairs), the tiny per-key (median, MAD)
    table broadcast via ``ray.put`` once, then a stateless streaming
    flag pass over the corpus — the corpus itself never shuffles.
    """
    med_df = group_quantiles(
        ds, key_col, val_col, qs=(0.5,), partitions=partitions
    ).to_pandas()
    med_map = ray.put(dict(zip(med_df[key_col], med_df["p50"])))

    def _dev(df: pd.DataFrame) -> pd.DataFrame:
        med = df[key_col].map(ray.get(med_map)).to_numpy()
        out = df[[key_col]].copy()
        out["_absdev"] = np.abs(df[val_col].to_numpy() - med)
        return out

    dev = ds.map_batches(_dev, batch_format="pandas")
    mad_df = group_quantiles(
        dev, key_col, "_absdev", qs=(0.5,), partitions=partitions
    ).to_pandas()
    mad_map = ray.put(dict(zip(mad_df[key_col], mad_df["p50"])))

    def _flag(df: pd.DataFrame) -> pd.DataFrame:
        med = df[key_col].map(ray.get(med_map)).to_numpy()
        mad = df[key_col].map(ray.get(mad_map)).to_numpy()
        df = df.copy()
        df[out_col] = np.abs(df[val_col].to_numpy() - med) > k * mad
        return df

    return ds.map_batches(_flag, batch_format="pandas")


def group_corr(
    ds: ray.data.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    out_col: str = "corr_xy",
) -> ray.data.Dataset:
    """Per-group Pearson correlation of two INTEGER columns via the
    textbook sufficient statistics — the "does length predict quality?"
    per-source diagnostic.

    Combiner end-to-end: each batch reduces to (key, n, Σx, Σy, Σx²,
    Σy², Σxy) partials (exactly additive int64 sums), ONE |keys×blocks|-
    bounded groupby merges them, and the final |keys|-row pass computes
    corr = (nΣxy − ΣxΣy) / (√(nΣx² − Σx²) · √(nΣy² − Σy²)) with each
    term an exact int64 converted to double once — the SQL oracle spells
    the identical formula over DuckDB hugeint sums, so the doubles match
    bit-for-bit while every term stays < 2⁵³. For corpora where the
    terms exceed int64/2⁵³, lift the partials to float128/Python int and
    scope the oracle claim (same caveat as the int-sum family ops).
    Zero-variance groups emit NaN (SQL: NULL via NULLIF) — filter
    upstream if the domain allows them.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t[key_col].to_numpy(zero_copy_only=False),
            "x": t[x_col].to_numpy().astype(np.int64),
            "y": t[y_col].to_numpy().astype(np.int64),
        })
        df["xx"] = df.x * df.x
        df["yy"] = df.y * df.y
        df["xy"] = df.x * df.y
        df["n"] = np.int64(1)
        g = df.groupby("k", sort=False).sum().reset_index()
        return pa.Table.from_pandas(
            g.rename(columns={"k": key_col}), preserve_index=False
        )

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(
            Sum("n", alias_name="n"), Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"), Sum("xx", alias_name="sxx"),
            Sum("yy", alias_name="syy"), Sum("xy", alias_name="sxy"),
        )
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy()
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        sxx, syy = df["sxx"].to_numpy(), df["syy"].to_numpy()
        sxy = df["sxy"].to_numpy()
        num = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        vy = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = num / (np.sqrt(vx) * np.sqrt(vy))
        return pd.DataFrame({key_col: df[key_col], out_col: corr})

    return merged.map_batches(_finish, batch_format="pandas")


def key_skew_report(
    ds: ray.data.Dataset,
    key_col: str,
    top: int = 20,
) -> pd.DataFrame:
    """Partition-skew diagnosis for a prospective shuffle key: the
    top-``top`` heaviest keys with exact counts and integer basis-point
    shares — the report that decides whether a `groupby`/join on this
    key needs salting (the flagship's two-pass hot-key detection,
    stages/candidates.py, turned into a user-facing operator; "skew
    handled explicitly" is a north-rule requirement, and the first step
    is measuring it).

    Combiner shape end-to-end: per-batch value_counts partials (one row
    per DISTINCT key per batch), ONE |keys×blocks|-bounded groupby-sum,
    then `global_top_n` merges blocks×top candidates — the corpus is
    read once and never shuffled. ``share_bp`` = count·10000 // total
    (exact integer arithmetic, SQL-replicable); a key above ~100·P/bp
    of its partition budget is a salting candidate.
    """
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(
            t[key_col].to_numpy(zero_copy_only=False)
        ).value_counts()
        return pa.table({
            key_col: pa.array(vc.index.to_numpy()),
            "cnt": pa.array(vc.to_numpy().astype(np.int64)),
        })

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(Sum("cnt", alias_name="n_rows"))
    ).materialize()          # |distinct keys| rows; read twice below
    total = int(counts.sum("n_rows"))
    out = global_top_n(counts, by="n_rows", n=top, ascending=False,
                       tie_col=key_col)
    out["share_bp"] = (out["n_rows"].to_numpy() * 10_000) // total
    return out
