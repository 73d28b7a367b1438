"""Exact deduplication + generic relational operators (SQL-verifiable).

≙ the reference's exact mode — stem-index join J1 + predicate P1
(deduplidog/deduplidog.py:285-288, :707-714): duplicates are rows equal on
the chosen key columns; the kept ("canonical") row is the minimum id —
the order-independent analog of "first match wins" (:492-494).

Pattern (scale note): never a row-comparison join and never one group per
distinct key — add a 64-bit key-hash column in a vectorized map_batches,
add ``part = hash % P`` and do ONE ``groupby(part)`` shuffle; inside each
of the P partitions the whole dedup is a single vectorized pandas
``drop_duplicates`` / ``value_counts`` call. Each row moves once,
partitioned by key hash; P scales with data size, UDF dispatch count
stays P (not #distinct-keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplidog_ray.stages.hashing import combine64, hash_arrow_u64

DEFAULT_PARTITIONS = 64


def add_key_hash(
    ds: ray.data.Dataset,
    key_cols: list[str],
    out_col: str = "_key_hash",
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """Vectorized 64-bit hash of the concatenated key columns + the
    ``_part`` hash-partition id used as the shuffle key. Hashing is
    Arrow-cast → polars xxhash — no ``to_pylist``/``str(v)`` per row."""

    def _hash(t: pa.Table) -> pa.Table:
        acc = None
        for c in key_cols:
            h = hash_arrow_u64(t[c], seed=0xDED)
            acc = h if acc is None else combine64(acc, h)
        if acc is None:
            acc = np.zeros(len(t), dtype=np.uint64)
        for name in (out_col, "_part"):
            if name in t.column_names:
                t = t.drop_columns([name])
        t = t.append_column(out_col, pa.array(acc.view(np.int64)))
        part = (acc % np.uint64(partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(part))

    return ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)


def _keep_first_partition(
    g: pd.DataFrame, key_cols: list[str], id_col: str
) -> pd.DataFrame:
    """Partition kernel: sort by id, drop_duplicates on the REAL key columns
    (not ``_key_hash`` — two distinct keys colliding in 64 bits must NOT
    merge; at 10^12 rows collisions are expected by the birthday bound).
    The hash is only the partitioner: equal keys hash equal, so every
    duplicate group is co-located and in-partition key equality is exact."""
    return g.sort_values(id_col, kind="stable").drop_duplicates(
        key_cols, keep="first"
    )


def _report_partition(
    g: pd.DataFrame, key_cols: list[str], id_col: str
) -> pd.DataFrame:
    agg = g.groupby(key_cols, sort=False, dropna=False)[id_col].agg(
        ["min", "size"]
    )
    agg = agg[agg["size"] > 1]
    return pd.DataFrame(
        {id_col: agg["min"].to_numpy(), "n_dups": agg["size"].to_numpy()}
    )


def _singletons_partition(g: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    return g[~g.duplicated(subset=key_cols, keep=False)]


def dedupe_exact(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """Keep, per duplicate group, the row with the minimum ``id_col``."""
    hashed = add_key_hash(ds, key_cols, partitions=partitions)
    out = hashed.groupby("_part").map_groups(
        lambda g: _keep_first_partition(g, key_cols, id_col),
        batch_format="pandas",
    )
    return out.drop_columns(["_key_hash", "_part"])


def duplicate_groups(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """Groups with >1 member: (canonical id, n_dups) per duplicated key.

    ≙ ``having_multiple_candidates`` ambiguity report (deduplidog.py:517-519).
    """
    hashed = add_key_hash(ds, key_cols, partitions=partitions)
    return hashed.groupby("_part").map_groups(
        lambda g: _report_partition(g, key_cols, id_col),
        batch_format="pandas",
    )


def anti_unique(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """Rows whose key matches NO other row — ``invert_selection`` semantics
    (deduplidog.py:128-129, :513-516): the anti-join / EXCEPT output."""
    hashed = add_key_hash(ds, key_cols, partitions=partitions)
    out = hashed.groupby("_part").map_groups(
        lambda g: _singletons_partition(g, key_cols), batch_format="pandas"
    )
    return out.drop_columns(["_key_hash", "_part"])


def _stats_partition(
    t: pa.Table, key_cols: list[str], group_col: str
) -> pa.Table:
    """Per-partition partial: (group, rows, distinct keys). Keys are
    co-located by the hash partitioner, so a (group, key) pair lives in
    exactly ONE partition and the partial distinct counts sum exactly.

    Arrow in AND out: the group column's Arrow type carries through even
    when one partition's groups are all null (pandas inference would
    degrade that to a null/double column and break the downstream
    groupby's schema), and the downstream ``groupby().sum()``
    sort-shuffle runs ~10× faster over Arrow blocks than pandas ones
    (see graph._edges_partition)."""
    g = t.to_pandas()
    rows = g.groupby(group_col, sort=False, dropna=False).size()
    uniq = (
        g.drop_duplicates([group_col, *key_cols])
        .groupby(group_col, sort=False, dropna=False)
        .size()
    )
    return pa.table(
        {
            group_col: pa.array(
                rows.index.to_numpy(),
                type=t.schema.field(group_col).type,
                from_pandas=True,
            ),
            "n_docs": pa.array(rows.to_numpy(dtype=np.int64)),
            "n_unique": pa.array(
                uniq.reindex(rows.index).to_numpy(dtype=np.int64)
            ),
        }
    )


def dup_stats_by_group(
    ds: ray.data.Dataset,
    key_cols: list[str],
    group_col: str,
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """Duplication accounting per group (e.g. per source/domain): total
    rows, distinct keys, duplicate surplus. ≙ the reference's end-of-run
    counters (deduplidog.py bar/summary counters, SURVEY §2.7 G1) lifted
    to corpus scale: the answer every dedup run reports first — "how much
    of each source is duplicated?".

    Shape: hash-partition by KEY (not group), so distinct-key partials
    are exact and additive; the second exchange aggregates ≤ P x |groups|
    partial rows — |corpus|-independent.
    """
    import pyarrow.compute as pc

    hashed = add_key_hash(ds, key_cols, partitions=partitions)
    partials = hashed.groupby("_part").map_groups(
        lambda t: _stats_partition(t, key_cols, group_col),
        batch_format="pyarrow",
    )
    agg = partials.groupby(group_col).sum(["n_docs", "n_unique"])

    def _final(t: pa.Table) -> pa.Table:
        ren = {"sum(n_docs)": "n_docs", "sum(n_unique)": "n_unique"}
        t = t.rename_columns([ren.get(c, c) for c in t.column_names])
        return t.append_column(
            "n_dups", pc.subtract(t["n_docs"], t["n_unique"])
        )

    return agg.map_batches(_final, batch_format="pyarrow", zero_copy_batch=True)


def _savings_partition(
    t: pa.Table, key_cols: list[str], id_col: str, weight_col: str,
    group_col: str,
) -> pa.Table:
    """Per-partition partial: (group, rows dropped, weight saved) when
    every duplicate key keeps only its min-``id_col`` member. True-key
    grouping (not the 64-bit hash) — same collision rule as
    ``_keep_first_partition``; keys are co-located by the hash
    partitioner so partials are exact and additive."""
    g = t.to_pandas()
    keep = g.groupby(key_cols, sort=False, dropna=False)[id_col].transform(
        "min"
    )
    dropped = g[g[id_col] != keep]
    agg = dropped.groupby(group_col, sort=False, dropna=False).agg(
        n=(id_col, "size"), w=(weight_col, "sum")
    )
    return pa.table(
        {
            group_col: pa.array(
                agg.index.to_numpy(),
                type=t.schema.field(group_col).type,
                from_pandas=True,
            ),
            "clips_dropped": pa.array(agg["n"].to_numpy(dtype=np.int64)),
            "saved": pa.array(agg["w"].to_numpy(dtype=np.int64)),
        }
    )


def dedup_savings(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    weight_col: str,
    group_col: str,
    partitions: int = DEFAULT_PARTITIONS,
) -> ray.data.Dataset:
    """The dedup SAVINGS report: per ``group_col``, how many rows and how
    much ``weight_col`` (bytes, milliseconds, tokens) a keep-first exact
    dedup would remove. ≙ the reference's ``size_affected`` run counter
    (deduplidog.py:243-251, :317-325 — "how much disk does this free?")
    lifted to a keyed corpus aggregate.

    Same two-exchange shape as :func:`dup_stats_by_group`: hash-partition
    by KEY so keep-first decisions are exact in-partition, then one tiny
    grouped sum over ≤ P × |groups| partials.
    """
    hashed = add_key_hash(ds, key_cols, partitions=partitions)
    partials = hashed.groupby("_part").map_groups(
        lambda t: _savings_partition(t, key_cols, id_col, weight_col,
                                     group_col),
        batch_format="pyarrow",
    )
    agg = partials.groupby(group_col).sum(["clips_dropped", "saved"])

    def _final(t: pa.Table) -> pa.Table:
        ren = {"sum(clips_dropped)": "clips_dropped", "sum(saved)": "saved"}
        return t.rename_columns([ren.get(c, c) for c in t.column_names])

    return agg.map_batches(_final, batch_format="pyarrow",
                           zero_copy_batch=True)


def cluster_size_histogram(
    ds: ray.data.Dataset,
    key_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Duplicate-cluster size distribution: (size, n_clusters) — the
    corpus-QA question "how big are the duplicate families?" (the
    reference's run summary counts only totals, deduplidog.py:317-325;
    at corpus scale the SHAPE of the distribution drives dedup policy).

    Two-level aggregation, both shuffles bounded: level 1 groups by the
    duplicate key (same exchange as :func:`dedupe_exact` — \\|keys\\|
    rows out), level 2 histograms the sizes via per-batch ``value_counts``
    partials + one tiny grouped sum (\\|distinct sizes\\| rows — dozens).
    Equals SQL's nested aggregate GROUP BY size over GROUP BY key.
    """
    key_cols = key_cols or ["key"]
    sizes = ds.groupby(key_cols[0] if len(key_cols) == 1 else key_cols).count()

    def _hist(t: pa.Table) -> pa.Table:
        vc = pd.Series(t["count()"].to_numpy(zero_copy_only=False)
                       ).value_counts()
        return pa.table(
            {"size": pa.array(vc.index.to_numpy().astype(np.int64)),
             "_n": pa.array(vc.to_numpy().astype(np.int64))}
        )

    out = (
        sizes.map_batches(_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("size")
        .sum("_n")
    )
    return out.map_batches(
        lambda t: pa.table(
            {"size": t["size"],
             "n_clusters": t["sum(_n)"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
