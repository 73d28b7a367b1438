"""distributed_sort_rank: exact global ranks from the range-partitioned
sort (sample boundaries -> exact count offsets -> one shuffle).

Checks: rank parity vs a single-process lexsort (asc + desc, negative
keys, heavy duplicate keys), block-layout invariance (same ranks no
matter how rows are split into blocks — the sample differs, the counts
don't), and the overflow guards refusing to mis-rank out-of-range keys.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deduplidog_ray.pipelines.sort import distributed_sort_rank


def _table(rng, n):
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "key": pa.array(rng.integers(-50, 50, n).astype(np.int64)),
    })


def _ref_ranks(df, descending):
    order = np.lexsort(
        (df["id"].to_numpy(), -df["key"].to_numpy() if descending
         else df["key"].to_numpy())
    )
    rnk = np.empty(len(df), dtype=np.int64)
    rnk[order] = np.arange(1, len(df) + 1)
    return rnk


@pytest.mark.parametrize("descending", [False, True])
def test_rank_parity(ray_session, descending):
    rng = np.random.default_rng(7)
    t = _table(rng, 2000)
    out = distributed_sort_rank(
        rd.from_arrow(t), "key", "id", descending=descending,
        partitions=16, sample_per_block=8,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    df = t.to_pandas()
    df["rnk"] = _ref_ranks(df, descending)
    pd.testing.assert_series_equal(
        out.set_index("id")["rnk"], df.set_index("id")["rnk"]
    )


def test_layout_invariance(ray_session):
    rng = np.random.default_rng(11)
    t = _table(rng, 1200)
    a = distributed_sort_rank(
        rd.from_arrow(t), "key", "id", partitions=8,
    ).to_pandas().sort_values("id")["rnk"].to_numpy()
    parts = [t.slice(0, 100), t.slice(100, 700), t.slice(800, 400)]
    ds_b = rd.from_arrow_refs([__import__("ray").put(p) for p in parts])
    b = distributed_sort_rank(
        ds_b, "key", "id", partitions=8,
    ).to_pandas().sort_values("id")["rnk"].to_numpy()
    assert np.array_equal(a, b)


def test_constant_key_all_ties(ray_session):
    t = pa.table({
        "id": pa.array(np.arange(500, dtype=np.int64)),
        "key": pa.array(np.zeros(500, dtype=np.int64)),
    })
    out = distributed_sort_rank(
        rd.from_arrow(t), "key", "id", partitions=8,
    ).to_pandas().sort_values("id")
    # all keys equal -> rank == id order
    assert np.array_equal(out["rnk"].to_numpy(),
                          out["id"].to_numpy() + 1)


def test_overflow_guards(ray_session):
    big = pa.table({
        "id": pa.array([0, 1], type=pa.int64()),
        "key": pa.array([1 << 31, 0], type=pa.int64()),
    })
    with pytest.raises((OverflowError, Exception)):
        distributed_sort_rank(rd.from_arrow(big), "key", "id").to_pandas()
    neg_tie = pa.table({
        "id": pa.array([-1, 1], type=pa.int64()),
        "key": pa.array([0, 0], type=pa.int64()),
    })
    with pytest.raises((OverflowError, Exception)):
        distributed_sort_rank(rd.from_arrow(neg_tie), "key",
                              "id").to_pandas()
