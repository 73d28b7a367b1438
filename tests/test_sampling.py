"""Hash sampling, per-key quota, and token-frequency vs brute force."""

import collections
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.pipelines.sampling import quota_per_key, sample_hash
from deduplidog_ray.pipelines.textops import token_freq


def _docs(n: int = 300, seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    srcs = [f"s{i}" for i in range(7)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([srcs[i] for i in rng.integers(0, 7, n)]),
            "text": pa.array(
                [
                    " ".join(
                        np.random.default_rng(seed + i).choice(
                            ["Apf", "bei", "cor", "dit", "EEL", "fog"], size=9
                        )
                    )
                    for i in range(n)
                ]
            ),
        }
    )


def test_sample_hash_matches_predicate_and_layout_invariant(ray_session):
    t = _docs()
    got = sample_hash(rd.from_arrow(t), rate_num=2, rate_den=7).to_pandas()
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    member = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)) % 7 < 2
    want = set(ids[member].tolist())
    assert set(got["doc_id"]) == want
    assert 0 < len(want) < len(t)  # the rate actually bites
    # membership is independent of block layout
    re8 = sample_hash(
        rd.from_arrow(t).repartition(8), rate_num=2, rate_den=7
    ).to_pandas()
    assert set(re8["doc_id"]) == want


def test_split_by_hash_disjoint_exhaustive_and_layout_invariant(ray_session):
    from deduplidog_ray.pipelines.sampling import split_by_hash

    t = _docs(n=1000)
    got = split_by_hash(rd.from_arrow(t)).to_pandas()
    assert len(got) == 1000  # exhaustive: every row assigned exactly once
    # matches the SQL CASE predicate bit-for-bit
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    bucket = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)) % 10
    want = np.where(bucket < 8, "train", np.where(bucket < 9, "val", "test"))
    by_id = got.set_index("doc_id")["split"]
    assert (by_id.loc[t["doc_id"].to_numpy()].to_numpy() == want).all()
    # all three splits non-empty at n=1000 and roughly 8/1/1
    counts = got["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # layout-invariant
    re8 = split_by_hash(rd.from_arrow(t).repartition(8)).to_pandas()
    assert (
        re8.set_index("doc_id")["split"].loc[t["doc_id"].to_numpy()].to_numpy()
        == want
    ).all()


def test_quota_per_key_matches_pandas_head(ray_session):
    t = _docs()
    got = quota_per_key(
        rd.from_arrow(t), key_col="source", n=5, order_col="doc_id"
    ).to_pandas()
    df = t.to_pandas()
    want = df.sort_values("doc_id").groupby("source").head(5)
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    assert got.groupby("source").size().max() <= 5
    assert set(got.columns) == {"doc_id", "source", "text"}  # _part dropped


def test_token_freq_matches_counter(ray_session):
    t = _docs(80)
    got = token_freq(rd.from_arrow(t)).to_pandas()
    cnt = collections.Counter()
    for s in t["text"].to_pylist():
        cnt.update(re.findall(r"\w+", s.lower()))
    want = dict(cnt)
    assert dict(zip(got["token"], got["count"])) == want
    # min_count filter
    thr = token_freq(rd.from_arrow(t), min_count=50).to_pandas()
    assert dict(zip(thr["token"], thr["count"])) == {
        k: v for k, v in want.items() if v >= 50
    }


def test_group_quantiles_matches_duckdb_rule(ray_session):
    """Int-key branch + duplicate values: the partition kernel must pick
    the element at ceil(q*n)-1 of each sorted group (DuckDB quantile_disc),
    including groups with ties and singletons."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from deduplidog_ray.pipelines.stats import group_quantiles

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 7, size=400).astype(np.int64)
    vals = rng.integers(0, 50, size=400).astype(np.int64)
    keys[-1], vals[-1] = 99, 42                     # singleton group
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    got = (
        group_quantiles(rd.from_arrow(t), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT k, quantile_disc(v, 0.25) AS p25,
                  quantile_disc(v, 0.5) AS p50,
                  quantile_disc(v, 0.75) AS p75
           FROM t GROUP BY k ORDER BY k"""
    ).fetchdf()
    assert got.astype("int64").equals(want.astype("int64"))


def test_chunk_docs_windows_and_edges(ray_session):
    from deduplidog_ray.pipelines.chunking import chunk_docs

    texts = [
        " ".join(f"t{i}" for i in range(10)),   # starts 0,4,8 → 6,6,2
        " ".join(f"u{i}" for i in range(5)),    # starts 0,4 → 5,1
        "",                                      # empty → no chunks
        None,                                    # null → no chunks
        " ".join(f"w{i}" for i in range(12)),   # starts 0,4,8 → 6,6,4
    ]
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())})
    got = chunk_docs(
        rd.from_arrow(t), chunk_tokens=6, stride=4
    ).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    # doc 0: starts 0,4,8 → windows of 6,6,2
    d0 = got[got.doc_id == 0]
    assert list(d0.n_tokens) == [6, 6, 2]
    assert d0.iloc[1].chunk_text == "t4 t5 t6 t7 t8 t9"
    # doc 1: 5 tokens, starts 0,4 → windows of 5,1 (tail shorter)
    d1 = got[got.doc_id == 1]
    assert list(d1.n_tokens) == [5, 1]
    assert d1.iloc[1].chunk_text == "u4"
    # empty and null docs emit nothing
    assert not len(got[got.doc_id.isin([2, 3])])
    # layout invariance
    re7 = chunk_docs(
        rd.from_arrow(t).repartition(4), chunk_tokens=6, stride=4
    ).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert re7.equals(got)


def test_quantile_threshold_filter_matches_sorted_rule(ray_session):
    from deduplidog_ray.pipelines.stats import quantile_threshold_filter

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50, 997).astype(np.int64)
    t = pa.table({"doc_id": pa.array(np.arange(997, dtype=np.int64)),
                  "n_chars": pa.array(vals)})
    got = quantile_threshold_filter(
        rd.from_arrow(t).repartition(9), "n_chars", q=0.25
    ).to_pandas()
    thr = np.sort(vals)[int(np.ceil(0.25 * len(vals))) - 1]  # quantile_disc
    want = set(np.nonzero(vals >= thr)[0].tolist())
    assert set(got["doc_id"]) == want
    # 'le' keeps the complement-with-boundary
    low = quantile_threshold_filter(
        rd.from_arrow(t), "n_chars", q=0.25, keep="le"
    ).to_pandas()
    assert set(low["doc_id"]) == set(np.nonzero(vals <= thr)[0].tolist())


def test_hll_distinct_per_key_error_bound_and_layout_invariance(ray_session):
    from deduplidog_ray.pipelines.sketches import hll_distinct_per_key

    rng = np.random.default_rng(17)
    # groups with very different cardinalities incl. a singleton
    spec = {"s_small": 7, "s_mid": 800, "s_big": 20000, "s_one": 1}
    keys, vals = [], []
    for k, card in spec.items():
        pool = rng.integers(0, 1 << 60, card)
        draws = pool[rng.integers(0, card, card * 3)]  # repeats galore
        keys += [k] * len(draws)
        vals += draws.tolist()
    t = pa.table({"source": pa.array(keys),
                  "val": pa.array(np.asarray(vals, dtype=np.int64))})
    got = hll_distinct_per_key(rd.from_arrow(t), "source", "val", p=12)
    est = dict(zip(got["source"], got["approx_distinct"]))
    for k, card in spec.items():
        exact = len(set(np.asarray(vals)[np.asarray(keys) == k].tolist()))
        sigma = 1.04 / np.sqrt(1 << 12)
        assert abs(est[k] - exact) <= max(2, 5 * sigma * exact), (k, est[k], exact)
    # register-max merge is associative/commutative: layout cannot change
    # the estimate bit-for-bit
    re9 = hll_distinct_per_key(
        rd.from_arrow(t).repartition(9), "source", "val", p=12
    )
    assert re9.equals(got)
    # string value column path
    ts = pa.table({"source": pa.array(["a"] * 1000),
                   "val": pa.array([f"v{i % 257}" for i in range(1000)])})
    gs = hll_distinct_per_key(rd.from_arrow(ts), "source", "val", p=12)
    assert abs(int(gs["approx_distinct"].iloc[0]) - 257) <= 20


def test_global_top_n_matches_sorted_rule(ray_session):
    from deduplidog_ray.pipelines.stats import global_top_n

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 40, 1000).astype(np.int64)   # heavy ties
    t = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64)),
                  "n_chars": pa.array(vals)})
    got = global_top_n(
        rd.from_arrow(t).repartition(11), by="n_chars", n=50,
        tie_col="doc_id",
    )
    want = (
        t.to_pandas()
        .sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .head(50).reset_index(drop=True)
    )
    assert got.equals(want[got.columns.tolist()])
    # ascending variant
    lo = global_top_n(rd.from_arrow(t), by="n_chars", n=7,
                      ascending=True, tie_col="doc_id")
    want_lo = (
        t.to_pandas().sort_values(["n_chars", "doc_id"]).head(7)
        .reset_index(drop=True)
    )
    assert lo.equals(want_lo[lo.columns.tolist()])
    # n larger than the corpus degrades to a full sorted table
    allr = global_top_n(rd.from_arrow(t), by="n_chars", n=5000,
                        tie_col="doc_id")
    assert len(allr) == 1000


def test_balance_sources_integer_thresholds(ray_session):
    from deduplidog_ray.pipelines.sampling import balance_sources

    rng = np.random.default_rng(41)
    # skewed sources: 40 / 400 / 2000 rows
    srcs = np.array(["tiny"] * 40 + ["mid"] * 400 + ["big"] * 2000)
    ids = np.arange(len(srcs), dtype=np.int64)
    perm = rng.permutation(len(srcs))
    t = pa.table({"doc_id": pa.array(ids[perm]),
                  "source": pa.array(srcs[perm])})
    got = balance_sources(rd.from_arrow(t).repartition(7)).to_pandas()
    # exact membership rule: ((id*K) mod 2^32) < (2^32 * n_min) // n_key
    n = {"tiny": 40, "mid": 400, "big": 2000}
    kept = set(got["doc_id"])
    for did, s in zip(ids[perm], srcs[perm]):
        h = (np.uint64(did) * np.uint64(2654435761)) % np.uint64(1 << 32)
        th = (np.uint64(1 << 32) * np.uint64(40)) // np.uint64(n[s])
        assert (did in kept) == bool(h < th), (did, s)
    # the smallest source keeps everything; big sources shrink toward n_min
    by = got.groupby("source").size()
    assert by["tiny"] == 40
    assert 15 <= by["mid"] <= 70 and 15 <= by["big"] <= 70
    # layout invariance
    re3 = balance_sources(rd.from_arrow(t).repartition(3)).to_pandas()
    assert set(re3["doc_id"]) == kept


def test_quantile_sketch_rank_error_bound(ray_session):
    """ε-rank guarantee (ε = 1/(2k) + merge slack) holds across layouts
    and group shapes, including a group smaller than k (exact there)."""
    from deduplidog_ray.pipelines.sketches import quantile_sketch_per_key

    rng = np.random.default_rng(53)
    keys, vals = [], []
    spec = {"a": 20000, "b": 3000, "small": 40}
    for s, m in spec.items():
        keys += [s] * m
        # lognormal-ish: quantiles far from the mean, ties rare
        vals.append(np.exp(rng.normal(0, 1, m)) * 100)
    vals = np.concatenate(vals)
    t = pa.table({"source": pa.array(keys), "n_chars": pa.array(vals)})
    k = 256
    for parts in (1, 13):
        ds = rd.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        got = quantile_sketch_per_key(
            ds, "source", "n_chars", qs=(0.25, 0.5, 0.75), k=k
        ).set_index("source")
        for s, m in spec.items():
            sv = np.sort(vals[np.asarray(keys) == s])
            for q, name in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
                est = got.loc[s, name]
                # translate value error into RANK error
                rank = np.searchsorted(sv, est, side="left")
                tol = max(2, 2 * m / k)   # ε·n with merge slack
                assert abs(rank - q * m) <= tol, (s, name, rank, q * m)
        # the tiny group is exact (fewer than k values → nothing thinned)
        sv = np.sort(vals[np.asarray(keys) == "small"])
        assert got.loc["small", "p50"] in sv


def test_dedup_savings_report(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from deduplidog_ray.pipelines.exact import dedup_savings

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6, 7],
        "key": ["a", "a", "a", "b", "b", "c", "d"],
        "grp": ["x", "x", "y", "y", "y", "x", "y"],
        "w": [10, 20, 30, 5, 7, 100, 1],
    })
    out = dedup_savings(
        rd.from_pandas(df), key_cols=["key"], id_col="id",
        weight_col="w", group_col="grp",
    ).to_pandas().sort_values("grp").reset_index(drop=True)
    # key a keeps id 1 -> drops id2 (x, 20) and id3 (y, 30);
    # key b keeps id 4 -> drops id5 (y, 7); c and d are singletons
    assert list(out["grp"]) == ["x", "y"]
    assert list(out["clips_dropped"]) == [1, 2]
    assert list(out["saved"]) == [20, 37]


def test_hll_md5_variant_matches_blake2b_error_profile(ray_session):
    """The SQL-exact md5 HLL family: same mergeable structure, estimate
    within the same 5σ band, layout-invariant, and the exact-rational
    harmonic sum equals the float-sum formula within rounding."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from deduplidog_ray.pipelines.sketches import hll_distinct_per_key_md5

    rng = np.random.default_rng(7)
    vals = [f"v{int(x)}" for x in rng.integers(0, 4000, size=20000)]
    keys = [f"k{i % 4}" for i in range(20000)]
    t = pa.table({"source": keys, "val": vals})
    got = hll_distinct_per_key_md5(rd.from_arrow(t), "source", "val", p=8)
    exact = {}
    for k, v in zip(keys, vals):
        exact.setdefault(k, set()).add(v)
    sigma = 1.04 / np.sqrt(256)
    for _, row in got.iterrows():
        tru = len(exact[row["source"]])
        assert abs(row["approx_distinct"] - tru) <= 5 * sigma * tru + 2
    # layout invariance: same registers no matter the block split
    re9 = hll_distinct_per_key_md5(
        rd.from_arrow(t).repartition(9), "source", "val", p=8
    )
    assert got.equals(re9)
