"""text_near_dup recall gate vs a brute-force all-pairs baseline.

VERDICT r1: the text near-dup pipeline was rows-only with no oracle. The
ground truth here is the SAME signature-level predicate (MinHash-Jaccard
>= t OR SimHash Hamming <= k) evaluated exhaustively over every pair —
so the measured gap is pure candidate-generation loss, mirroring the
flagship's oracle philosophy (deduplidog_ray/oracle.py).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduplidog_ray.config import SignatureConfig
from deduplidog_ray.pipelines.textdedup import (
    make_text_signature_stage,
    text_near_dup_pairs,
)

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


@pytest.fixture(scope="module")
def doc_corpus():
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    # plant near-duplicates: single-token edits and truncations of the
    # first 60 docs (the raw table may carry few natural near-dups)
    next_id = max(ids) + 1
    for i in range(60):
        toks = (texts[i] or "").split()
        if len(toks) < 12:
            continue
        toks[len(toks) // 2] = "EDITED"
        ids.append(next_id)
        texts.append(" ".join(toks))
        next_id += 1
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )


def _truth_pairs(table: pa.Table, cfg: SignatureConfig) -> set:
    sig_tbl = make_text_signature_stage(cfg, "text", "doc_id")(table)
    n = len(sig_tbl)
    ids = sig_tbl["doc_id"].to_numpy()
    sig = np.frombuffer(
        b"".join(sig_tbl["minhash"].to_pylist()), dtype="<u2"
    ).reshape(n, cfg.num_perm)
    sh = sig_tbl["simhash"].to_numpy().view(np.uint64)
    truth = set()
    for i in range(n):
        jac = (sig[i + 1 :] == sig[i]).mean(axis=1)
        x = sh[i + 1 :] ^ sh[i]
        ham = _POP[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
        hits = np.nonzero(
            (jac >= cfg.jaccard_threshold) | (ham <= cfg.simhash_hamming)
        )[0]
        for j in hits:
            a, b = int(ids[i]), int(ids[i + 1 + j])
            truth.add((min(a, b), max(a, b)))
    return truth


def _truth_exact_jaccard(table: pa.Table, cfg: SignatureConfig, thr: float) -> set:
    """Brute-force EXACT k-gram-set Jaccard over all pairs."""
    from deduplidog_ray.stages.signatures import shingle_hashes

    ids = table["doc_id"].to_numpy()
    texts = table["text"].to_pylist()
    flat, off = shingle_hashes(texts, cfg.shingle_k, cfg.seed)
    sets = [np.unique(flat[off[i]: off[i + 1]]) for i in range(len(ids))]
    truth = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
            union = len(sets[i]) + len(sets[j]) - inter
            if union and inter / union >= thr:
                a, b = int(ids[i]), int(ids[j])
                truth.add((min(a, b), max(a, b)))
    return truth


def test_text_ngram_jaccard_exact_verify(ray_session, doc_corpus):
    """n-gram-Jaccard pipeline: every emitted pair carries the TRUE set
    Jaccard (not the MinHash estimate); precision is exact and recall is
    bounded only by LSH candidate generation."""
    import ray.data as rd

    from deduplidog_ray.pipelines.textdedup import text_ngram_jaccard_pairs

    cfg = SignatureConfig()
    thr = cfg.jaccard_threshold
    truth = _truth_exact_jaccard(doc_corpus, cfg, thr)
    assert len(truth) >= 40

    got_df = text_ngram_jaccard_pairs(
        rd.from_arrow(doc_corpus), cfg
    ).to_pandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(got_df["a"], got_df["b"])}
    # exact verify ⇒ no false positives vs the exact-Jaccard ground truth
    assert got <= truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.98, f"recall {recall:.4f} ({len(got & truth)}/{len(truth)})"
    # and the reported jaccard IS the true set Jaccard
    sample = got_df.head(20)
    from deduplidog_ray.stages.signatures import shingle_hashes

    ids_all = doc_corpus["doc_id"].to_numpy()
    texts = doc_corpus["text"].to_pylist()
    flat, off = shingle_hashes(texts, cfg.shingle_k, cfg.seed)
    pos = {int(d): i for i, d in enumerate(ids_all)}
    for a, b, j in zip(sample["a"], sample["b"], sample["jaccard"]):
        A = np.unique(flat[off[pos[int(a)]]: off[pos[int(a)] + 1]])
        B = np.unique(flat[off[pos[int(b)]]: off[pos[int(b)] + 1]])
        inter = len(np.intersect1d(A, B, assume_unique=True))
        assert abs(j - inter / (len(A) + len(B) - inter)) < 1e-12


def _mk_group_table(cfg, sigs, simhashes, ids, band_key=7):
    """One band-key segment as the verifier's input table."""
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "minhash": pa.array(
                [np.asarray(s, dtype="<u2").tobytes() for s in sigs],
                type=pa.binary(),
            ),
            "simhash": pa.array(
                np.asarray(simhashes, dtype=np.uint64).view(np.int64)
            ),
            "band_key": pa.array(np.full(len(ids), band_key, dtype=np.int64)),
            "part": pa.array(np.zeros(len(ids), dtype=np.int64)),
        }
    )


def test_large_group_exact_pair_parity():
    """VERDICT r2 #3: a 1000-member band group where the star center (min
    id) fails verification against every member, but the 999 others all
    pass pairwise. The old star pairing emitted ZERO pairs here; exact
    semantics demand C(999, 2)."""
    from deduplidog_ray.pipelines.textdedup import make_text_verifier

    cfg = SignatureConfig()
    n = 1000
    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(42)
    center_sig = rng.integers(0, 1 << 16, cfg.num_perm)
    member_sig = np.full(cfg.num_perm, 7)
    sigs = [center_sig] + [member_sig] * (n - 1)
    simhashes = [np.uint64(0xFFFFFFFFFFFFFFFF)] + [np.uint64(0)] * (n - 1)
    g = _mk_group_table(cfg, sigs, simhashes, ids)
    out = make_text_verifier(cfg, "doc_id")(g).to_pandas()
    got = set(zip(out["a"].astype(int), out["b"].astype(int)))
    want = {(int(i), int(j)) for i in range(1, n) for j in range(i + 1, n)}
    assert len(out) == len(got)          # each pair exactly once
    assert got == want                   # exact parity vs brute force
    assert not any(a == 0 or b == 0 for a, b in got)


def test_mega_group_connectivity_via_salting():
    """Above ``connectivity_over`` the verifier switches to the flagship's
    salted-subgroup + representative-round shape: far fewer than C(n,2)
    pairs, but the cluster stays one connected component."""
    from deduplidog_ray.pipelines.textdedup import make_text_verifier

    cfg = SignatureConfig()
    n = 1200
    ids = np.arange(n, dtype=np.int64)
    sigs = [np.full(cfg.num_perm, 7)] * n
    simhashes = [np.uint64(0)] * n
    g = _mk_group_table(cfg, sigs, simhashes, ids)
    out = make_text_verifier(cfg, "doc_id", connectivity_over=300)(
        g
    ).to_pandas()
    assert 0 < len(out) < n * (n - 1) // 2
    assert len(out) == len(set(zip(out["a"], out["b"])))  # no dup pairs
    # single connected component over all n members
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(out["a"].astype(int), out["b"].astype(int)):
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n)}) == 1


def test_planted_family_end_to_end(ray_session):
    """400 identical docs (the planted mega-family) + distinct filler
    through the full pipeline: the emitted unique pair set must contain
    every family pair exactly (no star-pairing loss), and nothing outside
    the brute-force signature predicate."""
    import ray.data as rd

    from deduplidog_ray.pipelines.textdedup import text_near_dup_pairs

    cfg = SignatureConfig()
    fam_n = 400
    fam_text = "the quick brown fox jumps over the lazy dog " * 6
    rng = np.random.default_rng(7)
    ids, texts = [], []
    for i in range(fam_n):
        ids.append(i)
        texts.append(fam_text)
    for i in range(100):                 # clearly-dissimilar filler
        ids.append(10_000 + i)
        texts.append(
            " ".join(f"tok{rng.integers(0, 1 << 30)}" for _ in range(40))
        )
    corpus = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    truth = _truth_pairs(corpus, cfg)
    fam_pairs = {(i, j) for i in range(fam_n) for j in range(i + 1, fam_n)}
    assert fam_pairs <= truth
    got_df = text_near_dup_pairs(rd.from_arrow(corpus), cfg).to_pandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(got_df["a"], got_df["b"])}
    assert fam_pairs <= got              # the r2 hole: these were dropped
    assert got <= truth                  # precision stays exact


def test_text_near_dup_recall_and_precision(ray_session, doc_corpus):
    import ray.data as rd

    cfg = SignatureConfig()
    truth = _truth_pairs(doc_corpus, cfg)
    assert len(truth) >= 50          # planted dups make the gate non-vacuous

    got_df = text_near_dup_pairs(rd.from_arrow(doc_corpus), cfg).to_pandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(got_df["a"], got_df["b"])}

    # precision is exact by construction: every emitted pair re-evaluated
    # the same predicate on the same signatures
    assert got <= truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} ({len(got & truth)}/{len(truth)})"


def test_fuzzy_join_matches_bruteforce_with_overlapping_ids(ray_session):
    """Cross-table similarity join: exact parity vs brute-force cross
    Jaccard, with the two tables sharing an id space (uid side-bit must
    disambiguate) and containing planted cross matches."""
    import ray.data as rd

    from deduplidog_ray.pipelines.textdedup import fuzzy_join_text
    from deduplidog_ray.stages.signatures import shingle_hashes

    rng = np.random.default_rng(11)
    cfg = SignatureConfig()

    def _doc(r):
        return " ".join(f"w{r.integers(0, 1 << 20)}" for _ in range(30))

    left_texts = [_doc(rng) for _ in range(40)]
    right_texts = [_doc(rng) for _ in range(40)]
    # plant near-matches: right docs 0..9 are single-token edits of left
    for i in range(10):
        toks = left_texts[i].split()
        toks[5] = "EDITED"
        right_texts[i] = " ".join(toks)
    # ids overlap across tables on purpose
    left = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                     "text": pa.array(left_texts)})
    right = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                      "text": pa.array(right_texts)})

    got_df = fuzzy_join_text(
        rd.from_arrow(left), rd.from_arrow(right), threshold=0.7
    ).to_pandas()
    got = {(a, b) for a, b in zip(got_df["left_id"], got_df["right_id"])}

    # brute force: exact shingle Jaccard over every cross pair
    fl, ol = shingle_hashes(left_texts, cfg.shingle_k, cfg.seed)
    fr, orr = shingle_hashes(right_texts, cfg.shingle_k, cfg.seed)
    lsets = [np.unique(fl[ol[i]: ol[i + 1]]) for i in range(40)]
    rsets = [np.unique(fr[orr[i]: orr[i + 1]]) for i in range(40)]
    want = set()
    for i in range(40):
        for j in range(40):
            inter = len(np.intersect1d(lsets[i], rsets[j],
                                       assume_unique=True))
            union = len(lsets[i]) + len(rsets[j]) - inter
            if union and inter / union >= 0.7:
                want.add((i, j))
    assert {(i, i) for i in range(10)} <= want   # plants are in truth
    assert got == want
    # jaccard column carries the true value
    for _, row in got_df.iterrows():
        i, j = int(row["left_id"]), int(row["right_id"])
        inter = len(np.intersect1d(lsets[i], rsets[j], assume_unique=True))
        union = len(lsets[i]) + len(rsets[j]) - inter
        assert abs(row["jaccard"] - inter / union) < 1e-12


def test_minhash_md5_params_arithmetic_envelope():
    """The SQL-parity contract: a odd and < 2^63, shingle hash < 2^60,
    so DuckDB's signed-128-bit a*x+b never overflows and % 2^64 equals
    numpy uint64 wraparound (see textdedup.minhash_md5_params)."""
    import numpy as np

    from deduplidog_ray.pipelines.textdedup import (
        _md5_shingles,
        minhash_md5_params,
    )

    a, b = minhash_md5_params()
    assert (a % 2 == 1).all() and int(a.max()) < 1 << 63
    assert int(b.max()) < 1 << 63
    x, off = _md5_shingles(["one two three four", "tiny", ""], 3)
    assert int(x.max()) < 1 << 60
    assert off.tolist() == [0, 2, 3, 4]  # short docs emit one shingle
    # hugeint-exact: a*x+b < 2^124 for every pair
    prod = int(a.max()) * int(x.max()) + int(b.max())
    assert prod < 1 << 127


def test_minhash_band_pairs_planted_family(ray_session):
    """A planted family of near-identical docs must surface as band-share
    candidates; unrelated docs must not pair with them."""
    import pandas as pd

    import ray.data

    from deduplidog_ray.pipelines.textdedup import minhash_band_pairs

    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [{"doc_id": i, "text": base + f" tail{i % 2}"} for i in range(6)]
    rows += [
        {"doc_id": 100 + i,
         "text": f"completely different content number {i} " * 10}
        for i in range(4)
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = minhash_band_pairs(ds).to_pandas()
    fam = out[(out.doc_a < 100) & (out.doc_b < 100)]
    cross = out[(out.doc_a < 100) != (out.doc_b < 100)]
    assert len(fam) >= 6          # the family is densely connected
    assert len(cross) == 0        # no family/unrelated candidate pairs


def test_simhash_dup_pairs_planted(ray_session):
    """Near-identical docs land within Hamming 3; the exact popcount
    predicate and the a<b orientation are asserted on a planted set."""
    import pandas as pd

    import ray.data

    from deduplidog_ray.pipelines.textdedup import (
        _md5_simhash,
        simhash_dup_pairs,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            * 8)
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                  # exact duplicate
        {"doc_id": 3, "text": "totally unrelated words " * 20},
        {"doc_id": 4, "text": ""},                    # empty: excluded
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = simhash_dup_pairs(ds).to_pandas()
    sh, nonempty = _md5_simhash([r["text"] for r in rows])
    assert not nonempty[3]
    # ground truth from the signature kernel itself: the operator must
    # emit exactly the Hamming <= 3 pairs among non-empty docs
    expect = set()
    live = [i for i in range(4) if nonempty[i]]
    for ii, i in enumerate(live):
        for j in live[ii + 1:]:
            if bin(int(sh[i] ^ sh[j])).count("1") <= 3:
                expect.add((i + 1, j + 1))
    got = {(r.doc_a, r.doc_b) for r in out.itertuples()}
    assert got == expect
    assert (1, 2) in got  # identical text => identical signature
    assert all(a < b for a, b in got)
    x = int(sh[0] ^ sh[1])
    assert out.set_index(["doc_a", "doc_b"]).loc[(1, 2), "hamming"] == bin(
        x
    ).count("1")
