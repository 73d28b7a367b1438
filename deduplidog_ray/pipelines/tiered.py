"""Tiered dedup cascade: exact → n-gram Jaccard → embedding semantic.

The production shape of corpus dedup (and this graft's namesake): cheap
exact dedup first, then token-level near-dup over the exact survivors,
then semantic (embedding-cosine) near-dup over what remains — each tier
sees ONLY the previous tier's survivors, so the expensive tiers run on
monotonically shrinking input and a document is attributed to the
FIRST (cheapest) tier that catches it. The reference runs the same
escalation per file pair inside ``_are_similar`` (checksum first, then
perceptual hash; /root/reference/deduplidog/deduplidog.py:636-671);
this operator lifts it to whole-corpus scale as three composed engine
stages.

Scale shape
-----------
- Tier 1 is `exact.py`'s hash-partitioned keep-first (one skinny
  shuffle; in-partition TRUE-key equality, collision-safe).
- Removed-id sets are ids-only (8 B/row, bounded by the duplicate
  count, not the corpus); they broadcast once per tier and survivors
  are a streaming ``pc.is_in(..., invert)`` filter — the corpus itself
  is never re-shuffled between tiers.
- Tiers 2/3 are the existing pairs operators (LSH candidates + exact
  verify), so their cost is pairs-bounded; components close over the
  pair stream only (driver DSU here; `components.py`'s distributed
  large-star/small-star rounds are the drop-in upgrade for pair
  streams beyond one process — proven equivalent in
  `embedding_clusters_dist`).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from deduplidog_ray.stages.signatures import SignatureConfig

TIER_EXACT = "exact"
TIER_JACCARD = "jaccard"
TIER_SEMANTIC = "semantic"


def min_label_components(a: np.ndarray, b: np.ndarray):
    """(ids, root) for the undirected graph over int64 pair arrays, where
    root = MIN member id of each component — the same label rule as the
    recursive-CTE oracle and `components.py`. DSU with union-by-min-index
    + path halving; since ``ids`` is sorted, min index ⇔ min id."""
    ids = np.unique(np.concatenate([a, b]))
    pos_a = np.searchsorted(ids, a)
    pos_b = np.searchsorted(ids, b)
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(pos_a)):
        ra, rb = find(pos_a[i]), find(pos_b[i])
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(len(ids))),
                        dtype=np.int64, count=len(ids))
    return ids, ids[roots]


def _removed_exact_partition(
    g: pd.DataFrame, key_cols: list[str], id_col: str
) -> pd.DataFrame:
    """Partition kernel: (doc_id, root) for every NON-min member of each
    true-key duplicate group (the complement of `_keep_first_partition`)."""
    root = g.groupby(key_cols, sort=False, dropna=False)[id_col].transform(
        "min"
    )
    loser = g[id_col] != root
    return pd.DataFrame(
        {id_col: g.loc[loser, id_col].to_numpy(),
         "root": root[loser].to_numpy()}
    )


def _drop_ids(
    ds: ray.data.Dataset, removed: np.ndarray, id_col: str
) -> ray.data.Dataset:
    """Streaming survivor filter: broadcast the (small) removed-id set and
    keep rows NOT in it — no shuffle, corpus order untouched."""
    if len(removed) == 0:
        return ds
    removed_arr = pa.array(np.sort(removed))

    def _keep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=removed_arr)
        return t.filter(pc.invert(mask))

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def _pairs_to_removed(pairs: ray.data.Dataset) -> pd.DataFrame:
    """Collect an (a, b) pair stream and return (doc_id, root) for every
    non-root member of its min-label components."""
    aa, bb = [], []
    for t in pairs.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        aa.append(t["a"].to_numpy(zero_copy_only=False))
        bb.append(t["b"].to_numpy(zero_copy_only=False))
    if not aa:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "root": pd.Series(dtype="int64")})
    ids, root = min_label_components(np.concatenate(aa), np.concatenate(bb))
    loser = ids != root
    return pd.DataFrame({"doc_id": ids[loser], "root": root[loser]})


def tiered_dedup(
    docs: ray.data.Dataset,
    embeddings: ray.data.Dataset,
    exact_key_chars: int = 50,
    jaccard_threshold: float = 0.7,
    cosine_threshold: float = 0.35,
    sig_cfg: SignatureConfig | None = None,
    bands: int = 64,
    bits_per_band: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Run the three-tier cascade; return the REMOVED docs as
    (doc_id, tier, root) — root is the min member of the duplicate
    group that kept its seat, tier names the first (cheapest) tier that
    caught the doc. Kept docs don't appear (output ∝ duplicates).

    ``embeddings`` rows are matched to docs by ``vec_id_col == id_col``
    values; embeddings of docs already removed by tiers 1-2 are filtered
    out BEFORE the semantic tier (ids-only broadcast), so the most
    expensive tier always runs on the smallest survivor set.
    """
    from deduplidog_ray.pipelines.exact import add_key_hash
    from deduplidog_ray.pipelines.similarity import embedding_near_dup_pairs
    from deduplidog_ray.pipelines.textdedup import text_ngram_jaccard_pairs

    # ---- tier 1: exact (prefix-key, true-key equality in-partition) ----
    # skinny: only (id, key) ride the exchange — the kernel reads
    # nothing else, and shipping the text payload would break the
    # module contract that the corpus is never re-shuffled. Null-text
    # docs are quarantined (NULL != NULL; a failed scrape is not an
    # exact duplicate of every other failed scrape).
    def _add_key(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        return t.select([id_col]).append_column(
            "_k", pc.utf8_slice_codeunits(t[text_col], 0, exact_key_chars)
        )

    keyed = add_key_hash(
        docs.map_batches(_add_key, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["_k"],
    )
    t1 = (
        keyed.groupby("_part")
        .map_groups(
            lambda g: _removed_exact_partition(g, ["_k"], id_col),
            batch_format="pandas",
        )
        .to_pandas()
    )
    s1 = _drop_ids(docs, t1[id_col].to_numpy(), id_col)

    # ---- tier 2: token-shingle Jaccard over tier-1 survivors ----
    jac_pairs = text_ngram_jaccard_pairs(
        s1, cfg=sig_cfg, threshold=jaccard_threshold,
        text_col=text_col, id_col=id_col,
    )
    t2 = _pairs_to_removed(jac_pairs)

    # ---- tier 3: embedding cosine over tier-1+2 survivors ----
    removed_so_far = np.concatenate(
        [t1[id_col].to_numpy(), t2["doc_id"].to_numpy()]
    )
    emb_surv = _drop_ids(embeddings, removed_so_far, vec_id_col)
    sem_pairs = embedding_near_dup_pairs(
        emb_surv, threshold=cosine_threshold, bands=bands,
        bits_per_band=bits_per_band, id_col=vec_id_col, vec_col=vec_col,
    ).select_columns(["a", "b"])
    t3 = _pairs_to_removed(sem_pairs)

    out = pd.concat(
        [
            pd.DataFrame({"doc_id": t1[id_col].to_numpy(),
                          "tier": TIER_EXACT,
                          "root": t1["root"].to_numpy()}),
            t2.assign(tier=TIER_JACCARD)[["doc_id", "tier", "root"]],
            t3.assign(tier=TIER_SEMANTIC)[["doc_id", "tier", "root"]],
        ],
        ignore_index=True,
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["root"] = out["root"].astype("int64")
    # resolve chained roots (same rule as tiered_clips_dedup): a tier-1
    # group min can itself fall to a later tier; every tier's root is a
    # group MIN so chains strictly decrease and terminate
    removed_map = dict(zip(out["doc_id"], out["root"]))

    def _resolve(r):
        while r in removed_map:
            r = removed_map[r]
        return r

    out["root"] = np.fromiter(
        (_resolve(r) for r in out["root"]), dtype=np.int64, count=len(out)
    )
    return out.sort_values("doc_id", kind="stable").reset_index(drop=True)


TIER_EXACT_BYTES = "exact_bytes"
TIER_EXACT_PCM = "exact_pcm"
TIER_PERCEPTUAL = "perceptual"
TIER_STRETCH = "stretch"


def _removed_by_key(
    sig: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    partitions: int,
) -> pd.DataFrame:
    """(id, root) for every non-min member of each duplicate group under
    the composite hash key. Skinny: only (id, keys) move through ONE
    hash-partition exchange. Keys here are already 64-bit content hashes
    (+ exact lengths), so in-partition equality is on the true composite
    key; a full-key collision between distinct payloads is ~2⁻⁶⁴·n² —
    the decontam.py-documented asymmetry (ADVICE r2 #4) applies: at
    dedup, a false merge drops one good row, it does not corrupt output.
    """

    def _part(t: pa.Table) -> pa.Table:
        h = t[key_cols[0]].to_numpy().view(np.uint64).copy()
        for c in key_cols[1:]:
            h ^= (t[c].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        part = (h % np.uint64(partitions)).astype(np.int64)
        return t.select([id_col, *key_cols]).append_column(
            "_part", pa.array(part)
        )

    out = (
        sig.map_batches(_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda g: _removed_exact_partition(
                g.drop(columns=["_part"]), key_cols, id_col
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if out.empty:                      # no duplicate group in any partition
        return pd.DataFrame({id_col: pd.Series(dtype=object),
                             "root": pd.Series(dtype=object)})
    return out


def tiered_clips_dedup(
    clips: ray.data.Dataset,
    embed_threshold: float = 0.99,
    partitions: int = 32,
    id_col: str = "clip_id",
    with_stretch: bool = False,
    stretch_kwargs: dict | None = None,
) -> pd.DataFrame:
    """The tiered cascade over the AUDIO table — the graft's namesake on
    the payload axis: exact bytes → exact decoded PCM (container/codec-
    invariant) → perceptual (spectral-embedding cosine), each tier over
    ONLY the previous tier's survivors. Returns removed clips as
    (clip_id, tier, root); root is the lexicographic-min member that
    kept its seat (the library's deterministic keep-first rule; the
    flagship's role-aware canonicalization is the full-pipeline variant).

    One decode pass serves both exact tiers: `DecodeFingerprint`
    (stages/decode.py — the flagship's actor-pool stage) computes
    content_hash, pcm_hash, n_frames once; `bytes` never re-ships.
    The perceptual tier re-reads payloads for survivors only (the
    embedder needs PCM, and survivors shrink monotonically).

    ≙ the reference's per-pair escalation checksum → perceptual hash
    (deduplidog/deduplidog.py:707-767) lifted to whole-corpus tiers.

    ``with_stretch=True`` appends a FOURTH tier over the tier-1..3
    survivors: the time-scale-invariant quad fingerprint
    (`audiostretch.stretch_dup_pairs`), catching speed-changed copies
    whose spectral embedding falls below ``embed_threshold``. Off by
    default: constellation hashing needs time-varying spectra, and the
    standard synthetic corpus is near-stationary tones (its documented
    degenerate case) — enable it on real or textured audio.
    """
    from deduplidog_ray.pipelines.similarity import embedded_near_dup
    from deduplidog_ray.stages.decode import DecodeFingerprint

    # pool floor scales with the session: a (1, N) pool ramps one actor
    # at a time, which dominates a stage this short (same measurement as
    # stages/embed.py:embed_clips). with_embedding=True fuses the
    # perceptual tier's spectral vectors into the SAME decode pass —
    # one decode serves all three tiers (the old shape re-decoded the
    # survivors for tier 3: measured 14.8 s → the fused pass removes the
    # whole second decode at sf0.1/32cpu)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    sig = clips.map_batches(
        DecodeFingerprint,
        fn_constructor_kwargs={"with_embedding": True},
        concurrency=(max(1, min(16, cpus // 2)), 16),
        batch_size=64,
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(
        [id_col, "content_hash", "n_bytes", "pcm_hash", "n_frames",
         "dur_ms_actual", "decode_error", "embedding", "embed_error"]
    ).materialize()   # skinny (hashes + a 64-f32 vector), 3 tiers read it

    # ---- tier 1: identical encoded bytes ----
    # payload-less rows (null/empty bytes → n_bytes == 0) never merge:
    # there is no payload to be equal, and null buffers all hash to the
    # same sentinel — quarantine them from tier 1 like decode errors
    # are quarantined from tier 2
    def _has_payload(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n_bytes"], 0))

    t1 = _removed_by_key(
        sig.map_batches(_has_payload, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["content_hash", "n_bytes"], id_col, partitions,
    )

    # ---- tier 2: identical decoded PCM (different container/codec) ----
    # poison rows all carry pcm_hash == 0: quarantine them from the
    # decoded-PCM tier (they were still eligible for tier 1, where
    # byte-identical undecodable payloads ARE true duplicates).
    # dur_ms_actual joins the key because pcm_hash covers only the int16
    # samples and n_frames saturates: the SAME sample array labeled with
    # a different rate is different audio (half-speed pitch shift), and
    # the decoded duration is the rate-aware discriminator.
    def _decoded_ok(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["decode_error"]))

    s1 = _drop_ids(
        sig.map_batches(_decoded_ok, batch_format="pyarrow",
                        zero_copy_batch=True),
        t1[id_col].to_numpy(), id_col,
    )
    t2 = _removed_by_key(
        s1, ["pcm_hash", "n_frames", "dur_ms_actual"], id_col, partitions
    )

    # ---- tier 3: perceptual (spectral embedding cosine) ----
    # vectors come from the fused decode pass — survivors are a
    # streaming filter over the materialized sig table, no re-decode
    removed_so_far = np.concatenate(
        [t1[id_col].to_numpy(), t2[id_col].to_numpy()]
    )
    surv_emb = _drop_ids(
        sig.select_columns([id_col, "embedding", "embed_error"]),
        removed_so_far, id_col,
    )
    pairs = embedded_near_dup(
        surv_emb, threshold=embed_threshold, id_col=id_col
    )
    if len(pairs):
        ids, root = min_label_components(
            pairs["clip_a"].to_numpy(), pairs["clip_b"].to_numpy()
        )
        loser = ids != root
        t3 = pd.DataFrame({id_col: ids[loser], "root": root[loser]})
    else:
        t3 = pd.DataFrame({id_col: pd.Series(dtype=object),
                           "root": pd.Series(dtype=object)})

    tiers = [
        t1.assign(tier=TIER_EXACT_BYTES),
        t2.assign(tier=TIER_EXACT_PCM),
        t3.assign(tier=TIER_PERCEPTUAL),
    ]

    # ---- tier 4 (opt-in): time-scale-invariant quad fingerprint ----
    # needs STFT peaks, not the fused decode's hashes/embeddings, so it
    # re-reads payloads — for the tier-1..3 SURVIVORS only (shrinking
    # input, the cascade contract)
    if with_stretch:
        from deduplidog_ray.pipelines.audiostretch import stretch_dup_pairs

        removed_all = np.concatenate([
            t1[id_col].to_numpy(), t2[id_col].to_numpy(),
            t3[id_col].to_numpy(),
        ])
        surv_clips = _drop_ids(clips, removed_all, id_col)
        spairs = stretch_dup_pairs(
            surv_clips, partitions=partitions, id_col=id_col,
            **(stretch_kwargs or {}),
        )
        if len(spairs):
            ids4, root4 = min_label_components(
                spairs["clip_a"].to_numpy(), spairs["clip_b"].to_numpy()
            )
            loser4 = ids4 != root4
            tiers.append(pd.DataFrame({
                id_col: ids4[loser4], "root": root4[loser4],
            }).assign(tier=TIER_STRETCH))

    out = pd.concat(tiers, ignore_index=True)[[id_col, "tier", "root"]]
    # resolve chained roots: tier 1's group min can itself fall to a
    # later tier (its rewrap/re-encode had a smaller id), which would
    # leave removed rows pointing at a removed root. Every tier's root
    # is its group MIN, so chains strictly decrease and terminate; path-
    # compress so each reported root genuinely kept its seat.
    removed_map = dict(zip(out[id_col], out["root"]))

    def _resolve(r):
        while r in removed_map:
            r = removed_map[r]
        return r

    out["root"] = [_resolve(r) for r in out["root"]]
    return out.sort_values(id_col, kind="stable").reset_index(drop=True)
