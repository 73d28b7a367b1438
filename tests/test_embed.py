"""TextEmbedder (model-in-actor embedding stage) gates.

1. Bit-determinism: embeddings are identical regardless of batch size,
   partition layout, or actor count — the layout-invariance rule every
   deterministic operator in this engine follows.
2. End-to-end parity: text → embed → embedding_near_dup_pairs equals a
   brute-force cosine scan over the stage's own vectors.
"""

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.stages.embed import TextEmbedder, embed_texts


def _corpus(n_random=120):
    rng = np.random.default_rng(5)
    vocab = [f"word{i}" for i in range(300)]
    ids, texts = [], []
    for i in range(n_random):
        ids.append(i)
        texts.append(" ".join(rng.choice(vocab, size=30).tolist()))
    # planted duplicate families: identical and one-token-edited copies
    for k in range(10):
        base = texts[k].split()
        ids.append(1000 + k)
        texts.append(texts[k])                     # identical → cos 1.0
        edited = list(base)
        edited[3] = "EDITED"
        ids.append(2000 + k)
        texts.append(" ".join(edited))             # near-identical
    ids.append(9000)
    texts.append("")                               # empty → zero vector
    ids.append(9001)
    texts.append(None)                             # null text
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )


def _emb_matrix(df):
    return np.stack(df.sort_values("doc_id")["embedding"].to_numpy())


def test_embedding_batch_layout_invariance(ray_session):
    t = _corpus()
    a = _emb_matrix(embed_texts(rd.from_arrow(t), batch_size=7).to_pandas())
    b = _emb_matrix(
        embed_texts(
            rd.from_arrow(t).repartition(9), batch_size=256
        ).to_pandas()
    )
    # whole-table single batch through the bare stage
    c = np.stack(
        TextEmbedder()(t)
        .to_pandas()
        .sort_values("doc_id")["embedding"]
        .to_numpy()
    )
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)
    norms = np.linalg.norm(a, axis=1)
    assert np.all((np.abs(norms - 1.0) < 1e-6) | (norms == 0.0))
    # empty and null texts → exactly the zero vector
    assert norms[-2] == 0.0 and norms[-1] == 0.0


def test_text_to_neardup_end_to_end(ray_session):
    from deduplidog_ray.pipelines.similarity import embedding_near_dup_pairs

    t = _corpus()
    thr = 0.95
    pairs = (
        embedding_near_dup_pairs(
            embed_texts(rd.from_arrow(t)).select_columns(
                ["doc_id", "embedding"]
            ),
            threshold=thr,
            bands=24,
            bits_per_band=12,  # the correlated-embedding geometry the
            id_col="doc_id",   # driver query uses (see __ray_entry__)
        )
        .to_pandas()
    )
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    # brute force over the stage's own vectors (float64 cosine)
    df = TextEmbedder()(t).to_pandas().sort_values("doc_id")
    ids = df["doc_id"].to_numpy()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    nz = np.linalg.norm(M, axis=1)
    Mn = M / np.where(nz == 0, 1.0, nz)[:, None]
    cos = Mn @ Mn.T
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cos[i, j] >= thr
    }
    # the 10 identical-copy pairs are all present
    assert {(k, 1000 + k) for k in range(10)} <= want
    assert got == want


# ---------------------------------------------------------------------------
# AudioEmbedder: real spectral features
# ---------------------------------------------------------------------------

def _clip_rows():
    from deduplidog_ray.audio.codecs import encode
    from deduplidog_ray.audio.synth import make_pcm
    from deduplidog_ray.pipelines.audiotransform import fft_resample

    rows = []
    for i in range(12):
        pcm = make_pcm(seed=i, dur_ms=800, sr_hz=8000)
        rows.append({"clip_id": f"c{i}", "bytes": encode(pcm, 8000, "pcm_s16le"),
                     "sr_hz": 8000, "codec": "pcm_s16le"})
    # planted semantic dups: ulaw re-encode of c0, 16 kHz reship of c1
    pcm0 = make_pcm(seed=0, dur_ms=800, sr_hz=8000)
    rows.append({"clip_id": "c0_ulaw", "bytes": encode(pcm0, 8000, "ulaw"),
                 "sr_hz": 8000, "codec": "ulaw"})
    pcm1 = make_pcm(seed=1, dur_ms=800, sr_hz=8000)
    up = fft_resample(np.asarray(pcm1, np.float64), 8000, 16000)
    rows.append({"clip_id": "c1_16k",
                 "bytes": encode(np.clip(up, -1, 1).astype(np.float32),
                                 16000, "pcm_s16le"),
                 "sr_hz": 16000, "codec": "pcm_s16le"})
    rows.append({"clip_id": "poison", "bytes": b"", "sr_hz": 8000,
                 "codec": "pcm_s16le"})
    return rows


def test_audio_embedder_invariances(ray_session):
    import ray.data as rd

    from deduplidog_ray.stages.embed import embed_clips

    t = pa.Table.from_pylist(_clip_rows())
    out = embed_clips(rd.from_arrow(t), batch_size=4).to_pandas()
    out = out.set_index("clip_id")
    V = {k: np.asarray(v, np.float64) for k, v in out["embedding"].items()}
    # unit norm
    for k, v in V.items():
        if k != "poison":
            assert abs(np.linalg.norm(v) - 1) < 1e-5
    # codec invariance: ulaw re-encode lands on the same vector
    assert V["c0"] @ V["c0_ulaw"] > 0.999
    # sample-rate invariance: 16 kHz reship of the same content
    assert V["c1"] @ V["c1_16k"] > 0.999
    # distinct clips stay separated
    ids = [f"c{i}" for i in range(12)]
    M = np.stack([V[i] for i in ids])
    off = (M @ M.T)[np.triu_indices(12, 1)]
    assert off.max() < 0.99
    # poison row: error annotated, zero vector
    assert out.loc["poison", "embed_error"]
    assert np.allclose(V["poison"], 0)
    # batch-layout invariance
    out2 = embed_clips(
        rd.from_arrow(t).repartition(7), batch_size=2
    ).to_pandas().set_index("clip_id")
    for k in V:
        assert np.allclose(
            np.asarray(out2.loc[k, "embedding"], np.float64), V[k]
        )


def test_audio_embedding_near_dup_finds_planted_pairs(ray_session):
    import ray.data as rd

    from deduplidog_ray.pipelines.similarity import audio_embedding_near_dup

    t = pa.Table.from_pylist(_clip_rows())
    got = audio_embedding_near_dup(rd.from_arrow(t), threshold=0.99)
    pairs = set(zip(got["clip_a"], got["clip_b"]))
    assert ("c0", "c0_ulaw") in pairs
    assert ("c1", "c1_16k") in pairs
    # nothing else crosses 0.99 in this corpus
    assert pairs == {("c0", "c0_ulaw"), ("c1", "c1_16k")}
    assert (got["cos"] >= 0.99).all()
