"""snippet_search: query-by-example audio retrieval — planted crops
found at frame-accurate offsets, unrelated queries rejected, corpus
pairs never leak into the result."""

import numpy as np
import pandas as pd

import ray.data as rd

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm_textured
from deduplidog_ray.pipelines.audiofp import snippet_search

SR = 8000


def _clip(cid: str, pcm: np.ndarray) -> dict:
    return {
        "clip_id": cid, "bytes": encode(pcm.astype(np.float32), SR,
                                        "pcm_s16le"),
        "sr_hz": SR, "dur_ms": int(1000 * len(pcm) / SR),
        "codec": "pcm_s16le",
    }


def test_planted_snippets_found_with_offsets(ray_session):
    corpus_pcm = {f"c{i}": make_pcm_textured(100 + i, 2500, SR)
                  for i in range(8)}
    corpus = rd.from_pandas(pd.DataFrame(
        [_clip(cid, p) for cid, p in corpus_pcm.items()]
    ))
    # snippets: 900 ms crops with known starts, plus one unrelated query
    crops = {"q_a": ("c2", 800), "q_b": ("c5", 400)}
    qrows = []
    for qid, (src, start_ms) in crops.items():
        s = SR * start_ms // 1000
        qrows.append(_clip(qid, corpus_pcm[src][s: s + SR * 9 // 10]))
    qrows.append(_clip("q_none", make_pcm_textured(999, 900, SR)))
    queries = rd.from_pandas(pd.DataFrame(qrows))

    out = snippet_search(corpus, queries, top_k=3)
    assert set(out.columns) == {"query_id", "clip_id", "offset_ms",
                                "votes", "rank"}
    top = out[out["rank"] == 1].set_index("query_id")
    for qid, (src, start_ms) in crops.items():
        assert top.loc[qid, "clip_id"] == src, (qid, dict(top["clip_id"]))
        assert abs(int(top.loc[qid, "offset_ms"]) - start_ms) <= 32
    assert "q_none" not in set(out["query_id"])
    # no corpus-corpus or query-query rows can appear by construction
    assert set(out["clip_id"]) <= set(corpus_pcm)


def test_empty_query_table(ray_session):
    corpus = rd.from_pandas(pd.DataFrame(
        [_clip("c0", make_pcm_textured(1, 1500, SR))]
    ))
    queries = rd.from_pandas(pd.DataFrame(
        [_clip("q0", make_pcm_textured(2, 900, SR))]
    ))
    out = snippet_search(corpus, queries)
    assert len(out) == 0
