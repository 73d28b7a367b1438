"""Suffix-array exact confirmation of the contained-clip axis (north rule).

The verify kernel's ``contain`` reason is a minhash containment ESTIMATE:
a clip whose shingle SET is mostly inside another's passes even when its
transcript is not a contiguous substring (e.g. a splice of two disjoint
spans). ``match.exact_containment`` confirms every contain pair as an
exact transcript substring via the generalized suffix array
(`stages/suffixes.py`), dropping estimate-only pairs — the suffix-array
substring detection of the shrunk/partial-copy case (docs/index.md:20-22).
"""

import numpy as np
import pyarrow as pa

import ray.data as rd

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm
from deduplidog_ray.config import DedupConfig, MatchConfig
from deduplidog_ray.fixtures import _VOCAB
from deduplidog_ray.oracle import oracle_pairs, pair_recall
from deduplidog_ray.pipelines.dedup import NearDupPipeline


def _clip(cid: str, toks: list, pseed: int, sr: int = 16000) -> dict:
    pcm = make_pcm(pseed, 1200, sr)
    return {
        "clip_id": cid,
        "bytes": encode(pcm, sr, "pcm_s16le"),
        "sr_hz": sr,
        "dur_ms": int(round(len(pcm) * 1000 / sr)),
        "codec": "pcm_s16le",
        "transcript": " ".join(toks),
        "role": "work",
    }


def _table() -> pa.Table:
    toks = list(_VOCAB)  # 40 distinct tokens — collision-free shingles
    rows = [
        _clip("container", toks, 11),
        # true contained sub-clip: contiguous prefix → exact substring
        _clip("true_sub", toks[:20], 22),
        # splice of two DISJOINT spans: shingle set ~91% inside the
        # container (containment estimate >= 0.8) but NOT a substring
        _clip("splice", toks[:12] + toks[24:36], 33),
        # unrelated singleton
        _clip("lonely", ["kappa", "sigma", "omega", "theta", "iota",
                         "rho", "phi", "chi", "psi", "nu", "mu", "xi"], 44),
    ]
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


def _run(table: pa.Table, cfg: DedupConfig):
    pipe = NearDupPipeline(cfg)
    res = pipe.run(rd.from_arrow(table)).to_pandas()
    return pipe, dict(zip(res["clip_id"], res["cluster_id"]))


def test_estimate_mode_accepts_splice(ray_session):
    t = _table()
    pipe, cl = _run(t, DedupConfig())
    # both the true substring AND the splice co-cluster on the estimate
    assert cl["true_sub"] == cl["container"]
    assert cl["splice"] == cl["container"]


def test_exact_mode_drops_splice_keeps_substring(ray_session):
    t = _table()
    cfg = DedupConfig(match=MatchConfig(exact_containment=True))
    pipe, cl = _run(t, cfg)
    assert cl["true_sub"] == cl["container"]
    assert cl["splice"] != cl["container"]      # estimate-only pair dropped
    assert pipe.metrics["contain_pairs_checked"] >= 2
    assert pipe.metrics["contain_pairs_dropped"] >= 1


def test_exact_mode_matches_oracle(ray_session):
    """Pipeline vs exhaustive oracle, both under the exact gate. The
    oracle confirms substrings with plain Python ``in`` — an independent
    implementation from the pipeline's suffix-array kernel."""
    t = _table()
    cfg = DedupConfig(match=MatchConfig(exact_containment=True))
    truth = oracle_pairs(t, cfg)
    keys = set(truth)
    assert ("container", "true_sub") in keys
    assert ("container", "splice") not in keys
    _, cl = _run(t, cfg)
    assert pair_recall(keys, cl) == 1.0
