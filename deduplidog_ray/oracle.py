"""Single-process exhaustive oracle — the reference-semantics ground truth.

≙ the reference's sequential main loop (deduplidog/deduplidog.py:433-519):
every work file compared against every candidate with the P1-P4 predicates.
The oracle runs the SAME predicate kernel (stages/verify.py:confirm_block)
over ALL O(n²) pairs — no LSH candidate generation, no Ray, no shuffle —
at the identical shingle/signature config.

Recall of the distributed pipeline vs ``oracle_pairs`` therefore measures
exactly the candidate-generation loss (LSH banding + salting), which is the
north-rule metric: dup-pair recall >= 0.99 at identical config.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplidog_ray.audio.codecs import CODEC_CLASS, CodecError, decode
from deduplidog_ray.audio.fingerprint import FP_BYTES, fingerprint
from deduplidog_ray.config import DedupConfig
from deduplidog_ray.stages.hashing import hash_binary_u64, hash_pcm_u64
from deduplidog_ray.stages.normalize import normalize_array
from deduplidog_ray.stages.signatures import (
    minhash_signatures,
    shingle_hashes,
    simhash_signatures,
)
from deduplidog_ray.stages.verify import REASONS, confirm_block
from deduplidog_ray.state.unionfind import UnionFind


def oracle_payload(table: pa.Table, cfg: DedupConfig) -> dict[str, np.ndarray]:
    """Decode + sign every row single-process (same kernels, no Ray)."""
    n = len(table)
    byts = [v.as_py() if v.is_valid else None for v in table["bytes"]]
    codecs = table["codec"].to_pylist()
    srs = table["sr_hz"].to_pylist()

    pcm_hash = np.zeros(n, dtype=np.uint64)
    dur = np.zeros(n, dtype=np.int64)
    fps = np.zeros((n, FP_BYTES), dtype=np.uint8)
    n_frames = np.zeros(n, dtype=np.int64)
    err = np.zeros(n, dtype=bool)
    for i in range(n):
        try:
            if not byts[i]:
                raise CodecError("empty")
            pcm, sr = decode(byts[i], codecs[i])
            sr = sr or srs[i]
            pcm_hash[i] = hash_pcm_u64(pcm)
            dur[i] = int(round(len(pcm) * 1000 / max(1, sr)))
            fp_b, n_frames[i] = fingerprint(pcm, sr)
            fps[i] = np.frombuffer(fp_b, dtype=np.uint8)
        except CodecError:
            err[i] = True

    texts = normalize_array(table["transcript"], cfg.normalize).to_pylist()
    flat, off = shingle_hashes(texts, cfg.signature.shingle_k, cfg.signature.seed)
    sig = minhash_signatures(flat, off, cfg.signature)
    sh = simhash_signatures(flat, off)
    norm_text = np.asarray([t or "" for t in texts], dtype=object)

    created = (
        np.asarray(table["created_ms"].to_pylist(), dtype=np.int64)
        if "created_ms" in table.column_names
        else np.zeros(n, dtype=np.int64)
    )
    return {
        "clip_id": np.asarray(table["clip_id"].to_pylist(), dtype=object),
        "norm_text": norm_text,
        "created_ms": created,
        "codec_class": np.asarray(
            [CODEC_CLASS.get(cc, "unknown") for cc in codecs], dtype=object
        ),
        "dur_ms": dur,
        "n_bytes": np.array([len(b) if b else 0 for b in byts], dtype=np.int64),
        "content_hash": hash_binary_u64(byts),
        "pcm_hash": pcm_hash,
        "simhash": sh,
        "n_shingles": (off[1:] - off[:-1]).astype(np.int64),
        "n_frames": n_frames,
        "minhash": sig,
        "fp_packed": fps,
        "decode_error": err,
    }


def oracle_pairs(
    table: pa.Table, cfg: DedupConfig, block: int = 512
) -> dict[tuple[str, str], str]:
    """All confirmed duplicate pairs {(a,b): reason} with a < b, exhaustively."""
    P = oracle_payload(table, cfg)
    ok = ~P["decode_error"]
    idx = np.nonzero(ok)[0]
    sub = {k: v[idx] for k, v in P.items() if k != "decode_error"}
    n = len(idx)
    out: dict[tuple[str, str], str] = {}
    for i0 in range(0, n, block):
        A = {k: v[i0 : i0 + block] for k, v in sub.items()}
        for j0 in range(i0, n, block):
            B = {k: v[j0 : j0 + block] for k, v in sub.items()}
            dup, reason, _ = confirm_block(A, B, cfg)
            ii, jj = np.nonzero(dup)
            for a_i, b_j in zip(ii, jj):
                gi, gj = i0 + a_i, j0 + b_j
                if gi >= gj:
                    continue
                a, b = sub["clip_id"][gi], sub["clip_id"][gj]
                if (
                    cfg.match.exact_containment
                    and REASONS[reason[a_i, b_j]] == "contain"
                ):
                    # exact-containment gate, independently of the
                    # pipeline's suffix-array kernel: plain Python `in`
                    ta, tb = sub["norm_text"][gi], sub["norm_text"][gj]
                    if not (ta in tb or tb in ta):
                        continue
                key = (a, b) if a < b else (b, a)
                out[key] = REASONS[reason[a_i, b_j]]
    return out


def oracle_clusters(pairs: dict[tuple[str, str], str]) -> dict[str, str]:
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return uf.components()


def pair_recall(
    truth: set[tuple[str, str]], clusters: dict[str, str]
) -> float:
    """Fraction of oracle pairs co-clustered by the pipeline (north metric)."""
    if not truth:
        return 1.0
    hit = sum(
        1
        for a, b in truth
        if clusters.get(a) is not None and clusters.get(a) == clusters.get(b)
    )
    return hit / len(truth)
