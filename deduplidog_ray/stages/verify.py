"""Pair verification — the vectorized "compare kernel".

≙ the reference match predicates P1-P5 (SURVEY.md §2.5):
  - content_hash equality       ≙ CRC equality (deduplidog/deduplidog.py:714)
  - pcm_hash equality           ≙ same content, different container
  - MinHash-Jaccard >= t        ≙ the stem-equality candidate confirm, fuzzy
  - SimHash Hamming <= k        ≙ ``accepted_img_hash_diff`` (:758-760)
  - fingerprint Hamming <= f    ≙ image-hash similarity gate (helpers.py:43-53)
  - |dur_a - dur_b| <= d        ≙ ``accepted_frame_delta`` (:728-729)
  - containment estimate >= c   ≙ shrunk/partial-copy case (docs/index.md:20-22)

A pair is confirmed iff (same codec class) and any of:
  exact:   content_hash equal
  pcm:     pcm_hash equal                        and dur gate
  near:    transcript axis (J >= t or Hamming <= k or normalized-equal) and
           audio axis (fp Hamming <= f)          and dur gate
  contain: containment >= c (transcript axis only; dur gate waived — the
           contained clip is by definition shorter)

mirroring the reference's "name axis AND content axis" conjunction
(_process_file → _find_similar(_media), deduplidog.py:462-519, :707-735).
``ignore_transcript`` ≙ ``ignore_name`` (:109-110) drops the transcript
conjunct; ``ignore_duration`` ≙ ``ignore_date``.

All comparisons are blockwise numpy matrix kernels — the same code path
serves the per-group verifier (pipeline) and the exhaustive oracle
(deduplidog_ray/oracle.py), which is what makes the recall comparison a
measurement of LSH candidate loss, not of predicate drift.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplidog_ray.audio.fingerprint import FP_BYTES
from deduplidog_ray.config import DedupConfig

REASONS = ["exact", "pcm", "jaccard", "simhash", "contain"]
_R_EXACT, _R_PCM, _R_JACCARD, _R_SIMHASH, _R_CONTAIN = range(5)

PAIRS_EMPTY = pa.table(
    {
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string()),
        "reason": pa.array([], type=pa.string()),
        "score": pa.array([], type=pa.float32()),
    }
)


def payload_from_table(t: pa.Table, num_perm: int) -> dict[str, np.ndarray]:
    """Columnar payload → dict of numpy arrays for the matrix kernels."""
    n = len(t)
    mh = t["minhash"].to_pylist()
    fp = t["fp"].to_pylist()
    return {
        "clip_id": np.asarray(t["clip_id"].to_pylist(), dtype=object),
        "codec_class": np.asarray(t["codec_class"].to_pylist(), dtype=object),
        "dur_ms": t["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64),
        "n_bytes": t["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64),
        "content_hash": t["content_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
        "pcm_hash": t["pcm_hash"].to_numpy(zero_copy_only=False).view(np.uint64),
        "simhash": t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64),
        "n_shingles": t["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64),
        "n_frames": t["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64),
        "minhash": np.frombuffer(b"".join(mh), dtype="<u4").reshape(n, num_perm),
        "fp_bits": np.unpackbits(
            np.frombuffer(b"".join(fp), dtype=np.uint8).reshape(n, FP_BYTES), axis=1
        ).astype(np.int32),
    }


def confirm_block(
    A: dict[str, np.ndarray], B: dict[str, np.ndarray], cfg: DedupConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cross-verify all pairs of two payload blocks.

    Returns (dup bool (nA,nB), reason int8, score float32).
    """
    m, s = cfg.match, cfg.signature
    nA, nB = len(A["dur_ms"]), len(B["dur_ms"])

    same_class = A["codec_class"][:, None] == B["codec_class"][None, :]

    dur_ok = (
        np.ones((nA, nB), dtype=bool)
        if m.ignore_duration
        else np.abs(A["dur_ms"][:, None] - B["dur_ms"][None, :]) <= m.dur_delta_ms
    )

    exact = A["content_hash"][:, None] == B["content_hash"][None, :]
    pcm = A["pcm_hash"][:, None] == B["pcm_hash"][None, :]

    # MinHash Jaccard estimate
    jac = (A["minhash"][:, None, :] == B["minhash"][None, :, :]).mean(axis=2)

    # SimHash Hamming
    x = A["simhash"][:, None] ^ B["simhash"][None, :]
    sh_ham = np.unpackbits(x.view(np.uint8).reshape(nA, nB, 8), axis=2).sum(
        axis=2, dtype=np.int32
    )

    # fingerprint Hamming via matmul
    sa = A["fp_bits"].sum(axis=1)
    sb = B["fp_bits"].sum(axis=1)
    fp_ham = sa[:, None] + sb[None, :] - 2 * (A["fp_bits"] @ B["fp_bits"].T)

    transcript_ok = (
        np.ones((nA, nB), dtype=bool)
        if m.ignore_transcript
        else (jac >= s.jaccard_threshold) | (sh_ham <= s.simhash_hamming)
    )
    # fractional threshold over the pair's common active frames
    # (audio/fingerprint.py docstring: zero tails contribute ~nothing)
    common_bits = 16 * np.minimum(A["n_frames"][:, None], B["n_frames"][None, :])
    audio_ok = fp_ham <= m.fp_hamming_frac * np.maximum(common_bits, 1)

    # containment estimate from Jaccard + set sizes:
    # |A∩B|/min ≈ J*(|A|+|B|) / ((1+J)*min)
    na = A["n_shingles"][:, None].astype(np.float64)
    nb = B["n_shingles"][None, :].astype(np.float64)
    mn = np.minimum(na, nb)
    with np.errstate(divide="ignore", invalid="ignore"):
        containment = np.where(mn > 0, jac * (na + nb) / ((1.0 + jac) * mn), 0.0)
    # require a real size asymmetry and enough shingles to trust the estimate
    contain_ok = (
        (containment >= s.containment_threshold)
        & (mn >= s.winnow_window)
        & (jac < s.jaccard_threshold)          # plain near-dup handled above
    )

    dup = same_class & (
        exact
        | (pcm & dur_ok)
        | (transcript_ok & audio_ok & dur_ok)
        | contain_ok
    )

    reason = np.full((nA, nB), -1, dtype=np.int8)
    score = np.zeros((nA, nB), dtype=np.float32)
    near = transcript_ok & audio_ok & dur_ok
    reason[same_class & contain_ok] = _R_CONTAIN
    score[same_class & contain_ok] = containment[same_class & contain_ok]
    sim_m = same_class & near & (sh_ham <= s.simhash_hamming)
    reason[sim_m] = _R_SIMHASH
    score[sim_m] = (64 - sh_ham[sim_m]) / 64.0
    jac_m = same_class & near & (jac >= s.jaccard_threshold)
    reason[jac_m] = _R_JACCARD
    score[jac_m] = jac[jac_m]
    pcm_m = same_class & pcm & dur_ok
    reason[pcm_m] = _R_PCM
    score[pcm_m] = 1.0
    ex_m = same_class & exact
    reason[ex_m] = _R_EXACT
    score[ex_m] = 1.0
    return dup, reason, score


def _pairs_table(
    ids: np.ndarray, ii: np.ndarray, jj: np.ndarray,
    reason: np.ndarray, score: np.ndarray,
) -> pa.Table:
    a = ids[ii]
    b = ids[jj]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pa.table(
        {
            "a": pa.array(a2.tolist(), type=pa.string()),
            "b": pa.array(b2.tolist(), type=pa.string()),
            "reason": pa.array([REASONS[r] for r in reason], type=pa.string()),
            "score": pa.array(score, type=pa.float32()),
        }
    )


def verify_group_table(
    group: pa.Table, cfg: DedupConfig, star_over: int | None = None
) -> pa.Table:
    """Verify one candidate group (already co-located by the shuffle).

    Group rows are sorted by clip_id (determinism); duplicate clip_id rows
    (a clip reaching the same group via two key types) are dropped first.
    ``star_over``: if set and the group exceeds it, verify members only
    against the first ``min(3, n)`` representatives instead of all pairs —
    the oversized-group guard (union-find only needs connectivity).
    """
    ids_all = np.asarray(group["clip_id"].to_pylist(), dtype=object)
    order = np.argsort(ids_all, kind="stable")
    _, first = np.unique(ids_all[order], return_index=True)
    sel = order[first]
    if len(sel) < 2:
        return PAIRS_EMPTY
    g = group.take(pa.array(np.sort(sel)))
    # re-sort by clip_id after take
    g = g.take(pa.array(np.argsort(np.asarray(g["clip_id"].to_pylist(), dtype=object))))
    P = payload_from_table(g, cfg.signature.num_perm)
    ids = P["clip_id"]
    n = len(ids)

    if star_over is not None and n > star_over:
        nrep = min(3, n)
        A = {k: v[:nrep] for k, v in P.items()}
        dup, reason, score = confirm_block(A, P, cfg)
        ii, jj = np.nonzero(dup)
        keep = ii != jj
        ii, jj = ii[keep], jj[keep]
        return _pairs_table(ids, ii, jj, reason[dup][keep], score[dup][keep])

    dup, reason, score = confirm_block(P, P, cfg)
    iu = np.triu_indices(n, k=1)
    mask = dup[iu]
    ii, jj = iu[0][mask], iu[1][mask]
    return _pairs_table(ids, ii, jj, reason[iu][mask], score[iu][mask])


def make_group_verifier(cfg: DedupConfig):
    """map_groups(batch_format='pyarrow') callable for the band shuffle.

    Output rows are either verified pairs (row_type='pair') or, for salted
    hot-key subgroups, one representative payload row (row_type='rep') that
    feeds the second-round groupby on ``orig_key`` (stages/candidates.py).
    """
    cap = cfg.execution.hot_band_cap

    def _verify(group: pa.Table) -> pa.Table:
        pairs = verify_group_table(group, cfg, star_over=cap * 2)
        out = {
            "row_type": ["pair"] * len(pairs),
            "a": pairs["a"].to_pylist(),
            "b": pairs["b"].to_pylist(),
            "reason": pairs["reason"].to_pylist(),
            "score": pairs["score"].to_pylist(),
        }
        rep_cols: dict[str, list] = {c: [] for c in group.column_names}
        if len(group) and group["salted"][0].as_py():
            # representative = min clip_id (deterministic)
            ids = np.asarray(group["clip_id"].to_pylist(), dtype=object)
            r = int(np.argmin(ids))
            for c in group.column_names:
                rep_cols[c].append(group[c][r].as_py())
            out["row_type"].append("rep")
            out["a"].append(None)
            out["b"].append(None)
            out["reason"].append(None)
            out["score"].append(None)
        n_out = len(out["row_type"])
        for c in group.column_names:
            if c in ("a", "b"):
                continue
            vals = rep_cols[c]
            pad = [None] * (n_out - len(vals))
            out[c] = pad + vals if len(vals) else [None] * n_out
        schema_cols = {}
        for name, values in out.items():
            if name in group.column_names:
                schema_cols[name] = pa.array(values, type=group.schema.field(name).type)
            elif name == "score":
                schema_cols[name] = pa.array(values, type=pa.float32())
            else:
                schema_cols[name] = pa.array(values, type=pa.string())
        return pa.table(schema_cols)

    return _verify


def make_rep_verifier(cfg: DedupConfig):
    """Second-round map_groups over representative rows grouped by orig_key."""

    def _verify(group: pa.Table) -> pa.Table:
        return verify_group_table(group, cfg, star_over=cfg.execution.hot_band_cap)

    return _verify
