"""Cross-axis consistency checks: does a clip's METADATA agree with its
CONTENT axes? The speech-rate check flags clips whose transcript length
is implausible for their audio duration (tokens/second far from the
corpus norm for that sample rate) — the cheapest mislabel detector a
speech corpus has, and it never decodes a byte.

≙ the reference's cross-axis warnings: `_affect`'s DATE WARNING
(deduplidog.py:554-559 — "the 'duplicate' is older than the 'original',
axes disagree, flag it") and the frame-count probe (utils.py:96-102 —
content-derived duration cross-checked against the pair predicate),
re-expressed as a corpus-level operator: compare each row's rate to its
GROUP's median instead of a pairwise partner.

SCALE SHAPE: one streaming pass computes (n_tok, rate) per clip with
Arrow C++ kernels (columns pruned at the read — transcript + duration
only, never ``bytes``); per-sample-rate medians come from the
hash-partitioned `stats.group_quantiles` exchange (|groups| = distinct
sample rates, a handful); the medians broadcast back into a second
streaming pass. Nothing concentrates beyond the |sr| median table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from deduplidog_ray.pipelines.stats import group_quantiles


def _add_rate(t: pa.Table) -> pa.Table:
    """n_tok (single-space-joined transcript ⇒ spaces + 1, 0 if empty)
    and rate_tps = n_tok · 1000 / dur_ms, both pure Arrow kernels."""
    tr = t["transcript"]
    nsp = pc.count_substring(tr, " ")
    nonempty = pc.cast(
        pc.not_equal(pc.coalesce(pc.utf8_length(tr), 0), 0), pa.int64()
    )
    n_tok = pc.add(pc.cast(pc.coalesce(nsp, 0), pa.int64()), nonempty)
    dur = t["dur_ms"].to_numpy(zero_copy_only=False).astype(np.float64)
    rate = n_tok.to_numpy(zero_copy_only=False) * 1000.0 / np.maximum(
        dur, 1.0
    )
    t = t.append_column("n_tok", n_tok)
    return t.append_column("rate_tps", pa.array(rate))


def transcript_conflicts(
    clips: ray.data.Dataset,
    id_col: str = "clip_id",
    transcript_col: str = "transcript",
    partitions: int = 32,
) -> ray.data.Dataset:
    """Groups of clips that share an IDENTICAL transcript but carry
    DIFFERENT decoded audio — same text, different payload: lossy
    re-encodes masquerading as originals, re-records, label noise.
    The dual of dedup: dedup finds same-content-different-name, this
    finds same-name-different-content (≙ the reference's SIZE WARNING,
    deduplidog.py:536-538 — "the claimed duplicate's payload disagrees
    with its match axes, warn").

    One decode pass (container-invariant ``pcm_hash``), one exchange
    keyed by the transcript hash; groups compare TRUE transcript
    strings in-partition (the `pipelines/exact.py` 64-bit-collision
    rule), and payload identity is the FULL DecodeFingerprint tuple
    (pcm_hash, n_frames, dur_ms_actual) — the same exact-identity key
    `exact.py` / `clips_corpus_prep` use, so a 64-bit pcm_hash
    collision inside a group cannot silently merge two distinct
    payloads and suppress a real conflict. Undecodable rows are
    excluded (their payload identity is unknown, not conflicting).
    Output: (group_id = min clip id, n_clips, n_audio) for groups with
    ≥ 2 distinct decoded payloads.
    """
    import pandas as pd

    from deduplidog_ray.stages.decode import DecodeFingerprint
    from deduplidog_ray.stages.hashing import hash_arrow_u64

    sigs = clips.map_batches(
        DecodeFingerprint,
        batch_format="pyarrow",
        batch_size=256,
        zero_copy_batch=True,
        concurrency=(1, 16),
    )

    def _tag(t: pa.Table) -> pa.Table:
        ok = pc.is_null(t["decode_error"])
        t = t.filter(ok).select(
            [id_col, transcript_col, "pcm_hash", "n_frames",
             "dur_ms_actual"]
        )
        h = hash_arrow_u64(t[transcript_col], seed=0x7C0F)
        return t.append_column(
            "_part",
            pa.array((h % np.uint64(partitions)).astype(np.int64)),
        )

    def _groups(g: pd.DataFrame) -> pd.DataFrame:
        payload = list(zip(
            g["pcm_hash"], g["n_frames"], g["dur_ms_actual"]
        ))
        g = g.assign(_payload=pd.Series(payload, index=g.index))
        agg = g.groupby(transcript_col, sort=False).agg(
            group_id=(id_col, "min"),
            n_clips=(id_col, "size"),
            n_audio=("_payload", "nunique"),
        )
        agg = agg[agg["n_audio"] > 1]
        return agg.reset_index(drop=True)[
            ["group_id", "n_clips", "n_audio"]
        ]

    return (
        sigs.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            lambda g: _groups(g.drop(columns=["_part"])),
            batch_format="pandas",
        )
    )


def speech_rate_outliers(
    clips: ray.data.Dataset,
    lo: float = 0.5,
    hi: float = 2.0,
    partitions: int = 16,
) -> ray.data.Dataset:
    """Per clip: token count, speech rate (tokens/s), the per-sample-rate
    median rate, and an outlier flag (rate outside [lo·med, hi·med]).

    Input needs only (clip_id, sr_hz, dur_ms, transcript) — prune the
    read to these. Output columns: clip_id, sr_hz, n_tok, dur_ms,
    rate_tps, med_tps, is_outlier.
    """
    rated = clips.map_batches(
        _add_rate, batch_format="pyarrow", zero_copy_batch=True
    )
    med = (
        group_quantiles(
            rated.select_columns(["sr_hz", "rate_tps"]),
            "sr_hz", "rate_tps", qs=(0.5,), partitions=partitions,
        )
        .to_pandas()  # |distinct sample rates| rows — driver-safe
    )
    srs = np.sort(med["sr_hz"].to_numpy())
    meds = med.set_index("sr_hz").loc[srs, "p50"].to_numpy()

    def _flag(t: pa.Table) -> pa.Table:
        sr = t["sr_hz"].to_numpy(zero_copy_only=False)
        # clip + membership-check the lookup: a sample rate absent from
        # the median pass (e.g. nondeterministic upstream re-execution)
        # must NOT borrow the next rate's median or index past the end —
        # it gets NaN med_tps / null is_outlier instead
        idx = np.clip(np.searchsorted(srs, sr), 0, len(srs) - 1)
        seen = srs[idx] == sr
        m = np.where(seen, meds[idx], np.nan)
        rate = t["rate_tps"].to_numpy()
        out = (rate > hi * m) | (rate < lo * m)
        t = t.append_column("med_tps", pa.array(m))
        return t.append_column(
            "is_outlier",
            pa.array(np.where(seen, out, False), mask=~seen),
        )

    return rated.map_batches(
        _flag, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(
        ["clip_id", "sr_hz", "n_tok", "dur_ms", "rate_tps", "med_tps",
         "is_outlier"]
    )
