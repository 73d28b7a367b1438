"""Deterministic synthetic clips corpus with planted duplicate clusters.

≙ the reference's fixture machinery (tests/setup.py:22-79): 12 originals +
10 work files at controlled mtime offsets probing the tolerate_hour window
boundaries, plus content-mismatch rows. Our analog (FIXTURES.md §2) plants,
per base clip, variants probing every match axis and its boundary:

  exact copy · lossless re-encode (same PCM) · lossy re-encode (µ-law) ·
  in-threshold duration jitter · OUT-of-threshold duration (negative) ·
  fuzzy transcript within SimHash/Jaccard threshold · heavily-edited
  transcript (negative) · contained sub-clip · poison row · singletons ·
  a hot near-identical cluster (bench scale) for salting.

Everything derives from (seed); golden cluster labels accompany each row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "one", "two", "three", "four", "five", "six",
    "seven", "eight", "nine", "zero", "red", "green", "blue", "amber",
]


def _words(rng: np.random.Generator, n: int) -> list[str]:
    return [_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n)]


class _Corpus:
    def __init__(self) -> None:
        self.rows: list[dict] = []
        self.golden: dict[str, str] = {}     # clip_id -> golden cluster label
        self._i = 0

    def add(self, pcm, sr, transcript, codec, label, role="work", bad_bytes=None):
        cid = f"clip_{self._i:08d}"
        self._i += 1
        if bad_bytes is not None:
            buf = bad_bytes
            dur = 0
        else:
            buf = encode(pcm, sr, codec)
            dur = int(round(len(pcm) * 1000 / sr))
        self.rows.append(
            {
                "clip_id": cid,
                "bytes": buf,
                "sr_hz": sr,
                "dur_ms": dur,
                "codec": codec,
                "transcript": transcript,
                "role": role,
            }
        )
        self.golden[cid] = label
        return cid


def make_corpus(
    n_clusters: int = 12,
    n_singletons: int = 10,
    seed: int = 1234,
    hot_cluster_size: int = 0,
    with_negatives: bool = True,
) -> tuple[pa.Table, dict[str, str]]:
    """Returns (clips table incl. ``role`` column, clip_id → golden label).

    Golden labels: variants that SHOULD co-cluster share their base label;
    planted negatives and singletons get their own label.
    """
    rng = np.random.default_rng(seed)
    c = _Corpus()
    srs = [8000, 16000, 22050]

    for k in range(n_clusters):
        label = f"cluster_{k}"
        sr = srs[int(rng.integers(0, len(srs)))]
        dur = int(rng.integers(900, 2500))
        pseed = int(rng.integers(0, 2**31))
        ntok = int(rng.integers(24, 48))
        toks = _words(rng, ntok)
        transcript = " ".join(toks)
        pcm = make_pcm(pseed, dur, sr)

        # base (original side, ≙ original_dir rows)
        c.add(pcm, sr, transcript, "pcm_s16le", label, role="original")
        # exact copy: identical bytes ≙ same name/size/date (deduplidog.py:707-714)
        c.add(pcm, sr, transcript, "pcm_s16le", label)
        # lossy re-encode, same PCM ≙ format-converted duplicate (docs/index.md:38)
        c.add(pcm, sr, transcript, "ulaw", label)
        # in-threshold duration jitter ≙ accepted_frame_delta (deduplidog.py:728-729)
        trim = int(sr * 0.02)  # 20 ms < dur_delta_ms=40
        c.add(pcm[:-trim], sr, transcript, "pcm_s16le", label)
        # fuzzy transcript (1 token edited) + slightly noised audio
        toks2 = list(toks)
        toks2[int(rng.integers(0, ntok))] = "edited"
        noisy = np.clip(pcm + rng.normal(0, 2e-3, len(pcm)).astype(np.float32), -1, 1)
        c.add(noisy, sr, " ".join(toks2), "pcm_s16le", label)
        # contained sub-clip: contiguous half of transcript + matching PCM span
        half = ntok // 2
        sub_toks = toks[:half]
        sub_pcm = pcm[: len(pcm) // 2]
        c.add(sub_pcm, sr, " ".join(sub_toks), "pcm_s16le", label)

        if with_negatives:
            # out-of-threshold duration (same transcript, audio truncated 500ms)
            trim_out = int(sr * 0.5)
            if len(pcm) > trim_out + sr // 4:
                c.add(pcm[:-trim_out], sr, transcript, "pcm_s16le", f"{label}_durneg")
            # heavily edited transcript + different audio (hard negative)
            toks3 = _words(rng, ntok)
            pcm3 = make_pcm(pseed ^ 0xFFFF, dur, sr)
            c.add(pcm3, sr, " ".join(toks3), "pcm_s16le", f"{label}_txtneg")

    for s in range(n_singletons):
        sr = srs[int(rng.integers(0, len(srs)))]
        pcm = make_pcm(int(rng.integers(0, 2**31)), int(rng.integers(600, 1500)), sr)
        c.add(pcm, sr, " ".join(_words(rng, int(rng.integers(10, 25)))),
              "pcm_s16le", f"singleton_{s}")

    # poison row ≙ DecompressionBomb skip (deduplidog.py:447-448)
    c.add(None, 16000, "poison transcript", "pcm_s16le", "poison",
          bad_bytes=b"\x00garbage-not-a-wav\xff" * 3)

    if hot_cluster_size:
        sr = 16000
        pcm = make_pcm(777, 1200, sr)
        toks = _words(rng, 30)
        for i in range(hot_cluster_size):
            # tiny per-copy noise: near-identical, all should co-cluster
            noisy = np.clip(pcm + rng.normal(0, 1e-3, len(pcm)).astype(np.float32), -1, 1)
            c.add(noisy, sr, " ".join(toks), "pcm_s16le", "hot")

    cols: dict[str, list] = {k: [r[k] for r in c.rows] for k in c.rows[0]}
    table = pa.table(
        {
            "clip_id": pa.array(cols["clip_id"], type=pa.string()),
            "bytes": pa.array(cols["bytes"], type=pa.binary()),
            "sr_hz": pa.array(cols["sr_hz"], type=pa.int32()),
            "dur_ms": pa.array(cols["dur_ms"], type=pa.int32()),
            "codec": pa.array(cols["codec"], type=pa.string()),
            "transcript": pa.array(cols["transcript"], type=pa.string()),
            "role": pa.array(cols["role"], type=pa.string()),
        }
    )
    return table, c.golden


def write_corpus(path: str, **kwargs) -> dict[str, str]:
    """Write the corpus as a (sharded) parquet dir; returns golden labels."""
    import os

    import pyarrow.parquet as pq

    table, golden = make_corpus(**kwargs)
    os.makedirs(path, exist_ok=True)
    # 4 shards → exercises fragment-level partitioning/resume
    n = len(table)
    shard = max(1, (n + 3) // 4)
    for i in range(0, n, shard):
        pq.write_table(table.slice(i, shard), os.path.join(path, f"part-{i//shard:03d}.parquet"))
    return golden
