"""Deterministic clips table derived from a driver `documents` table.

The sandbox's test tables (`/root/testdata/sf*/documents.parquet`) carry
text; the flagship pipeline needs the BASELINE.json `input_hint` clip
schema. This module synthesizes, deterministically from (doc_id, text),
an audio+transcript clips table at the same scale — transcript = the doc
text, audio = seeded synthetic PCM — and plants duplicates (exact copies,
lossy re-encodes, fuzzy-transcript variants) at a fixed rate so the dedup
pipeline has realistic work at every sf.

Generation runs distributed (map_batches over the documents table) and is
cached as sharded parquet under /tmp keyed by (source path, generator
version) so bench reruns skip synthesis.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

import ray.data

from deduplidog_ray.audio.codecs import encode
from deduplidog_ray.audio.synth import make_pcm

_GEN_VERSION = "v4"  # v4: ~96-file layout so read parallelism isn't
                     # file-bound (16 fat files capped decompression at 16
                     # cores regardless of cluster width)
_SRS = [8000, 16000, 22050]


def _make_synth_clips(amplify: int):
    """map_batches fn factory: documents batch → clips rows (with dups).

    ``amplify`` clips are derived per document (distinct seeds and
    token-rotated transcripts) so bench scales beyond the documents table's
    row count without external data."""

    def _synth(batch: pa.Table) -> pa.Table:
        return _synth_clips(batch, amplify)

    return _synth


def _synth_clips(batch: pa.Table, amplify: int = 1) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out = {k: [] for k in ("clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                           "transcript", "role")}

    def emit(cid, buf, sr, dur, codec, transcript, role):
        out["clip_id"].append(cid)
        out["bytes"].append(buf)
        out["sr_hz"].append(sr)
        out["dur_ms"].append(dur)
        out["codec"].append(codec)
        out["transcript"].append(transcript)
        out["role"].append(role)

    for did, text in zip(doc_ids, texts):
        text = text or ""
        base_toks = text.split()[:48]
        for salt in range(amplify):
            uid = did * amplify + salt
            if salt == 0:
                toks = list(base_toks)
            else:
                # seeded shuffle per salt: same vocabulary, different token
                # ORDER → k-gram shingle sets are ~disjoint, so amplified
                # variants are NOT near-duplicates of each other (a rotation
                # would keep every k-gram and make every family one giant
                # near-identical cluster — unrealistically adversarial)
                r = np.random.default_rng(uid)
                toks = list(base_toks)
                r.shuffle(toks)
            transcript = " ".join(toks)
            sr = _SRS[uid % len(_SRS)]
            dur = 600 + (uid * 37) % 1800
            pcm = make_pcm(uid, dur, sr)
            emit(f"clip_{uid:09d}_o", encode(pcm, sr, "pcm_s16le"), sr, dur,
                 "pcm_s16le", transcript, "original")
            m = uid % 10
            if m == 0:      # exact duplicate
                emit(f"clip_{uid:09d}_d", encode(pcm, sr, "pcm_s16le"), sr, dur,
                     "pcm_s16le", transcript, "work")
            elif m == 1:    # lossy re-encode
                emit(f"clip_{uid:09d}_d", encode(pcm, sr, "ulaw"), sr, dur,
                     "ulaw", transcript, "work")
            elif m == 2 and len(toks) > 8:   # fuzzy transcript + noised audio
                t2 = list(toks)
                t2[len(t2) // 2] = "variant"
                rng = np.random.default_rng(uid)
                noisy = np.clip(
                    pcm + rng.normal(0, 2e-3, len(pcm)).astype(np.float32), -1, 1
                )
                emit(f"clip_{uid:09d}_d", encode(noisy, sr, "pcm_s16le"), sr, dur,
                     "pcm_s16le", " ".join(t2), "work")

    return pa.table(
        {
            "clip_id": pa.array(out["clip_id"], type=pa.string()),
            "bytes": pa.array(out["bytes"], type=pa.binary()),
            "sr_hz": pa.array(out["sr_hz"], type=pa.int32()),
            "dur_ms": pa.array(out["dur_ms"], type=pa.int32()),
            "codec": pa.array(out["codec"], type=pa.string()),
            "transcript": pa.array(out["transcript"], type=pa.string()),
            "role": pa.array(out["role"], type=pa.string()),
        }
    )


def _cached_parquet_dir(tag: str, sf_dir: str, build, force: bool,
                        cache_root: str = "/tmp/deduplidog_ray_clips") -> str:
    """Shared atomic-cache protocol for synthesized parquet dirs: key by
    (sf_dir, generator version, tag), build into ``<path>.tmp``, stamp
    ``_SUCCESS``, rename into place. ONE copy of the rename/marker dance
    so a fix (e.g. for a concurrent-writer race) lands everywhere."""
    import shutil

    key = hashlib.blake2b(
        f"{os.path.abspath(sf_dir)}:{_GEN_VERSION}:{tag}".encode(),
        digest_size=8,
    ).hexdigest()
    path = os.path.join(cache_root, key)
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return path
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(_GEN_VERSION)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def clips_path_for(
    sf_dir: str, amplify: int = 1, cache_root: str = "/tmp/deduplidog_ray_clips"
) -> str:
    key = hashlib.blake2b(
        f"{os.path.abspath(sf_dir)}:{_GEN_VERSION}:a{amplify}".encode(), digest_size=8
    ).hexdigest()
    return os.path.join(cache_root, key)


def clips_from_documents(
    sf_dir: str, amplify: int = 1, force: bool = False
) -> str:
    """Ensure the synthesized clips parquet dir for ``sf_dir`` exists;
    returns its path. Distributed generation, cached."""

    def _build(tmp: str) -> None:
        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        # Split the (tiny) documents table into ~96 blocks BEFORE the
        # synth map: the parquet source is one row group = ONE block, so
        # without this a single task would synthesize the whole amplified
        # corpus (at amplify=64 that is ~15 GB through one worker heap).
        # Repartitioning the input costs nothing (5k rows) and makes
        # synthesis 96-way parallel; writing straight from the map output
        # then needs no repartition barrier over the full synthesized
        # payload, and still yields the ~96-file layout v4 wants.
        docs.repartition(96).map_batches(
            _make_synth_clips(amplify), batch_format="pyarrow",
            batch_size=16, zero_copy_batch=True,
        ).write_parquet(tmp)

    return _cached_parquet_dir(f"a{amplify}", sf_dir, _build, force)


def textured_clips_from_documents(sf_dir: str, force: bool = False) -> str:
    """Ensure the TEXTURED clips parquet dir for ``sf_dir`` exists; one
    clip per document, PCM from `synth.make_pcm_textured` (time-varying
    spectra — the input landmark fingerprinting needs; `make_pcm`'s
    near-stationary tones are its documented degenerate case). No
    duplicate planting here: landmark queries plant their own
    delayed/cropped copies so recall is measurable."""
    from deduplidog_ray.audio.synth import make_pcm_textured

    def _synth(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        out = {"clip_id": [], "bytes": [], "sr_hz": [], "dur_ms": [],
               "codec": []}
        for did in dids:
            did = int(did)
            sr = _SRS[did % len(_SRS)]
            dur = 900 + (did * 53) % 1600
            pcm = make_pcm_textured(did, dur, sr)
            out["clip_id"].append(f"tex_{did:09d}")
            out["bytes"].append(encode(pcm, sr, "pcm_s16le"))
            out["sr_hz"].append(sr)
            out["dur_ms"].append(dur)
            out["codec"].append("pcm_s16le")
        return pa.table({
            "clip_id": pa.array(out["clip_id"], type=pa.string()),
            "bytes": pa.array(out["bytes"], type=pa.binary()),
            "sr_hz": pa.array(out["sr_hz"], type=pa.int32()),
            "dur_ms": pa.array(out["dur_ms"], type=pa.int32()),
            "codec": pa.array(out["codec"], type=pa.string()),
        })

    def _build(tmp: str) -> None:
        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        docs.repartition(96).map_batches(
            _synth, batch_format="pyarrow", batch_size=16,
            zero_copy_batch=True,
        ).write_parquet(tmp)

    return _cached_parquet_dir("textured", sf_dir, _build, force)


_CLIP_COLS = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]


def _retag_clip_ids(suffix: str):
    import pyarrow.compute as pc

    def _r(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("clip_id"), "clip_id",
            pc.binary_join_element_wise(t["clip_id"], suffix, ""),
        ).select(_CLIP_COLS)

    return _r


def _md5_sampler(mod: int, rem: int, tag: str):
    """Deterministic 1-in-``mod`` sampler whose membership DuckDB can
    reconstruct: keep rows where
    ``md5_number_upper(clip_id || '|' || tag) % mod == rem`` (the
    md5-upper-word correspondence of textdedup._md5_shingles). Used by
    the planted-variant fixtures so the driver's reconstructive SQL
    oracles can enumerate the planted pair set from the documents
    table alone."""
    import hashlib

    def _s(t: pa.Table) -> pa.Table:
        ids = t["clip_id"].to_pylist()
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{c}|{tag}".encode()).digest()[:8], "little")
             for c in ids),
            dtype=np.uint64, count=len(ids),
        )
        return t.filter(pa.array(h % np.uint64(mod) == rem))

    return _s


def shifted_variants_from_clips(sf_dir: str, force: bool = False) -> str:
    """Planted SHIFTED copies for the alignment bench corpus, cached: a
    deterministic 1-in-8 sample of the standard clips ships again with
    240 ms of lead-in silence and a ``_shift`` id suffix. Cached as its
    own parquet dir (fixture synthesis, like the base tables) so the
    timed query is a pure read→union — the Delay actor pool is corpus
    construction, not the operator under test."""
    from deduplidog_ray.pipelines.audiotransform import Delay

    base = clips_from_documents(sf_dir, force=force)

    def _build(tmp: str) -> None:
        ds = ray.data.read_parquet(base, columns=_CLIP_COLS)
        ds.map_batches(
            _md5_sampler(8, 0, "sh"), batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            Delay, fn_constructor_kwargs={"delay_ms": 240},
            batch_format="pyarrow", batch_size=64, zero_copy_batch=True,
            concurrency=(1, 16),
        ).map_batches(
            _retag_clip_ids("_shift"), batch_format="pyarrow",
            zero_copy_batch=True,
        ).write_parquet(tmp)

    return _cached_parquet_dir("shiftvar-md5", sf_dir, _build, force)


def landmark_variants_from_clips(sf_dir: str, force: bool = False) -> str:
    """Planted DELAYED + CROPPED copies of the textured clips for the
    landmark-fingerprint bench corpus, cached: a 1-in-8 sample delayed
    480 ms (``_lmshift``) plus a disjoint 1-in-16 sample cropped to its
    25%..85% middle (``_lmcut``, clips >= 1400 ms only). Same fixture
    rationale as `shifted_variants_from_clips`."""
    from deduplidog_ray.pipelines.audiotransform import Crop, Delay

    base = textured_clips_from_documents(sf_dir, force=force)

    def _build(tmp: str) -> None:
        ds = ray.data.read_parquet(base, columns=_CLIP_COLS)
        delayed = ds.map_batches(
            _md5_sampler(8, 0, "lm"), batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(
            Delay, fn_constructor_kwargs={"delay_ms": 480},
            batch_format="pyarrow", batch_size=64, zero_copy_batch=True,
            concurrency=(1, 16),
        ).map_batches(
            _retag_clip_ids("_lmshift"), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        cropped = ds.map_batches(
            _md5_sampler(16, 3, "lm"), batch_format="pyarrow",
            zero_copy_batch=True,
        ).filter(lambda r: r["dur_ms"] >= 1400).map_batches(
            Crop, fn_constructor_kwargs={"start_frac": 0.25,
                                         "dur_frac": 0.6},
            batch_format="pyarrow", batch_size=64, zero_copy_batch=True,
            concurrency=(1, 16),
        ).map_batches(
            _retag_clip_ids("_lmcut"), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        delayed.union(cropped).write_parquet(tmp)

    return _cached_parquet_dir("lmvar-md5", sf_dir, _build, force)


def stretched_variants_from_clips(sf_dir: str, force: bool = False) -> str:
    """Planted SPEED-CHANGED copies of the textured clips for the
    stretch-fingerprint bench corpus, cached: a 1-in-16 sample ships
    again at 0.95× speed (``_strdn``) and a disjoint 1-in-16 sample at
    1.05× (``_strup``) — the resample-mislabel transformation
    `audiostretch.stretch_dup_pairs` must see through. Clips >= 1400 ms
    only (the crop fixture's gate, same rationale: quad voting needs
    enough audio — a ~1 s textured clip yields ~5 matchable quads,
    below any noise floor). Same fixture rationale as
    `shifted_variants_from_clips`."""
    from deduplidog_ray.pipelines.audiotransform import Stretch

    base = textured_clips_from_documents(sf_dir, force=force)

    def _build(tmp: str) -> None:
        ds = ray.data.read_parquet(base, columns=_CLIP_COLS)
        ds = ds.filter(lambda r: r["dur_ms"] >= 1400)
        arms = []
        for rem, rate, tag in ((1, 0.95, "_strdn"), (5, 1.05, "_strup")):
            arms.append(
                ds.map_batches(
                    _md5_sampler(16, rem, "str"), batch_format="pyarrow",
                    zero_copy_batch=True,
                ).map_batches(
                    Stretch, fn_constructor_kwargs={"rate": rate},
                    batch_format="pyarrow", batch_size=64,
                    zero_copy_batch=True, concurrency=(1, 16),
                ).map_batches(
                    _retag_clip_ids(tag), batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        arms[0].union(arms[1]).write_parquet(tmp)

    return _cached_parquet_dir("strvar-md5-d14", sf_dir, _build, force)
