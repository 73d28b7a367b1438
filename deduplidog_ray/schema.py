"""Arrow schemas for every table that flows between stages.

The input schema is fixed by BASELINE.json ``input_hint``; intermediate
stages only ever *add* columns (signatures, band keys, cluster ids) — the
columnar analog of the reference's lazily-computed ``FileMetadata`` side
table (reference deduplidog/helpers.py:20-77), materialized once instead of
cached per path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: BASELINE.json input_hint schema, verbatim.
CLIPS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)

#: decode stage output (stages/decode.py) — added columns.
DECODE_COLUMNS = pa.schema(
    [
        ("n_bytes", pa.int64()),
        ("pcm_hash", pa.uint64()),      # hash of int16-quantized PCM (container-invariant)
        ("fp", pa.binary()),            # 512-bit perceptual fingerprint (64 B)
        ("dur_ms_actual", pa.int32()),  # duration recomputed from decoded PCM
        ("decode_error", pa.string()),  # poison-row quarantine; null = OK
    ]
)

#: signature stage output (stages/signatures.py) — added columns.
SIGNATURE_COLUMNS = pa.schema(
    [
        ("norm_transcript", pa.string()),
        ("content_hash", pa.uint64()),
        ("minhash", pa.binary()),       # num_perm * uint32, little-endian
        ("simhash", pa.uint64()),
        ("n_shingles", pa.int32()),
    ]
)

#: exploded candidate-key rows (stages/candidates.py).
BAND_SCHEMA = pa.schema(
    [
        ("band_key", pa.uint64()),      # mixed (key_type, band_id/block, hash, salt)
        ("clip_id", pa.string()),
        ("codec_class", pa.string()),
        ("dur_ms", pa.int32()),
        ("n_bytes", pa.int64()),
        ("content_hash", pa.uint64()),
        ("pcm_hash", pa.uint64()),
        ("simhash", pa.uint64()),
        ("fp", pa.binary()),
        ("minhash", pa.binary()),
        ("n_shingles", pa.int32()),
    ]
)

#: verified duplicate pairs.
PAIRS_SCHEMA = pa.schema(
    [
        ("a", pa.string()),             # a < b lexicographically
        ("b", pa.string()),
        ("reason", pa.string()),        # exact | pcm | jaccard | simhash | contain
        ("score", pa.float32()),
    ]
)

#: final output table, ≙ the reference ``Change`` log (deduplidog.py:32-33)
#: re-expressed as a results table (SURVEY.md §1.2).
RESULT_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("cluster_id", pa.string()),    # canonical member's clip_id
        ("is_canonical", pa.bool_()),
        ("action", pa.string()),        # flag | drop | replace | link | keep
        ("reasons", pa.list_(pa.string())),
        # A5 metadata propagation (≙ set_both_to_older_date,
        # deduplidog.py:547-553): the canonical member's authoritative
        # duration, adopted by every cluster member.
        ("canonical_dur_ms", pa.int32()),
    ]
)


def singleton_results_block(s: pa.Table) -> pa.Table:
    """RESULT_SCHEMA rows for singleton clips — fully vectorized.

    A singleton is its own cluster and canonical; its only possible reason
    is a decode-error quarantine. Hot path of the results stage (runs over
    every non-clustered row of the corpus), so: zero-copy column reuse for
    the id columns, Arrow ``if_else`` for the action, and the reasons
    list<string> column built from offsets (Python only for the rare
    error rows).
    """
    import pyarrow.compute as pc

    s = s.combine_chunks()
    n = len(s)
    ids = s["clip_id"]
    errs = s["decode_error"]
    ok = pc.is_null(errs)
    action = pc.if_else(
        ok,
        pa.scalar("keep", type=pa.string()),
        pa.scalar("quarantine", type=pa.string()),
    )
    ok_np = ok.to_numpy(zero_copy_only=False)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(~ok_np, out=offsets[1:])
    if offsets[-1]:
        msgs = [f"decode_error: {e}" for e in pc.drop_null(errs).to_pylist()]
    else:
        msgs = []
    reasons = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(msgs, type=pa.string()),
    )
    return pa.table(
        {
            "clip_id": ids,
            "cluster_id": ids,
            "is_canonical": pa.array(np.ones(n, dtype=bool)),
            "action": action,
            "reasons": reasons,
            "canonical_dur_ms": pc.cast(s["dur_ms"], pa.int32()),
        },
        schema=RESULT_SCHEMA,
    )
