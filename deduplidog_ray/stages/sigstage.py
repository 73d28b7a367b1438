"""Signature map_batches stage: norm_transcript → minhash/simhash columns.

Stateless vectorized stage (SURVEY.md §7): the permutation parameters are
computed once on the driver and captured in the closure — no per-batch or
per-row setup. Input batches must already carry ``norm_transcript``
(stages/normalize.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplidog_ray.config import SignatureConfig
from deduplidog_ray.stages.signatures import (
    minhash_signatures,
    shingle_hashes,
    simhash_signatures,
    winnow_keys,
)


def make_signature_stage(cfg: SignatureConfig):
    def _signatures(batch: pa.Table) -> pa.Table:
        texts = batch["norm_transcript"].to_pylist()
        flat, off = shingle_hashes(texts, cfg.shingle_k, cfg.seed)
        sig = minhash_signatures(flat, off, cfg)          # (D, P) uint16
        sh = simhash_signatures(flat, off)                # (D,) uint64
        nsh = (off[1:] - off[:-1]).astype(np.int32)
        wdoc, wval, wcnt = winnow_keys(flat, off, cfg.winnow_window)
        woff = np.concatenate([[0], np.cumsum(wcnt)]).astype(np.int32)
        winnow_col = pa.ListArray.from_arrays(
            pa.array(woff, type=pa.int32()), pa.array(wval.view(np.int64))
        )

        sig_bytes = [sig[i].astype("<u2").tobytes() for i in range(len(batch))]
        out = batch
        for name, arr in [
            ("minhash", pa.array(sig_bytes, type=pa.binary())),
            ("simhash", pa.array(sh.view(np.int64))),
            ("n_shingles", pa.array(nsh, type=pa.int32())),
            ("winnow", winnow_col),
        ]:
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return _signatures
