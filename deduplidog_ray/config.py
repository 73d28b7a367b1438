"""Configuration dataclasses for the dedup pipeline.

The reference composes five config dataclasses (Action / Execution / Match /
Media / Helper, reference deduplidog/deduplidog.py:38-183). We compose the
same *semantic* knobs into Ray-Data-shaped groups: normalization (the stem
normalizers, deduplidog.py:464-476), match predicates (deduplidog.py:707-767),
signature parameters (MinHash/SimHash/winnowing — the scalable generalization
of the stem index + perceptual hash), canonical-selection policy
(_affect, deduplidog.py:521-592), and execution sizing (batch sizes,
actor-pool concurrency, salting thresholds).

All signature parameters are part of the *semantic* config: the oracle
(deduplidog_ray/oracle.py) must run with the identical values for the
recall >= 0.99 comparison to be meaningful (north rule).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class NormalizeConfig:
    """Transcript normalization, ≙ reference stem normalizers.

    space2char: reference deduplidog.py:118-119, :469-470
    strip_end_counter: deduplidog.py:120-121, :471-472 (regex ``\\(\\d+\\)$``)
    strip_suffix: deduplidog.py:122-123, :473-474 (user regex)
    casefold: deduplidog.py:96-97 (intent; the reference's casefold branch is
        broken at runtime — see SURVEY.md §1.1 — we implement the intent)
    truncate: deduplidog.py:125-126, :288 (Google-Photos 47-char stem case)
    """

    space2char: str | None = None          # replace " " with this char if set
    strip_end_counter: bool = False        # strip trailing " (\d+)" counters
    strip_suffix: str | None = None        # strip this regex from the end
    casefold: bool = False                 # case-insensitive compare
    truncate: int | None = None            # compare first N chars only
    collapse_whitespace: bool = True       # canonicalize runs of whitespace


@dataclass(frozen=True)
class SignatureConfig:
    """Shingle / MinHash / SimHash / winnowing parameters.

    These generalize the reference's candidate index + perceptual-hash match:
      - MinHash-LSH over token shingles ≙ the stem index J1 / O(N·M) scan J2
        (deduplidog.py:285-288, :492-504) as scalable candidate generation.
      - SimHash Hamming <= k ≙ ``accepted_img_hash_diff`` (deduplidog.py:147-148,
        :758-760 — 64-bit average-hash Hamming distance, default 1).
      - Winnowing fingerprints ≙ the contained/shrunk-copy use case
        (reference docs/index.md:20-22,38) — substring candidate generation.
    """

    shingle_k: int = 3                     # token k-grams
    num_perm: int = 128                    # MinHash permutations
    lsh_bands: int = 16                    # bands (b)
    lsh_rows: int = 8                      # rows per band (r); b*r == num_perm
    simhash_bits: int = 64
    simhash_hamming: int = 3               # ≙ accepted_img_hash_diff
    jaccard_threshold: float = 0.7         # verify threshold on MinHash estimate
    winnow_window: int = 8                 # winnowing window (w) for containment
    containment_threshold: float = 0.8     # fraction of smaller clip's shingles
                                           # contained in larger (substring verify);
                                           # estimate from MinHash has ~0.05-0.1
                                           # noise at num_perm=128, hence < 0.9
    seed: int = 0x5EED                     # permutation/PRG seed (determinism)

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perm ({self.num_perm})"
            )


@dataclass(frozen=True)
class MatchConfig:
    """Pair-verification predicate, ≙ reference _find_similar/_find_similar_media.

    dur_delta_ms: ≙ ``accepted_frame_delta`` (deduplidog.py:144-145, :728-729).
    tolerate_dur_window_ms: ≙ ``tolerate_hour`` mtime window normalized at
        deduplidog.py:374-384 — exact-mode duration tolerance.
    require_same_codec_class: ≙ media-type partition F5 (deduplidog.py:27-29,
        :498-501 — images never compared to videos).
    checksum: ≙ ``checksum`` CRC gate (deduplidog.py:98-100, :714).
    ignore_name / ignore_size / ignore_date analogs: deduplidog.py:103-116.
    """

    dur_delta_ms: int = 40                 # near-dup duration tolerance
    time_window_ms: int | None = None      # ≙ the EXIF/mtime date gate on the
                                           # perceptual compare (deduplidog.py:
                                           # 744-756: image_similar only runs
                                           # when the files' timestamps are
                                           # within 3600 s): when set AND the
                                           # input carries a ``created_ms``
                                           # column, the FUZZY match axis
                                           # additionally requires
                                           # |created_a - created_b| <= window
                                           # (exact/pcm equality is ungated,
                                           # like the reference's exact path)
    fp_hamming_frac: float = 0.35          # perceptual-fp Hamming gate, as a fraction
                                           # of the pair's common active bits
                                           # (audio/fingerprint.py:active_bits)
    require_same_codec_class: bool = True
    checksum: bool = False                 # exact mode: require content hash eq
    ignore_transcript: bool = False        # ≙ ignore_name (pure-content match)
    ignore_size: bool = False
    ignore_duration: bool = False
    skip_empty: bool = True                # ≙ skip_empty (deduplidog.py:80-81)
    exact_containment: bool = False        # contained-clip axis: confirm every
                                           # contain-reason pair as an EXACT
                                           # transcript substring via the
                                           # generalized suffix array
                                           # (stages/suffixes.py) — the
                                           # suffix-array substring detection
                                           # of the shrunk/partial-copy case
                                           # (docs/index.md:20-22); estimate-
                                           # only pairs are dropped


@dataclass(frozen=True)
class CanonicalPolicy:
    """Cluster canonical selection, ≙ _affect (deduplidog.py:521-592).

    Canonical = max by (is_original, size, -age, clip_id):
      - original-side wins ≙ work/original role asymmetry (deduplidog.py:185-190)
      - bigger wins ≙ ``treat_bigger_as_original`` (deduplidog.py:533-535)
      - older wins ≙ the "older file is the genuine one" DATE WARNING
        heuristic (deduplidog.py:554-559)
    skip_bigger ≙ deduplidog.py:539-541; neglect_warning ≙ :565-566;
    invert_selection ≙ :128-129, :513-516 (emit only non-duplicates).
    """

    treat_bigger_as_original: bool = True
    skip_bigger: bool = False
    neglect_warning: bool = False
    invert_selection: bool = False
    action: str = "flag"                   # flag | drop | replace | link  (A1-A4)


@dataclass(frozen=True)
class ExecutionConfig:
    """Physical sizing. Not part of the semantic config hash."""

    batch_size: int = 4096                 # rows per map_batches call
    decode_batch_size: int = 256           # decoded PCM is ~100x bytes; keep small
    decode_concurrency: int = 256          # UPPER BOUND on the decode actor
                                           # pool; the pipeline sizes the pool
                                           # to the cluster's CPUs at runtime
    decode_actor_pool: bool = False        # True → fixed actor pool (use when
                                           # codec/model state is expensive to
                                           # build: real codec libs, ML models).
                                           # False → task-pool map_batches that
                                           # FUSES with the read (raw bytes
                                           # never enter the object store) and
                                           # never reserves CPUs from other
                                           # stages — right when per-actor
                                           # state is trivial (numpy codecs)
    hot_band_cap: int = 64                 # groups larger than this use star pairs
    verify_partitions: int = 64            # hash partitions for the band shuffle
                                           # (P ≈ 2-4× cluster cores; at scale,
                                           # data_size / target_partition_size)
    exchange: str = "skinny"               # band-row exchange:
                                           # "skinny" (default) = keys-only two-
                                           # exchange routing + zero-copy plasma
                                           # payload store (stages/pairgen.py) —
                                           # ~10x fewer shuffled bytes;
                                           # "hive" = map-side partitioned write
                                           # of FULL payload rows + one verify
                                           # task per partition;
                                           # "sort" = Ray groupby (multi-node
                                           # fallback without shared storage)
    pair_block_rows: int = 65536
    driver_results_max: int = 2_000_000    # clustered-row count up to which
                                           # canonicalization runs on the
                                           # driver (one broadcast pass, no
                                           # shuffle); above it the cluster-id
                                           # hash-partition plan runs
    target_max_block_size: int | None = None  # DataContext override if set


@dataclass(frozen=True)
class DedupConfig:
    normalize: NormalizeConfig = field(default_factory=NormalizeConfig)
    signature: SignatureConfig = field(default_factory=SignatureConfig)
    match: MatchConfig = field(default_factory=MatchConfig)
    canonical: CanonicalPolicy = field(default_factory=CanonicalPolicy)
    execution: ExecutionConfig = field(default_factory=ExecutionConfig)

    def semantic_hash(self) -> str:
        """Stable hash of the *semantic* config (everything but execution).

        Used as the lineage key for checkpoints (north rule: resume must not
        reuse state computed under a different semantic config).
        """
        d = asdict(self)
        d.pop("execution", None)
        # engine format version: bumped when checkpoint column encodings
        # or candidate-key schemes change (e.g. minhash width, simhash
        # combination blocks), invalidating old checkpoints
        d["_engine_format"] = 3
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()
