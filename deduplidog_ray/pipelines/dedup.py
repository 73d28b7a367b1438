"""The flagship near-duplicate detection + clustering pipeline.

End-to-end DAG (SURVEY.md §3 "target lifecycle"):

    read clips → decode/fingerprint (ACTOR POOL map_batches)
               → normalize transcript (stateless, pyarrow.compute)
               → signatures + candidate keys (stateless, computed once)
               → [checkpoint per partition, lineage manifest]
               → pass 1: key counts (combiner + partition groupby) →
                 hot-key salt plan + ACTIVE key set (count >= 2)
               → pass 2: explode active candidate keys (salted hot keys,
                 hot winnow keys dropped)
               → groupby(key HASH PARTITION) SHUFFLE → multi-group
                 vectorized verify with first-collision pair dedup
               → rep round over hot-key representatives
               → [pair/cluster-state checkpoint]
               → union-find connected components (driver DSU over the
                 small pair stream)
               → canonicalize (driver fast path, or per cluster-id hash
                 partition at scale — singletons never shuffle)
               → results table (+ write)

≙ reference ``Deduplidog().start()`` (deduplidog/deduplidog.py:263-325),
re-expressed order-independently (SURVEY.md §7). Scale notes inline.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

from deduplidog_ray.config import DedupConfig
from deduplidog_ray.sources.clips_io import list_fragments, read_fragments
from deduplidog_ray.stages.candidates import (
    find_hot_keys,
    make_explode_stage,
    make_key_stage,
)
from deduplidog_ray.stages.canonical import make_canonicalizer
from deduplidog_ray.stages.decode import DecodeFingerprint
from deduplidog_ray.stages.normalize import make_normalizer
from deduplidog_ray.stages.sigstage import make_signature_stage
from deduplidog_ray.stages.verify import (
    make_partition_verifier,
    make_rep_verifier,
    verify_partition_table,
)
from deduplidog_ray.state.checkpoint import CheckpointManager
from deduplidog_ray.state.unionfind import UnionFind  # noqa: F401 (oracle/tests)

#: columns persisted in the signature checkpoint — everything downstream
#: needs, and NOT the audio ``bytes`` (decoded once, never re-shipped).
SIG_COLUMNS = [
    "clip_id", "sr_hz", "dur_ms", "codec", "codec_class", "role", "created_ms",
    "n_bytes", "content_hash", "pcm_hash", "fp", "n_frames", "dur_ms_actual",
    "decode_error", "norm_transcript", "minhash", "simhash",
    "n_shingles", "winnow", "cand_keys", "cand_ranks",
]


class NearDupPipeline:
    def __init__(self, cfg: DedupConfig | None = None, workdir: str | None = None):
        self.cfg = cfg or DedupConfig()
        self.workdir = workdir
        self.ckpt = (
            CheckpointManager(workdir, self.cfg.semantic_hash()) if workdir else None
        )
        self.metrics: dict = {}
        # payload-store ref from the skinny exchange — lets the results
        # stage read policy columns without a second signature-table pass
        self._store_ref = None
        # polars-backed sort blocks: measured ~35% faster on the wide
        # (minhash/fp binary) band-row exchange than the Arrow sort path.
        # Enabled ONLY when the polars thread pin was exported before
        # ray.init (bench.py/CLI/conftest do) — Ray's own sort tasks don't
        # import this package, so an unpinned polars there spawns a full
        # rayon pool per worker (measured: load 3x cores, net slowdown)
        import os

        if os.environ.get("POLARS_MAX_THREADS") == "1":
            try:
                ray.data.DataContext.get_current().use_polars_sort = True
            except Exception:
                pass

    # ------------------------------------------------------------ stage 1
    def signatures(self, clips: ray.data.Dataset) -> ray.data.Dataset:
        """decode → normalize → signature columns; drops ``bytes``."""
        ex = self.cfg.execution
        if ex.decode_actor_pool:
            # fixed-size pool sized to ~60% of the cluster: an autoscaling
            # (1, N) pool ramps too slowly for short jobs; a pool taking
            # every CPU starves the read stage (actor CPU reservations are
            # held while idle) and serializes the pipeline
            avail = int(ray.cluster_resources().get("CPU", 8))
            pool = max(1, min(ex.decode_concurrency, int(avail * 0.6)))
            ds = clips.map_batches(
                DecodeFingerprint,
                batch_format="pyarrow",
                batch_size=ex.decode_batch_size,
                concurrency=pool,
                num_cpus=1,
                zero_copy_batch=True,
            )
        else:
            # task-pool decode (default for the numpy codecs, whose per-
            # actor state is a dict): FUSES with the read, so the raw
            # ``bytes`` column never enters the object store, and no CPUs
            # are reserved away from the read/signature stages. Measured:
            # the 19-actor pool left the 32-CPU side ~2x under-utilized
            # (pool idle waiting on a read constrained to the leftover
            # cores) — the single biggest N→4N scaling cost of round 1.
            ds = clips.map_batches(
                DecodeFingerprint(),
                batch_format="pyarrow",
                batch_size=ex.decode_batch_size,
                zero_copy_batch=True,
            )
        # batch_size=None → one task per block: parallelism follows the
        # block layout instead of serializing into a few 4096-row batches
        ds = ds.map_batches(
            make_normalizer(self.cfg.normalize),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = ds.map_batches(
            make_signature_stage(self.cfg.signature),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # candidate keys computed ONCE here; the count and explode passes
        # read the cached columns instead of redoing band/block/winnow math
        ds = ds.map_batches(
            make_key_stage(self.cfg), batch_format="pyarrow", zero_copy_batch=True
        )

        def _project(t: pa.Table) -> pa.Table:
            keep = [c for c in SIG_COLUMNS if c in t.column_names]
            # combine_chunks: the decode/normalize/signature stages leave one
            # chunk per upstream batch; fragmented columns tax every
            # downstream to_numpy/filter pass (measured: the pass-1 count
            # merge alone lost ~7 s at 416k rows on chunked blocks)
            return t.select(keep).combine_chunks()

        return ds.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True)

    def signatures_checkpointed(
        self, input_path: str, partitions: int | None = None
    ) -> ray.data.Dataset:
        """Compute signatures per input partition with resume-on-restart.

        Fragments are grouped into partitions; completed partitions (same
        semantic config) are skipped — the kill-and-resume path (north rule).
        Each partition run uses the whole cluster; partitions are a
        *checkpoint granularity*, not a parallelism limit.
        """
        assert self.ckpt is not None, "workdir required for checkpointing"
        frags = list_fragments(input_path)
        nparts = partitions or max(1, min(len(frags), 8))
        groups: list[list[str]] = [list(frags[i::nparts]) for i in range(nparts)]
        import glob
        import os

        for pid, group in enumerate(groups):
            # lineage check: same config AND same input fragments
            # (paths+sizes+mtimes) — added/removed/rewritten inputs
            # invalidate the partition (ADVICE r1)
            fh = self.ckpt.fragments_hash(group)
            # a manifest entry whose files were deleted self-heals
            have_files = bool(
                glob.glob(
                    os.path.join(self.ckpt.partition_dir("signatures", pid), "*.parquet")
                )
            )
            if (self.ckpt.is_done("signatures", pid, fh) and have_files) or not group:
                continue
            t0 = time.monotonic()
            total = sum(os.path.getsize(f) for f in group if os.path.exists(f))
            avail = int(ray.cluster_resources().get("CPU", 8))
            want = max(avail * 2, total // (128 << 20))
            nb = int(want) if len(group) < want else None
            ds = self.signatures(read_fragments(group, override_num_blocks=nb))
            self.ckpt.write_partition("signatures", pid, ds, group, t0,
                                      input_hash=fh)
        import ray.data as rd

        # read ONLY this run's pids — a previous run over a larger input
        # may have left stale higher-numbered partitions behind
        return rd.read_parquet(
            self.ckpt.stage_files_for("signatures", range(len(groups)))
        )

    # ------------------------------------------------------------ stage 2
    def pairs(self, sig_ds: ray.data.Dataset) -> ray.data.Dataset:
        """Candidate shuffle → verified duplicate pairs.

        ``sig_ds`` should be backed by the checkpoint (or materialized) so
        the two passes don't recompute decode+signatures twice.
        """
        cfg, ex = self.cfg, self.cfg.execution
        hot, active = find_hot_keys(sig_ds, cfg)              # pass 1
        self.metrics["hot_keys"] = len(hot)
        self.metrics["active_keys"] = len(active)
        if self.ckpt:
            self.ckpt.write_skew_metrics(hot, ex.hot_band_cap)
        hot_ref = ray.put(hot) if hot else None
        active_ref = ray.put(active)

        # the downstream sort's parallelism follows the exploded block
        # count: target ~2 blocks per core (too few caps SortMap/Reduce
        # width; too many drowns the exchange in tiny-object overhead)
        avail = int(ray.cluster_resources().get("CPU", 8))
        try:
            n_rows = sig_ds.count()          # metadata-cheap when materialized
        except Exception:
            n_rows = 0
        explode_batch = (
            max(512, n_rows // (2 * avail)) if n_rows else ex.batch_size
        )
        use_skinny = ex.exchange == "skinny" and self._hive_exchange_safe()
        exploded = sig_ds.map_batches(                        # pass 2
            make_explode_stage(cfg, hot_ref, active_ref, skinny=use_skinny),
            batch_format="pyarrow",
            batch_size=explode_batch,
            zero_copy_batch=True,
        )
        if use_skinny:
            return self._pairs_skinny_exchange(sig_ds, exploded)
        if ex.exchange in ("hive", "skinny"):
            if self._hive_exchange_safe():
                return self._pairs_hive_exchange(exploded)
            import logging

            logging.getLogger(__name__).warning(
                "hive/skinny exchange needs a single node or shared storage "
                "(set DEDUPLIDOG_SHARED_EXCHANGE=1 if the exchange dir is "
                "on S3/NFS); falling back to the sort-based exchange"
            )
        # groupby the HASH PARTITION id (P groups → P vectorized UDF calls),
        # never the raw band key (millions of per-group Python dispatches)
        mixed = exploded.groupby("part").map_groups(
            make_partition_verifier(cfg), batch_format="pyarrow"
        )
        if hot:
            # two consumers (pairs + reps) would re-execute the whole
            # explode+shuffle+verify chain; the mixed output is tiny
            # (pairs + one rep row per salted subgroup) — pin it
            mixed = mixed.materialize()
        pair_cols = ["a", "b", "reason", "score"]

        def _only_pairs(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t["row_type"], "pair")).select(pair_cols)

        pairs1 = mixed.map_batches(_only_pairs, batch_format="pyarrow")
        if not hot:
            # no hot keys → no salted subgroups → no representative round
            return pairs1

        def _only_reps(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            out = t.filter(pc.equal(t["row_type"], "rep"))
            out = out.drop_columns(["row_type", "a", "b", "reason", "score", "part"])
            keys = out["orig_key"].to_numpy(zero_copy_only=False).view(np.uint64)
            rep_part = (keys % np.uint64(ex.verify_partitions)).astype(np.int64)
            return out.append_column("part", pa.array(rep_part))

        reps = mixed.map_batches(_only_reps, batch_format="pyarrow")
        # second round restores connectivity across salted subgroups; the
        # rep table is tiny (one row per subgroup of a hot key)
        pairs2 = reps.groupby("part").map_groups(
            make_rep_verifier(cfg), batch_format="pyarrow"
        )
        return pairs1.union(pairs2)

    def _exchange_base(self) -> str:
        """Exchange-directory root: the shared helper, rooted at the
        workdir when one exists so the exchange lives next to the
        checkpoints (``stages/exchange.py`` has the full rationale)."""
        from deduplidog_ray.stages.exchange import exchange_base

        return exchange_base(self.workdir)

    def _hive_exchange_safe(self) -> bool:
        """Delegates to the shared safety check (``stages/exchange.py``):
        single node, or shared storage asserted with
        DEDUPLIDOG_SHARED_EXCHANGE=1 AND a workdir to root it at
        (ADVICE r1)."""
        from deduplidog_ray.stages.exchange import hive_safe

        return hive_safe(self.workdir)

    def _pairs_hive_exchange(self, exploded: ray.data.Dataset) -> ray.data.Dataset:
        """MapReduce-style band-row exchange: map-side hive-partitioned
        parquet write (``partition_cols=['part']``), then ONE read+verify
        task per partition. No sort, no sampling, no driver barrier —
        measured ~3x faster than Ray's sort-based groupby on this
        workload and it scales with cores on both sides.

        On a multi-node cluster the exchange directory lives on the shared
        store (S3/NFS) — the classic external-shuffle layout; locally it
        rides the page cache. The representative round (tiny) is resolved
        on the driver.
        """
        import glob
        import shutil
        import uuid

        cfg = self.cfg
        xdir = os.path.join(self._exchange_base(), f"exchange-{uuid.uuid4().hex[:8]}")
        try:
            exploded.write_parquet(xdir, partition_cols=["part"])
            part_dirs = sorted(glob.glob(os.path.join(xdir, "part=*")))

            @ray.remote
            def _verify_dir(d: str, part_val: int):
                import pyarrow.parquet as pq

                files = glob.glob(os.path.join(d, "*.parquet"))
                t = pa.concat_tables([pq.read_table(f) for f in files])
                t = t.append_column(
                    "part", pa.array(np.full(len(t), part_val, dtype=np.int64))
                )
                pairs, rep_idx, sorted_part = verify_partition_table(t, cfg)
                reps = (
                    sorted_part.take(pa.array(rep_idx))
                    if len(rep_idx)
                    else sorted_part.slice(0, 0)
                )
                return pairs, reps

            futs = [
                _verify_dir.remote(d, int(os.path.basename(d).split("=")[1]))
                for d in part_dirs
            ]
            results = ray.get(futs)
        finally:
            shutil.rmtree(xdir, ignore_errors=True)

        pair_tables = [p for p, _ in results if len(p)]
        rep_tables = [r for _, r in results if len(r)]
        # representative round: tiny (one row per salted subgroup) →
        # resolved right here with the same multi-group kernel
        if rep_tables:
            reps = pa.concat_tables(rep_tables)
            rep_pairs, _, _ = verify_partition_table(
                reps, cfg, key_col="orig_key", rank_filter=False
            )
            if len(rep_pairs):
                pair_tables.append(rep_pairs)
        import ray.data as rd

        if not pair_tables:
            from deduplidog_ray.stages.verify import PAIRS_EMPTY

            return rd.from_arrow(PAIRS_EMPTY)
        return rd.from_arrow(pa.concat_tables(pair_tables))

    def _pairs_skinny_exchange(
        self, sig_ds: ray.data.Dataset, exploded: ray.data.Dataset
    ) -> ray.data.Dataset:
        """Two-exchange keys-only candidate routing (stages/pairgen.py).

        Band rows ship ~40 B (vs ~450 B with the payload exchange); the
        verify payload ships exactly ONCE into a plasma store that every
        verify task maps zero-copy. Segment-level routing by member-set
        hash collapses the ~20x duplicate-pair generation of near-identical
        families before any pair is built — the job the rank filter did in
        the payload design, without payload in the exchange.
        """
        import glob
        import shutil
        import uuid

        from deduplidog_ray.stages.pairgen import REP_SCHEMA, STORE_COLUMNS

        cfg = self.cfg
        run_id = uuid.uuid4().hex[:8]
        base = self._exchange_base()
        x1 = os.path.join(base, f"x1-{run_id}")
        x2 = os.path.join(base, f"x2-{run_id}")

        # payload store: ONE sorted plasma object; built concurrently with
        # the exchange-1 write. A materialized sig table hands over its
        # existing block refs with no execution at all (the column select
        # happens inside the store task, zero-copy on-node); the
        # checkpoint-read path still needs one projected pass. At
        # per-node-RAM-exceeding corpus sizes, shard by clip_h % S and
        # route pair chunks per shard.
        t0 = time.monotonic()
        from ray.data.dataset import MaterializedDataset

        if isinstance(sig_ds, MaterializedDataset):
            payload_refs = sig_ds.to_arrow_refs()   # blocks already exist
        else:

            def _sel(t: pa.Table) -> pa.Table:
                return t.select(
                    [c for c in STORE_COLUMNS if c in t.column_names]
                )

            payload_refs = sig_ds.map_batches(
                _sel, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        store_ref = _build_store_task.remote(payload_refs, cfg.signature.num_perm)
        self._store_ref = store_ref
        self.metrics["sec_store_launch"] = round(time.monotonic() - t0, 2)

        try:
            t1 = time.monotonic()
            exploded.write_parquet(x1, partition_cols=["part"])
            self.metrics["sec_x1_write"] = round(time.monotonic() - t1, 2)
            t1 = time.monotonic()
            part_dirs = sorted(glob.glob(os.path.join(x1, "part=*")))
            seg_futs = [_seg_task.remote(d, x2, i, cfg) for i, d in enumerate(part_dirs)]
            seg_out = ray.get(seg_futs)
            rep_tables = [r for r, _ in seg_out if len(r)]
            self.metrics["seg_member_rows"] = int(sum(n for _, n in seg_out))
            self.metrics["sec_seg"] = round(time.monotonic() - t1, 2)

            t1 = time.monotonic()
            q_dirs = sorted(glob.glob(os.path.join(x2, "q=*")))
            vfuts = [_verify_q_task.remote(d, store_ref, cfg) for d in q_dirs]
            pair_tables = [p for p in ray.get(vfuts) if len(p)]
            self.metrics["sec_qverify"] = round(time.monotonic() - t1, 2)

            t1 = time.monotonic()
            if rep_tables:
                reps = pa.concat_tables(rep_tables)
                rp = ray.get(_rep_round_task.remote(reps, store_ref, cfg))
                if len(rp):
                    pair_tables.append(rp)
            else:
                reps = REP_SCHEMA.empty_table()
            self.metrics["sec_rep_round"] = round(time.monotonic() - t1, 2)
        finally:
            shutil.rmtree(x1, ignore_errors=True)
            shutil.rmtree(x2, ignore_errors=True)

        import ray.data as rd

        from deduplidog_ray.stages.verify import PAIRS_EMPTY

        if not pair_tables:
            return rd.from_arrow(PAIRS_EMPTY)
        allp = pa.concat_tables(pair_tables).combine_chunks()
        # a pair contained in two OVERLAPPING (non-identical) segments can
        # verify in two q-partitions — identical rows; drop duplicates on
        # the (small) verified stream
        df = allp.to_pandas().drop_duplicates(["a", "b"], ignore_index=True)
        return rd.from_arrow(pa.Table.from_pandas(df, schema=allp.schema,
                                                  preserve_index=False))

    def _exact_contain_filter(
        self, sig_ds: ray.data.Dataset, pairs_ds: ray.data.Dataset
    ) -> ray.data.Dataset:
        """Suffix-array substring confirmation of the contained-clip axis
        (north rule; ≙ the shrunk/partial-copy case, docs/index.md:20-22).

        The verify kernel's ``contain`` reason is a minhash containment
        ESTIMATE (stages/verify.py). With ``match.exact_containment`` on,
        every contain-reason pair must additionally be an exact transcript
        substring, confirmed by one generalized suffix array
        (stages/suffixes.py) over ONLY the transcripts of clips appearing
        in contain pairs — fetched with a broadcast id-set semi-join
        (bytes shipped ∝ contain pairs, never the corpus). Estimate-only
        pairs are dropped. Scale note: the pair stream is the pipeline's
        small artifact by design (SURVEY.md §7), so this runs where the
        pairs already live; shard the GSA by pair-graph component if a
        pathological corpus ever concentrates transcripts past node RAM.
        """
        tables = [t for t in ray.get(pairs_ds.to_arrow_refs()) if len(t)]
        if not tables:
            return pairs_ds
        import ray.data as rd

        allp = pa.concat_tables(tables).combine_chunks()
        reason = allp["reason"].to_numpy(zero_copy_only=False)
        cmask = reason == "contain"
        self.metrics["contain_pairs_checked"] = int(cmask.sum())
        if not cmask.any():
            return rd.from_arrow(allp)
        aa = allp["a"].to_numpy(zero_copy_only=False)[cmask]
        bb = allp["b"].to_numpy(zero_copy_only=False)[cmask]
        need_ref = ray.put(pa.array(sorted(set(aa) | set(bb)), type=pa.string()))

        def _fetch(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = ray.get(need_ref)
            return t.select(["clip_id", "norm_transcript"]).filter(
                pc.is_in(t["clip_id"], value_set=ids)
            )

        texts_tbl = (
            sig_ds.map_batches(_fetch, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
            .drop_duplicates("clip_id")
        )
        from deduplidog_ray.stages.suffixes import exact_containment_mask

        keep_contain = exact_containment_mask(
            aa, bb,
            texts_tbl["clip_id"].tolist(),
            texts_tbl["norm_transcript"].tolist(),
        )
        self.metrics["contain_pairs_dropped"] = int((~keep_contain).sum())
        final = ~cmask
        final[np.nonzero(cmask)[0][keep_contain]] = True
        return rd.from_arrow(allp.filter(pa.array(final)))

    # ------------------------------------------------------------ stage 3
    def cluster(
        self, pairs_ds: ray.data.Dataset
    ) -> tuple[dict[str, str], dict[str, list[str]]]:
        """Stream the pair table into a DSU → (clip→cluster, clip→reasons).

        Pairs, not rows, concentrate on the driver (SURVEY.md §7); the
        upgrade path for a pair set beyond driver RAM is partitioned DSU
        forests (state/unionfind.py docstring).
        """
        tables = [t for t in ray.get(pairs_ds.to_arrow_refs()) if len(t)]
        self.metrics["verified_pairs"] = int(sum(len(t) for t in tables))
        if not tables:
            return {}, {}
        import pandas as pd

        allp = pa.concat_tables(tables).combine_chunks()
        aa = allp["a"].to_numpy(zero_copy_only=False)
        bb = allp["b"].to_numpy(zero_copy_only=False)
        rr = allp["reason"].to_numpy(zero_copy_only=False)

        # vectorized connected components: factorize members to int codes,
        # min-label propagation with pointer jumping until fixpoint —
        # replaces the per-pair Python DSU loop (~1.5 s serial at 92k
        # pairs). Deterministic: the final label is the component minimum
        # regardless of pair order (same invariant as UnionFind).
        codes, uniq = pd.factorize(np.concatenate([aa, bb]))
        n_pairs = len(aa)
        ca = codes[:n_pairs].astype(np.int64)
        cb = codes[n_pairs:].astype(np.int64)
        lab = np.arange(len(uniq), dtype=np.int64)
        while True:
            old = lab
            m = np.minimum(lab[ca], lab[cb])
            lab = lab.copy()
            np.minimum.at(lab, ca, m)
            np.minimum.at(lab, cb, m)
            lab = np.minimum(lab, lab[lab])      # pointer jump
            lab = np.minimum(lab, lab[lab])
            if np.array_equal(lab, old):
                break
        # cluster id = lexicographically smallest member STRING of the
        # component (codes are first-appearance-ordered, not lexicographic).
        # argsort + first-occurrence-per-label: a pandas
        # groupby().transform("min") over these many tiny string groups
        # measured ~5 s; this is ~0.2 s.
        order = np.argsort(uniq)
        lab_sorted = lab[order]
        first = ~pd.Series(lab_sorted).duplicated().to_numpy()
        rep_arr = np.empty(len(uniq), dtype=object)
        rep_arr[lab_sorted[first]] = uniq[order][first]
        cid = rep_arr[lab]
        clusters = dict(zip(uniq.tolist(), cid.tolist()))

        # reasons: plain dict-of-sets loop — measured 4x faster than a
        # pandas groupby+agg(list) over this many tiny groups
        rsets: dict[str, set] = {}
        for a, b, r in zip(aa, bb, rr):
            rsets.setdefault(a, set()).add(r)
            rsets.setdefault(b, set()).add(r)
        reasons = {k: sorted(v) for k, v in rsets.items()}
        return clusters, reasons

    # ------------------------------------------------------------ stage 4
    def results(
        self,
        sig_ds: ray.data.Dataset,
        clusters: dict[str, str],
        reasons: dict[str, list[str]],
    ) -> ray.data.Dataset:
        """Attach cluster ids; canonicalize clustered rows; pass singletons.

        Two physical plans with identical semantics:
        - clustered-row count <= ~2M (always true in the sandbox; true at
          scale when the duplicate fraction is modest): canonicalization
          runs ON THE DRIVER over the collected policy columns (a few MB)
          and the results are ONE broadcast map_batches — no shuffle, no
          union, no extra barriers.
        - beyond that: only clustered rows (5 small policy columns) enter a
          groupby(hash(cluster_id)) shuffle; singletons never shuffle.
        """
        cfg = self.cfg
        if 0 < len(clusters) <= cfg.execution.driver_results_max:
            return self._results_driver_path(sig_ds, clusters, reasons)
        import pandas as pd

        cluster_df = pd.DataFrame(
            {"clip_id": list(clusters), "cluster_id": list(clusters.values())}
        )
        clusters_ref = ray.put(
            (pa.array(cluster_df["clip_id"], type=pa.string()), cluster_df)
        )

        def _split(t: pa.Table, want_clustered: bool) -> pa.Table:
            # broadcast-frame probe: Arrow is_in for membership, one pandas
            # hash-merge for the cluster-id attach — no per-row Python
            import pyarrow.compute as pc

            id_set, cl = ray.get(clusters_ref)
            mask = pc.is_in(t["clip_id"], value_set=id_set)
            out = t.filter(mask if want_clustered else pc.invert(mask))
            if want_clustered:
                left = pd.DataFrame({"clip_id": out["clip_id"].to_pylist()})
                cid = left.merge(cl, on="clip_id", how="left")[
                    "cluster_id"
                ].tolist()
                out = out.append_column("cluster_id", pa.array(cid, type=pa.string()))
                from deduplidog_ray.stages.hashing import hash_strings_u64

                cpart = (
                    hash_strings_u64(cid, seed=0xCA20)
                    % np.uint64(cfg.execution.verify_partitions)
                ).astype(np.int64)
                out = out.append_column("_cpart", pa.array(cpart))
            return out

        policy_cols = ["clip_id", "cluster_id", "_cpart", "n_bytes", "dur_ms"]
        has_role = "role" in sig_ds.schema().names
        if has_role:
            policy_cols.append("role")

        clustered = sig_ds.map_batches(
            lambda t: _split(t, True).select(policy_cols),
            batch_format="pyarrow",
        )
        # one vectorized UDF per cluster-id HASH PARTITION (never per
        # cluster — same dispatch-count rationale as the band shuffle)
        canon = clustered.groupby("_cpart").map_groups(
            make_canonicalizer(cfg.canonical, reasons), batch_format="pandas"
        )
        # normalize to Arrow blocks so the union with the (Arrow) singleton
        # branch doesn't mix block types (iter_batches asserts homogeneity)
        from deduplidog_ray.schema import RESULT_SCHEMA

        canon = canon.map_batches(
            lambda t: t.select(RESULT_SCHEMA.names).cast(RESULT_SCHEMA),
            batch_format="pyarrow",
        )

        def _singleton_results(t: pa.Table) -> pa.Table:
            from deduplidog_ray.schema import singleton_results_block

            return singleton_results_block(_split(t, False))

        singles = sig_ds.map_batches(_singleton_results, batch_format="pyarrow")
        out = canon.union(singles)
        if cfg.canonical.invert_selection:
            # ≙ invert_selection (deduplidog.py:513-516): only the rows that
            # matched NOTHING
            import pyarrow.compute as pc

            out = out.map_batches(
                lambda t: t.filter(pc.equal(t["action"], "keep")),
                batch_format="pyarrow",
            )
        return out

    def _results_driver_path(
        self,
        sig_ds: ray.data.Dataset,
        clusters: dict[str, str],
        reasons: dict[str, list[str]],
    ) -> ray.data.Dataset:
        """Small-cluster-set fast path: canonicalize on the driver, emit
        results in one broadcast map pass (see ``results`` docstring)."""
        cfg = self.cfg
        from deduplidog_ray.schema import RESULT_SCHEMA

        clustered_ids = pa.array(sorted(clusters), type=pa.string())
        clusters_ref = ray.put(clustered_ids)

        # canonicalization runs in ONE off-driver task, concurrently with
        # the singleton pass below (the driver only holds the result ref —
        # the policy blocks never surface on the driver at all). When the
        # skinny exchange ran, its payload store already holds the policy
        # columns for every clip — read the clustered rows from it instead
        # of a second full pass over the signature table (that pass was a
        # ~5 s fixed barrier that scaled 1.2x at 4x CPUs).
        if self._store_ref is not None:
            canon_ref = _canonicalize_from_store_task.remote(
                self._store_ref, clusters, reasons, cfg.canonical
            )
        else:

            def _collect_policy(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                cl = ray.get(clusters_ref)        # plasma-local Arrow array
                cols = ["clip_id", "n_bytes", "dur_ms"]
                if "role" in t.column_names:
                    cols.append("role")
                return t.select(cols).filter(
                    pc.is_in(t["clip_id"], value_set=cl)
                )

            policy_refs = sig_ds.map_batches(
                _collect_policy, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
            canon_ref = _canonicalize_task.remote(
                policy_refs, clusters, reasons, cfg.canonical
            )

        def _singles(t: pa.Table) -> pa.Table:
            # clustered rows already materialized driver-side (canon_tbl);
            # here only the singleton complement streams — one Arrow C++
            # anti-semi filter per batch, no per-row Python, no joins
            import pyarrow.compute as pc

            from deduplidog_ray.schema import singleton_results_block

            cl = ray.get(clusters_ref)
            return singleton_results_block(
                t.filter(pc.invert(pc.is_in(t["clip_id"], value_set=cl)))
            )

        import ray.data as rd

        singles = sig_ds.map_batches(
            _singles, batch_format="pyarrow", batch_size=16384,
            zero_copy_batch=True,
        )
        out = rd.from_arrow_refs([canon_ref]).union(singles)
        if cfg.canonical.invert_selection:
            import pyarrow.compute as pc

            out = out.map_batches(
                lambda t: t.filter(pc.equal(t["action"], "keep")),
                batch_format="pyarrow",
            )
        return out

    # ----------------------------------------------------------- end2end
    def _read_input(self, path: str) -> ray.data.Dataset:
        """Read the clips table with a sane block layout.

        Small inputs (< ~2 GB) are split to ~3 blocks per core so every
        stage parallelizes. Larger inputs target ~128 MB read splits
        (the classic exchange/split size): Ray's default derives read
        parallelism from the FILE count, so a 7.6 GB table in 16 fat
        files would decompress on only 16 cores no matter the cluster
        width — measured as the signature phase's scaling cap. The rule
        grows with bytes, so at 100 TB it converges to Ray's own layout
        instead of fighting it.
        """
        import os

        frags = list_fragments(path)
        total = sum(os.path.getsize(f) for f in frags if os.path.exists(f))
        avail = int(ray.cluster_resources().get("CPU", 8))
        if len(frags) >= avail * 2:
            # the file layout alone keeps every core busy: pin EXACTLY one
            # block per file. Leaving parallelism to Ray auto-inserts a
            # SplitBlocks op (its block-count target is ~200) between
            # ReadParquet and the decode map_batches, breaking their
            # fusion — the raw ``bytes`` column then round-trips the
            # object store (measured: 2.3 GB of plasma traffic and a
            # separate 19 s read operator at 52k clips; 17 GB at 416k).
            return read_fragments(frags, override_num_blocks=len(frags))
        if total < 2 << 30:
            return read_fragments(frags, override_num_blocks=avail * 3)
        want = max(avail * 2, total // (128 << 20))
        return read_fragments(frags, override_num_blocks=int(want))

    def _pairs_checkpointed(self, sig_ds: ray.data.Dataset) -> ray.data.Dataset:
        """Verified-pair (cluster state) checkpoint — the second lineage
        stage the north rule names: a killed job that finished the band
        shuffle resumes from the pair table without re-shuffling."""
        assert self.ckpt is not None
        # pairs lineage = the signature checkpoint files feeding this run;
        # recomputed signatures (new input / config) invalidate the pairs
        sig_hash = self.ckpt.fragments_hash(self.ckpt.stage_files("signatures"))
        if self.ckpt.is_done("pairs", 0, sig_hash):
            files = self.ckpt.stage_files("pairs")
            if files:                      # manifest entry with deleted files
                import ray.data as rd      # → fall through and recompute

                return rd.read_parquet(files)
        t0 = time.monotonic()
        pairs_ds = self.pairs(sig_ds)
        # the pair table is small (pairs, not rows) → one partition
        self.ckpt.write_partition("pairs", 0, pairs_ds, ["<signatures>"], t0,
                                  input_hash=sig_hash)
        import ray.data as rd

        return rd.read_parquet(self.ckpt.stage_files("pairs"))

    def run(
        self, clips: ray.data.Dataset | str, partitions: int | None = None
    ) -> ray.data.Dataset:
        self._store_ref = None            # never reuse across runs
        if isinstance(clips, str) and self.ckpt is not None:
            sig_ds = self.signatures_checkpointed(clips, partitions)
        else:
            if isinstance(clips, str):
                clips = self._read_input(clips)
            # no checkpoint → pin the (bytes-free) signature table so the
            # two candidate passes don't recompute decode twice
            t0 = time.monotonic()
            sig_ds = self.signatures(clips).materialize()
            self.metrics["sec_signatures"] = round(time.monotonic() - t0, 2)
        t1 = time.monotonic()
        if self.ckpt is not None:
            pairs_ds = self._pairs_checkpointed(sig_ds)
        else:
            pairs_ds = self.pairs(sig_ds)
        self.metrics["sec_hot_pass"] = round(time.monotonic() - t1, 2)
        if self.cfg.match.exact_containment:
            pairs_ds = self._exact_contain_filter(sig_ds, pairs_ds)
        t2 = time.monotonic()
        clusters, reasons = self.cluster(pairs_ds)
        self.metrics["sec_verify_cluster"] = round(time.monotonic() - t2, 2)
        t3 = time.monotonic()
        out = self.results(sig_ds, clusters, reasons)
        self.metrics["sec_results_build"] = round(time.monotonic() - t3, 2)
        return out


# ---------------------------------------------------------------- skinny
# exchange remote tasks (module scope so Ray pickles the function once)

@ray.remote
def _canonicalize_task(
    policy_refs: list, clusters: dict, reasons: dict, policy_cfg
) -> pa.Table:
    """Driver-path canonicalization, off-driver: merges the collected
    policy blocks (zero-copy plasma reads), attaches cluster ids, runs the
    vectorized canonicalizer and returns the RESULT_SCHEMA table. Runs
    concurrently with the singleton pass that streams the complement."""
    from deduplidog_ray.schema import RESULT_SCHEMA
    from deduplidog_ray.stages.canonical import make_canonicalizer

    tables = [t for t in ray.get(policy_refs) if len(t)]
    if not tables:
        return RESULT_SCHEMA.empty_table()
    policy = pa.concat_tables(tables).combine_chunks().to_pandas()
    policy["cluster_id"] = policy["clip_id"].map(clusters)
    canon_df = make_canonicalizer(policy_cfg, reasons)(policy)
    return pa.table(
        {
            "clip_id": pa.array(canon_df["clip_id"], type=pa.string()),
            "cluster_id": pa.array(canon_df["cluster_id"], type=pa.string()),
            "is_canonical": pa.array(
                canon_df["is_canonical"].astype(bool), type=pa.bool_()
            ),
            "action": pa.array(canon_df["action"], type=pa.string()),
            "reasons": pa.array(
                [list(r) for r in canon_df["reasons"]],
                type=pa.list_(pa.string()),
            ),
            "canonical_dur_ms": pa.array(
                canon_df["canonical_dur_ms"].astype("int32"), type=pa.int32()
            ),
        },
        schema=RESULT_SCHEMA,
    )


@ray.remote
def _canonicalize_from_store_task(
    store: dict, clusters: dict, reasons: dict, policy_cfg
) -> pa.Table:
    """Driver-path canonicalization fed by the skinny exchange's payload
    store (zero-copy plasma): the clustered clips' policy columns are
    looked up by (clip_h, clip_id) instead of re-scanning the signature
    table. Semantics identical to ``_canonicalize_task``."""
    import pandas as pd

    from deduplidog_ray.schema import RESULT_SCHEMA
    from deduplidog_ray.stages.canonical import make_canonicalizer
    from deduplidog_ray.stages.hashing import hash_strings_u64
    from deduplidog_ray.stages.pairgen import CLIP_H_SEED, store_lookup

    if not clusters:
        return RESULT_SCHEMA.empty_table()
    ids = np.asarray(list(clusters), dtype=object)
    ch = hash_strings_u64(ids.tolist(), seed=CLIP_H_SEED)
    pos, ok = store_lookup(store, ch, ids)
    if not ok.all():                      # pragma: no cover — clustered
        missing = ids[~ok][:3]            # clips always entered the store
        raise RuntimeError(f"clips missing from payload store: {missing}")
    policy = pd.DataFrame(
        {
            "clip_id": ids,
            "cluster_id": np.asarray(list(clusters.values()), dtype=object),
            "n_bytes": store["n_bytes"][pos],
            "dur_ms": store["dur_ms"][pos],
        }
    )
    if "role_codes" in store:
        lut = np.asarray(store["role_dict"] + [None], dtype=object)
        policy["role"] = lut[store["role_codes"][pos]]
    canon_df = make_canonicalizer(policy_cfg, reasons)(policy)
    return pa.table(
        {
            "clip_id": pa.array(canon_df["clip_id"], type=pa.string()),
            "cluster_id": pa.array(canon_df["cluster_id"], type=pa.string()),
            "is_canonical": pa.array(
                canon_df["is_canonical"].astype(bool), type=pa.bool_()
            ),
            "action": pa.array(canon_df["action"], type=pa.string()),
            "reasons": pa.array(
                [list(r) for r in canon_df["reasons"]],
                type=pa.list_(pa.string()),
            ),
            "canonical_dur_ms": pa.array(
                canon_df["canonical_dur_ms"].astype("int32"), type=pa.int32()
            ),
        },
        schema=RESULT_SCHEMA,
    )


@ray.remote
def _build_store_task(block_refs: list, num_perm: int) -> dict:
    from deduplidog_ray.stages.pairgen import STORE_COLUMNS, build_payload_store

    tables = ray.get(block_refs)          # zero-copy plasma reads
    tables = [
        t.select([c for c in STORE_COLUMNS if c in t.column_names])
        for t in tables
        if len(t)
    ]
    return build_payload_store(tables, num_perm)


@ray.remote
def _seg_task(part_dir: str, x2: str, tag: int, cfg: DedupConfig):
    """Exchange-1 reducer: band rows of one partition → member rows hive-
    written by q (exchange 2) + rep rows returned (tiny)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from deduplidog_ray.stages.pairgen import segments_from_band_rows

    files = _glob.glob(os.path.join(part_dir, "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    members, reps = segments_from_band_rows(t, cfg)
    n = len(members)
    if n:
        q = members["q"].to_numpy()
        order = np.argsort(q, kind="stable")
        members = members.take(pa.array(order)).drop_columns(["q"])
        q = q[order]
        starts = np.nonzero(np.concatenate([[True], q[1:] != q[:-1]]))[0]
        ends = np.concatenate([starts[1:], [n]])
        for s, e in zip(starts, ends):
            qdir = os.path.join(x2, f"q={int(q[s])}")
            os.makedirs(qdir, exist_ok=True)
            pq.write_table(
                members.slice(int(s), int(e - s)),
                os.path.join(qdir, f"part-{tag}.parquet"),
            )
    return reps, n


@ray.remote
def _verify_q_task(q_dir: str, store: dict, cfg: DedupConfig) -> pa.Table:
    import glob as _glob

    import pyarrow.parquet as pq

    from deduplidog_ray.stages.pairgen import pairs_from_member_rows

    files = _glob.glob(os.path.join(q_dir, "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return pairs_from_member_rows(t, store, cfg)


@ray.remote
def _rep_round_task(reps: pa.Table, store: dict, cfg: DedupConfig) -> pa.Table:
    from deduplidog_ray.stages.pairgen import rep_round_pairs

    return rep_round_pairs(reps, store, cfg)
