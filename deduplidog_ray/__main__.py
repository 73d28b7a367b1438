"""CLI entry point: ``python -m deduplidog_ray <command>``.

≙ the reference's CLI (``deduplidog`` console script →
deduplidog/__main__.py:8-36, a mininterface/tyro form over the config
dataclasses). Batch engine → argparse over the same semantic knobs; the
``inspect`` (dry-run) mode ≙ S5 (deduplidog.py:44-47) writes the results
table without applying any action.

This script OWNS its Ray session (CLI entry points and bench.py are the
only scripts allowed to call ray.init, per the driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    # keep polars' rayon pool at 1 thread in every Ray worker (children
    # inherit the env); Ray owns the parallelism
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    p = argparse.ArgumentParser(
        prog="deduplidog_ray",
        description="Ray-Data-native near-duplicate detection + clustering",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the near-dup pipeline")
    run.add_argument("--input", required=True, help="clips table (parquet dir / lance)")
    run.add_argument("--output", required=True, help="results parquet dir")
    run.add_argument("--workdir", default=None, help="checkpoint dir (enables resume)")
    run.add_argument("--partitions", type=int, default=None)
    run.add_argument("--num-cpus", type=int, default=None)
    run.add_argument("--apply", choices=["none", "keep-canonical", "annotate"],
                     default="none",
                     help="none = inspect/dry-run (results table only)")
    run.add_argument("--apply-output", default=None,
                     help="output dir for the applied dataset")
    # semantic knobs (subset; see config.py for all)
    run.add_argument("--shingle-k", type=int, default=3)
    run.add_argument("--num-perm", type=int, default=128)
    run.add_argument("--lsh-bands", type=int, default=16)
    run.add_argument("--lsh-rows", type=int, default=8)
    run.add_argument("--jaccard-threshold", type=float, default=0.7)
    run.add_argument("--simhash-hamming", type=int, default=3)
    run.add_argument("--dur-delta-ms", type=int, default=40)
    run.add_argument("--invert-selection", action="store_true",
                     help="output only rows that match nothing (anti mode)")
    run.add_argument("--action", choices=["flag", "drop", "replace", "link"],
                     default="flag")

    synth = sub.add_parser("synth", help="generate a synthetic clips corpus")
    synth.add_argument("--output", required=True)
    synth.add_argument("--clusters", type=int, default=12)
    synth.add_argument("--singletons", type=int, default=10)
    synth.add_argument("--seed", type=int, default=1234)
    synth.add_argument("--hot", type=int, default=0)

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from deduplidog_ray.fixtures import write_corpus

        golden = write_corpus(
            args.output,
            n_clusters=args.clusters,
            n_singletons=args.singletons,
            seed=args.seed,
            hot_cluster_size=args.hot,
        )
        print(json.dumps({"rows": len(golden), "path": args.output}))
        return 0

    # cmd == run
    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster — join
        # it (num_cpus is a local-mode knob only; passing it to an
        # existing cluster is an error). Standalone runs stay local.
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(
            address=addr,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if addr == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dataclasses import replace

    from deduplidog_ray.config import DedupConfig
    from deduplidog_ray.pipelines.dedup import NearDupPipeline

    cfg = DedupConfig()
    cfg = replace(
        cfg,
        signature=replace(
            cfg.signature,
            shingle_k=args.shingle_k,
            num_perm=args.num_perm,
            lsh_bands=args.lsh_bands,
            lsh_rows=args.lsh_rows,
            jaccard_threshold=args.jaccard_threshold,
            simhash_hamming=args.simhash_hamming,
        ),
        match=replace(cfg.match, dur_delta_ms=args.dur_delta_ms),
        canonical=replace(
            cfg.canonical,
            invert_selection=args.invert_selection,
            action=args.action,
        ),
    )
    pipe = NearDupPipeline(cfg, workdir=args.workdir)
    results = pipe.run(args.input, partitions=args.partitions)
    results = results.materialize()
    results.write_parquet(args.output)

    if args.apply != "none":
        if not args.apply_output:
            print("error: --apply requires --apply-output", file=sys.stderr)
            return 2
        from deduplidog_ray.pipelines.apply import annotate_actions, keep_canonical
        from deduplidog_ray.sources.clips_io import list_fragments, read_fragments

        clips = read_fragments(list_fragments(args.input))
        out = (
            keep_canonical(clips, results)
            if args.apply == "keep-canonical"
            else annotate_actions(clips, results)
        )
        out.write_parquet(args.apply_output)

    print(json.dumps({"rows": results.count(), "metrics": pipe.metrics,
                      "output": args.output}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
