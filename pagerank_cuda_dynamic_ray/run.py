"""Job entry point: ``ray job submit -- python -m pagerank_cuda_dynamic_ray.run ...``

Runs the flagship pipeline (transcripts -> edge derivation -> shard pool
-> PageRank variants [-> CC/LP/triangles]) against a transcript Parquet
path and writes ranks + metrics as partitioned Parquet. Owns its Ray
session only when none exists (``ray job submit`` / driver-managed
sessions are respected).

Example::

    ray job submit --working-dir . -- python -m pagerank_cuda_dynamic_ray.run \
        --input /data/transcripts --output /tmp/out --num-parts 30 \
        --variants static,df,dfp --temporal --checkpoint-dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Ray-Data link-graph engine job")
    ap.add_argument("--input", required=True, help="transcript parquet path/dir")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--num-parts", type=int, default=0, help="0 = cpus-2")
    ap.add_argument("--variants", default="static", help="comma list: static,nd,df,dfp,dt")
    ap.add_argument("--temporal", action="store_true", help="90%% base + insertion batches")
    ap.add_argument("--num-batches", type=int, default=5)
    ap.add_argument("--batch-fraction", type=float, default=1e-3)
    ap.add_argument("--tolerance", type=float, default=1e-10)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument("--analytics", action="store_true", help="also run CC/LP/triangles")
    ap.add_argument("--centrality", action="store_true",
                    help="also run harmonic/betweenness/eccentricity samplers")
    ap.add_argument("--export-edges", action="store_true",
                    help="dump the live edge set as partitioned Parquet")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # attach to an existing cluster only when one is addressed
        # (RAY_ADDRESS set by `ray job submit` / the operator); otherwise
        # own a local session so standalone runs work out of the box
        addr = os.environ.get("RAY_ADDRESS")
        if addr:
            ray.init(address=addr)
        else:
            ray.init(include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from . import api
    from .options import PagerankOptions
    from .pipelines import analytics as A

    cpus = int(ray.cluster_resources().get("CPU", 4))
    P = args.num_parts or max(2, cpus - 2)
    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    opts = PagerankOptions(
        tolerance=args.tolerance,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every if args.checkpoint_dir else 0,
    )
    os.makedirs(args.output, exist_ok=True)
    metrics: dict = {"num_parts": P, "cpus": cpus, "input": args.input}

    def post_graph(ctx) -> None:
        """The optional per-graph outputs, shared by both paths (on the
        temporal path they run against the FINAL graph state — the full
        input — rebuilt once after the experiment)."""
        if args.analytics:
            A.connected_components(ctx).write_parquet(os.path.join(args.output, "components"))
            A.label_propagation(ctx).write_parquet(os.path.join(args.output, "labels"))
            tri, per = A.triangle_count(ctx)
            metrics["triangles"] = tri
            per.write_parquet(os.path.join(args.output, "triangles"))
        if args.centrality:
            A.harmonic_centrality(ctx).write_parquet(os.path.join(args.output, "harmonic"))
            A.betweenness_sample(ctx, num_seeds=4).write_parquet(
                os.path.join(args.output, "betweenness"))
            ecc = A.eccentricity_sample(ctx, num_seeds=4)
            metrics["diameter_lower_bound"] = int(
                max(ecc["eccentricity"].to_pylist(), default=0))
        if args.export_edges:
            metrics["edges_exported"] = ctx.export_edges_parquet(
                os.path.join(args.output, "edges"))

    t0 = time.perf_counter()
    if args.temporal:
        out = api.run_temporal_experiment(
            args.input, num_parts=P, variants=tuple(variants), options=opts,
            num_batches=args.num_batches, batch_fraction=args.batch_fraction,
            ranks_out_dir=args.output,
        )
        metrics["experiment"] = out
        if args.analytics or args.centrality or args.export_edges:
            ctx, _ = api.build_graph(args.input, num_parts=P)
            metrics["edges"] = ctx.num_edges()
            post_graph(ctx)
            ctx.shutdown()
    else:
        ctx, _ = api.build_graph(args.input, num_parts=P)
        metrics["edges"] = ctx.num_edges()
        # the dynamic variants are defined relative to a batch update
        # (--temporal); on a fresh graph their affected set is empty, so a
        # standalone run computes the static fixpoint ONCE and reuses it
        res = ctx.pagerank("static", options=opts, resume=bool(args.checkpoint_dir))
        for v in variants:
            metrics[v] = {
                "iterations": res.iterations,
                "time_s": round(res.time, 3),
                "linf": res.linf_delta,
                **({"note": "ran static: dynamic variants need --temporal"} if v != "static" else {}),
            }
            ctx.ranks_dataset(res.ranks).write_parquet(
                os.path.join(args.output, f"ranks_{v}")
            )
        post_graph(ctx)
        ctx.shutdown()
    metrics["total_s"] = round(time.perf_counter() - t0, 3)
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    print(json.dumps({"total_s": metrics["total_s"], "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
