"""CLI job entry smoke: the ``ray job submit`` surface (run.py).

Runs ``python -m pagerank_cuda_dynamic_ray.run`` in a fresh subprocess
with NO ``RAY_ADDRESS`` (the standalone fallback owns a local session —
regression for the ConnectionError when no cluster is addressed), and
checks the contract: exit 0, one JSON status line, partitioned ranks
Parquet + metrics.json in the output dir, ranks summing to ~1."""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pads


def test_run_cli_standalone(tmp_path):
    from pagerank_cuda_dynamic_ray.sources import transcripts as T

    fixture = T.ensure_fixture("tiny")
    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    # a fresh local session inside the subprocess must not try to join
    # the pytest session's cluster
    env["RAY_JOB_CONFIG_JSON_ENV_VAR"] = ""
    env.pop("RAY_JOB_CONFIG_JSON_ENV_VAR")
    proc = subprocess.run(
        [sys.executable, "-m", "pagerank_cuda_dynamic_ray.run",
         "--input", fixture, "--output", out_dir,
         "--num-parts", "2", "--variants", "static", "--analytics",
         "--centrality", "--export-edges"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["output"] == out_dir

    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["static"]["iterations"] > 0
    assert metrics["edges"] > 0
    assert metrics["triangles"] >= 0

    ranks = pads.dataset(os.path.join(out_dir, "ranks_static")).to_table()
    assert ranks.num_rows > 0
    assert {"vid", "rank", "conv_id"} <= set(ranks.column_names)
    total = sum(ranks["rank"].to_pylist())
    assert abs(total - 1.0) < 1e-6
    comp = pads.dataset(os.path.join(out_dir, "components")).to_table()
    assert comp.num_rows == ranks.num_rows
    btw = pads.dataset(os.path.join(out_dir, "betweenness")).to_table()
    assert btw.num_rows == ranks.num_rows
    assert metrics["diameter_lower_bound"] >= 0
    edges = pads.dataset(os.path.join(out_dir, "edges")).to_table()
    assert edges.num_rows == metrics["edges_exported"] == metrics["edges"]
