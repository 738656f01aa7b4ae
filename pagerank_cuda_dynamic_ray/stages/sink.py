"""Resumable partitioned-Parquet sink.

The 100 TB contract: output is split into a fixed number of hash
shards (one directory per shard, `__shard=K/`), each committed with a
`_SUCCESS` marker only after its files are fully written. A re-run
with ``resume=True``:

1. treats marker-bearing shards as done and prunes their rows at the
   READ (a map_batches filter — pruned rows never shuffle or write);
2. deletes any unmarked shard directory first (a crashed writer may
   have left partial files; appending to them would duplicate rows).

Shard assignment is splitmix64(key) % num_shards — a pure row
function, so a resumed run routes every row to the same shard as the
crashed one regardless of partitioning or cluster size.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import splitmix64

SHARD_COL = "__shard"
MARKER = "_SUCCESS"


def _shard_dir(path: str, s: int) -> str:
    return os.path.join(path, f"{SHARD_COL}={s}")


def completed_shards(path: str) -> set[int]:
    """Shards whose directory carries the commit marker."""
    done = set()
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith(f"{SHARD_COL}=") and os.path.exists(
                os.path.join(path, name, MARKER)
            ):
                done.add(int(name.split("=", 1)[1]))
    return done


def write_partitioned(
    ds: rd.Dataset,
    path: str,
    key_col: str,
    num_shards: int = 64,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as ``num_shards`` hash-sharded Parquet directories
    with per-shard commit markers; skip committed shards on resume.
    Returns {"written": [shards], "skipped": [shards]}."""
    done = completed_shards(path) if resume else set()
    if not resume and os.path.isdir(path):
        shutil.rmtree(path)
    # a crashed run's partial (unmarked) shard dirs must be rebuilt
    # from scratch, not appended to
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith(f"{SHARD_COL}="):
                s = int(name.split("=", 1)[1])
                if s not in done:
                    shutil.rmtree(os.path.join(path, name))

    done_arr = np.array(sorted(done), dtype=np.int64)

    def assign_and_prune(t: pa.Table) -> pa.Table:
        h = splitmix64(t[key_col].to_numpy().astype(np.uint64))
        shard = (h % np.uint64(num_shards)).astype(np.int64)
        t = t.append_column(SHARD_COL, pa.array(shard))
        if done_arr.size:
            keep = ~np.isin(shard, done_arr)
            t = t.filter(pa.array(keep))
        return t

    pending = ds.map_batches(assign_and_prune, batch_format="pyarrow")
    pending.write_parquet(path, partition_cols=[SHARD_COL])
    written = sorted(set(range(num_shards)) - done)
    for s in written:
        # hive-partitioned write emits no dir for an empty shard; an
        # empty committed shard is still a committed shard
        os.makedirs(_shard_dir(path, s), exist_ok=True)
        with open(os.path.join(_shard_dir(path, s), MARKER), "w"):
            pass
    return {"written": written, "skipped": sorted(done)}


def read_partitioned(path: str) -> rd.Dataset:
    """Read a sink directory back (the hive shard column is dropped;
    `_SUCCESS` markers are excluded from the file scan)."""
    ds = rd.read_parquet(path, file_extensions=["parquet"])
    names = ds.schema().names if ds.schema() is not None else []
    return ds.drop_columns([SHARD_COL]) if SHARD_COL in names else ds
