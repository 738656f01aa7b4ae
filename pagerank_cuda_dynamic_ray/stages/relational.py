"""Named relational scale patterns.

Two patterns the 100 TB playbook mandates, packaged as first-class
operators instead of ad-hoc inline code:

* ``broadcast_join`` — the small side ships ONCE through the object
  store (``ray.put``) and every block merges against it zero-shuffle;
  the alternative (``Dataset.join``) hash-shuffles BOTH sides. Use it
  whenever one side is dimension-table sized.
* ``salted_groupby_count`` — two-phase aggregation for skewed keys: a
  per-block combiner already collapses each block to one row per key,
  and an explicit salt splits a hot key's merge work across ``salt``
  reducers before a second (tiny) merge. With a handful of hot keys a
  plain groupby funnels every partial into one reducer; salting keeps
  the reduce fan-in balanced.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def broadcast_join(
    ds: rd.Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    suffix: str = "_r",
) -> rd.Dataset:
    """Join a Dataset against a driver-resident small table. The small
    side is broadcast once via ``ray.put`` and fetched zero-copy in
    every map task — no shuffle of the big side at all. ``how`` is
    'inner' or 'left' (the broadcast side is always the right side)."""
    assert how in ("inner", "left"), how
    ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how, suffixes=("", suffix))

    return ds.map_batches(merge, batch_format="pandas")


def salted_groupby_count(
    ds: rd.Dataset,
    key_col: str,
    salt: int = 8,
    weight_col: str | None = None,
) -> rd.Dataset:
    """Grouped count (or weighted sum) with explicit hot-key salting:
    phase 1 combines per block and routes each (key, block) partial to
    one of ``salt`` reducers by a per-block deterministic salt; phase 2
    merges the <= salt partials per key. Both phases' groupby inputs
    are (key-cardinality x salt)-bounded — raw rows never shuffle.
    Returns Dataset(key, n)."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        w = (t[weight_col].to_numpy().astype(np.int64)
             if weight_col else np.ones(len(keys), dtype=np.int64))
        df_ = pd.DataFrame({key_col: keys, "n": w})
        g = df_.groupby(key_col, sort=True)["n"].sum().reset_index()
        # deterministic per-partial salt: spread a hot key's partials
        # over `salt` reducers without any row-level randomness
        h = pd.util.hash_pandas_object(g[key_col], index=False).to_numpy()
        blk = np.int64(len(t))  # varies per block: decorrelates salts
        g["s"] = ((h + np.arange(len(g)) + blk) % salt).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def unsalt(t: pa.Table) -> pa.Table:
        return t.select([key_col, "sum(n)"]).rename_columns([key_col, "n"])

    phase1 = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "s"])
        .sum("n")
        .map_batches(unsalt, batch_format="pyarrow")
    )
    return (
        phase1.groupby(key_col).sum("n")
        .map_batches(lambda t: t.rename_columns([key_col, "n"]),
                     batch_format="pyarrow")
    )
