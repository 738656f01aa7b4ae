"""Row-local reshape operators (pivot's inverse).

``unpivot`` (SQL UNPIVOT / pandas melt) is embarrassingly parallel —
each block melts independently inside ``map_batches``, no shuffle, so
it streams at any scale. The forward pivot is a grouped conditional
aggregation (see ``__ray_entry__._q_events_pivot``); this is its exact
inverse on the wide table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def unpivot(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_zero: bool = False,
) -> rd.Dataset:
    """Melt ``value_cols`` into (var_name, value_name) long rows, one
    output row per (input row, value column). ``drop_zero`` filters
    zero/null measures (the sparse long form a count pivot came from).
    Pure per-block transform: output rows = |block| × |value_cols|,
    no exchange."""

    def melt(df_: pd.DataFrame) -> pd.DataFrame:
        out = df_.melt(id_vars=id_cols, value_vars=value_cols,
                       var_name=var_name, value_name=value_name)
        if drop_zero:
            v = out[value_name].to_numpy()
            out = out[(v != 0) & ~pd.isna(v)]
        return out.reset_index(drop=True)

    return ds.map_batches(melt, batch_format="pandas")
