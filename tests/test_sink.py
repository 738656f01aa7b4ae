"""Resumable partitioned sink: commit markers, crash cleanup, resume skip."""

import os
import shutil

import numpy as np
import pandas as pd
import ray.data as rd

from pagerank_cuda_dynamic_ray.stages import sink


def _df(n=2000):
    rng = np.random.RandomState(6)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "x": rng.randint(0, 100, n)})


def test_write_read_roundtrip(tmp_path):
    df = _df()
    path = str(tmp_path / "out")
    res = sink.write_partitioned(rd.from_pandas(df), path, "doc_id", num_shards=8)
    assert res["written"] == list(range(8)) and res["skipped"] == []
    assert sink.completed_shards(path) == set(range(8))
    back = sink.read_partitioned(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["doc_id", "x"]], df)


def test_resume_skips_committed_and_rebuilds_partial(tmp_path):
    df = _df()
    path = str(tmp_path / "out")
    sink.write_partitioned(rd.from_pandas(df), path, "doc_id", num_shards=6)
    # simulate a crash: shard 2 lost its marker (partial), shard 4 intact
    os.remove(os.path.join(path, "__shard=2", sink.MARKER))
    # poison shard 2 with a stale duplicate file a naive append would keep
    stale = os.path.join(path, "__shard=2", "stale.parquet")
    rd.from_pandas(df.head(5)).to_pandas().to_parquet(stale)
    mtimes = {
        s: os.path.getmtime(os.path.join(path, f"__shard={s}", sink.MARKER))
        for s in (0, 1, 3, 4, 5)
    }
    res = sink.write_partitioned(rd.from_pandas(df), path, "doc_id", num_shards=6)
    assert res["written"] == [2] and res["skipped"] == [0, 1, 3, 4, 5]
    assert not os.path.exists(stale)  # partial dir rebuilt, not appended
    for s, m in mtimes.items():  # committed shards untouched
        assert os.path.getmtime(os.path.join(path, f"__shard={s}", sink.MARKER)) == m
    back = sink.read_partitioned(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["doc_id", "x"]], df)


def test_resume_false_rewrites_everything(tmp_path):
    df = _df(300)
    path = str(tmp_path / "out")
    sink.write_partitioned(rd.from_pandas(df), path, "doc_id", num_shards=4)
    res = sink.write_partitioned(
        rd.from_pandas(df), path, "doc_id", num_shards=4, resume=False
    )
    assert res["written"] == list(range(4)) and res["skipped"] == []
    back = sink.read_partitioned(path).to_pandas()
    assert len(back) == len(df)  # no duplication


def test_empty_shard_still_committed(tmp_path):
    # 3 rows into 5 shards -> some shards empty but all committed
    df = pd.DataFrame({"doc_id": np.array([0, 1, 2], dtype=np.int64)})
    path = str(tmp_path / "out")
    sink.write_partitioned(rd.from_pandas(df), path, "doc_id", num_shards=5)
    assert sink.completed_shards(path) == set(range(5))
    assert len(sink.read_partitioned(path).to_pandas()) == 3
