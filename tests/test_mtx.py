"""MatrixMarket / temporal text sources (reference S1-S4 parity)."""

import numpy as np
import pytest

from pagerank_cuda_dynamic_ray.pipelines.graph import GraphContext
from pagerank_cuda_dynamic_ray.sources import mtx as M


def test_read_mtx_general_weighted(tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "4 4 5\n"
        "1 2 1.5\n"
        "2 3 2.0\n"
        "3 1 0.5\n"
        "4 4 1.0\n"
        "1 4 3.0\n"
    )
    ds, hdr = M.read_mtx(str(p))
    assert hdr == {"symmetric": False, "weighted": True, "complex": False, "rows": 4, "cols": 4, "nnz": 5}
    pdf = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(pdf) == 5
    assert pdf["src"].tolist() == [0, 0, 1, 2, 3]      # 0-indexed
    assert pdf["dst"].tolist() == [1, 3, 2, 0, 3]
    assert pdf.loc[0, "weight"] == 1.5


def test_read_mtx_symmetric_pattern(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 3\n"
        "2 1\n"
        "3 1\n"
        "3 3\n"
    )
    ds, hdr = M.read_mtx(str(p))
    assert hdr["symmetric"] and not hdr["weighted"]
    pdf = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    # both directions for off-diagonal, one for the diagonal
    assert [tuple(r) for r in pdf[["src", "dst"]].to_numpy()] == [
        (0, 1), (0, 2), (1, 0), (2, 0), (2, 2)
    ]


def test_read_temporal_text_preserves_order(tmp_path):
    p = tmp_path / "t.txt"
    rng = np.random.RandomState(0)
    edges = rng.randint(0, 50, size=(300, 2))
    p.write_text("".join(f"{u} {v}\n" for u, v in edges))
    ds = M.read_temporal_text(str(p))
    pdf = ds.to_pandas().sort_values("seq").reset_index(drop=True)
    assert len(pdf) == 300
    np.testing.assert_array_equal(pdf["src"].to_numpy(), edges[:, 0])
    np.testing.assert_array_equal(pdf["dst"].to_numpy(), edges[:, 1])
    assert pdf["seq"].tolist() == list(range(300))


def test_mtx_to_pagerank_end_to_end(tmp_path):
    """A reference user's MTX file runs through the whole engine."""
    rng = np.random.RandomState(5)
    n, m = 40, 200
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    p = tmp_path / "e.mtx"
    lines = [f"{u + 1} {v + 1} 1.0" for u, v in zip(src, dst)]
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        f"{n} {n} {m}\n" + "\n".join(lines) + "\n"
    )
    ds, hdr = M.read_mtx(str(p))
    pdf = ds.to_pandas()
    ctx = GraphContext(hdr["rows"], 3)
    ctx.ingest_pairs(pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64))
    ctx.finalize()
    res = ctx.pagerank("static")
    full = ctx.assemble(res.ranks)
    assert np.isclose(full.sum(), 1.0, atol=1e-9)
    from .oracle import pagerank_oracle

    want, _ = pagerank_oracle(src.astype(np.int64), dst.astype(np.int64), n)
    np.testing.assert_allclose(full, want, atol=1e-6)
    ctx.shutdown()


def test_read_mtx_complex_keeps_real_part(tmp_path):
    """complex coordinate files carry 4 body fields (i j re im); the
    real part becomes the weight. Regression: the 3-field filter
    silently rejected every body line (zero edges, no error)."""
    p = tmp_path / "c.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate complex general\n"
        "3 3 2\n"
        "1 2 1.5 -0.5\n"
        "2 3 2.0 0.25\n"
    )
    ds, hdr = M.read_mtx(str(p))
    pdf = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert hdr["nnz"] == 2 and hdr["complex"]
    assert pdf[["src", "dst"]].to_numpy().tolist() == [[0, 1], [1, 2]]
    assert pdf["weight"].tolist() == [1.5, 2.0]


def test_read_mtx_rejects_array_format(tmp_path):
    p = tmp_path / "a.mtx"
    p.write_text("%%MatrixMarket matrix array real general\n2 2\n1.0\n2.0\n3.0\n4.0\n")
    with pytest.raises(ValueError, match="coordinate"):
        M.read_mtx(str(p))


def test_csv_source_matches_parquet():
    # the CSV reader must yield the identical edge log as the Parquet
    # reader over the same logical table (ts int64 epoch-us round trip)
    import os
    import pandas as pd
    import pyarrow.parquet as pq

    from pagerank_cuda_dynamic_ray.sources import edges as E
    from pagerank_cuda_dynamic_ray.sources import transcripts as T

    path = T.ensure_fixture("tiny")
    pdf = pq.read_table(path).to_pandas()
    pdf["ts"] = pdf["ts"].astype("int64")  # epoch-us
    out = "/tmp/graft_csv_test_%d" % os.getpid()
    os.makedirs(out, exist_ok=True)
    pdf.to_csv(os.path.join(out, "part.csv"), index=False)

    a = E.edge_log(E.read_transcripts(path)).to_pandas()
    b = E.edge_log(E.read_transcripts_csv(out)).to_pandas()
    cols = list(a.columns)
    a = a.sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_jsonl_source_matches_parquet():
    # the JSONL reader must yield the identical edge log as the Parquet
    # reader over the same logical table (ts int64 epoch-us round trip)
    import os
    import pandas as pd
    import pyarrow.parquet as pq

    from pagerank_cuda_dynamic_ray.sources import edges as E
    from pagerank_cuda_dynamic_ray.sources import transcripts as T

    path = T.ensure_fixture("tiny")
    pdf = pq.read_table(path).to_pandas()
    pdf["ts"] = pdf["ts"].astype("int64")  # epoch-us
    out = "/tmp/graft_jsonl_test_%d" % os.getpid()
    os.makedirs(out, exist_ok=True)
    pdf.to_json(os.path.join(out, "part.jsonl"), orient="records", lines=True)

    a = E.edge_log(E.read_transcripts(path)).to_pandas()
    b = E.edge_log(E.read_transcripts_jsonl(out)).to_pandas()
    cols = list(a.columns)
    a = a.sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_csv_source_iso_timestamps():
    # ISO ts strings with AND without fractional seconds must both land
    # on timestamp[us] (pyarrow strptime lacks %f; the reader uses the
    # native cast)
    import os
    import pandas as pd

    from pagerank_cuda_dynamic_ray.sources import edges as E

    out = "/tmp/graft_csv_iso_%d" % os.getpid()
    os.makedirs(out, exist_ok=True)
    pd.DataFrame({
        "conv_id": ["c1", "c2"],
        "turn_idx": [0, 0],
        "text": ["see:c2", "hello"],
        "tool": ["", ""],
        "ts": ["2024-01-01T00:00:00", "2024-01-01T00:00:00.123456"],
    }).to_csv(os.path.join(out, "part.csv"), index=False)
    ts = E.read_transcripts_csv(os.path.join(out, "part.csv")).to_pandas()
    assert str(ts["ts"].dtype).startswith("datetime64")
    assert ts["ts"].iloc[1].microsecond == 123456
    log = E.edge_log(E.read_transcripts_csv(os.path.join(out, "part.csv"))).to_pandas()
    assert list(log["src"]) == ["c1"] and list(log["dst"]) == ["c2"]
