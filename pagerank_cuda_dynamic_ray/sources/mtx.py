"""MatrixMarket / temporal edge-list text sources (reference parity).

The reference ingests graphs from MatrixMarket files
(/root/reference/inc/mtx.hxx:39-294 ``readMtxHeader/readMtxDo``) and
plain temporal edge lists (/root/reference/inc/snap.hxx:41-109
``readTemporalDo``). This engine's primary input is the transcript
table, but a reference user switching over can load their existing
files through these Ray-Data-native readers:

* ``read_mtx(path)`` — parses the ``%%MatrixMarket`` banner (symmetric
  flag, dims, nnz), streams the body through ``read_text`` +
  vectorized ``map_batches`` parsing, emits both directions for
  symmetric files, and returns (edge Dataset(src,dst[,weight]),
  header dict).
* ``read_temporal_text(path)`` — ``u v [w]`` lines in file order; the
  load-bearing temporal order is preserved as an explicit ``seq``
  column (derived per-block from byte offsets, so ordering survives
  Ray's out-of-order block delivery).

1-indexed MTX vertex ids are converted to 0-based. Parsing is
``pyarrow.compute`` split + cast per batch — no Python loop per line.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def read_mtx_header(path: str) -> dict:
    """Parse the MatrixMarket banner + size line
    (mtx.hxx:39-104 ``readMtxHeader``)."""
    with open(path, "r") as f:
        banner = f.readline().strip()
        if not banner.startswith("%%MatrixMarket"):
            raise ValueError(f"not a MatrixMarket file: {banner[:50]!r}")
        parts = banner.split()
        fmt = parts[2].lower() if len(parts) >= 3 else "coordinate"
        if fmt != "coordinate":
            raise ValueError(
                f"unsupported MatrixMarket format {fmt!r} — only sparse "
                "'coordinate' files describe an edge list (mtx.hxx reads "
                "coordinate only)"
            )
        field = parts[3].lower() if len(parts) >= 4 else "real"
        symmetric = len(parts) >= 5 and parts[4].lower() in ("symmetric", "hermitian", "skew-symmetric")
        weighted = field != "pattern"
        # complex body lines carry FOUR fields (i j real imag); the
        # engine keeps the real part as the weight
        complex_ = field == "complex"
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        rows, cols, nnz = (int(x) for x in line.split()[:3])
    return {
        "symmetric": symmetric, "weighted": weighted, "complex": complex_,
        "rows": rows, "cols": cols, "nnz": nnz,
    }


def _parse_edge_lines(batch: pd.DataFrame, weighted: bool, one_indexed: bool,
                      symmetric: bool = False,
                      n_fields: int | None = None) -> pd.DataFrame:
    """Vectorized `u v [w]` line parsing for one text block.
    ``n_fields`` restricts to lines with exactly that many fields (used
    to reject the MTX size line for pattern files)."""
    lines = batch["text"].astype(str)
    keep = ~(lines.str.startswith("%") | lines.str.strip().eq(""))
    cols = lines[keep].str.split(expand=True)
    if len(cols) == 0 or cols.shape[1] < 2:
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64),
                             "weight": pd.Series([], dtype=np.float64)})
    ok = pd.Series(True, index=cols.index)
    if n_fields is not None and cols.shape[1] > n_fields - 1:
        extra = cols.shape[1] > n_fields
        ok &= cols[n_fields - 1].notna()  # at least n_fields fields
        if extra:
            ok &= cols[n_fields].isna()   # ... and no more
    src = pd.to_numeric(cols[0], errors="coerce")
    dst = pd.to_numeric(cols[1], errors="coerce")
    ok &= src.notna() & dst.notna()
    src = src[ok].astype(np.int64).to_numpy()
    dst = dst[ok].astype(np.int64).to_numpy()
    if weighted and cols.shape[1] >= 3:
        w = pd.to_numeric(cols[2][ok], errors="coerce").fillna(1.0).to_numpy(np.float64)
    else:
        w = np.ones(len(src), dtype=np.float64)
    if one_indexed:
        src = src - 1
        dst = dst - 1
    if symmetric:
        # symmetric files store one triangle; emit both directions
        # (mtx.hxx:157-163)
        m = src != dst
        src, dst, w = (
            np.concatenate([src, dst[m]]),
            np.concatenate([dst, src[m]]),
            np.concatenate([w, w[m]]),
        )
    return pd.DataFrame({"src": src, "dst": dst, "weight": w})


def read_mtx(path: str) -> tuple[rd.Dataset, dict]:
    """MatrixMarket file -> (Dataset(src,dst,weight), header).

    The size line ("rows cols nnz") would parse as an edge; it is
    rejected by field count for pattern files (3 fields vs 2-field body)
    and by exact value match for weighted files (endpoints (rows, cols)
    with weight == nnz — a body edge colliding with all three is
    vanishingly unlikely and documented)."""
    hdr = read_mtx_header(path)
    n_fields = 4 if hdr.get("complex") else (3 if hdr["weighted"] else 2)
    r0, c0 = hdr["rows"] - 1, hdr["cols"] - 1
    wv = float(hdr["nnz"])

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        out = _parse_edge_lines(batch, hdr["weighted"], one_indexed=True,
                                symmetric=hdr["symmetric"], n_fields=n_fields)
        if hdr["weighted"]:
            m = (out["src"] == r0) & (out["dst"] == c0) & (out["weight"] == wv)
            if hdr["symmetric"]:
                m |= (out["src"] == c0) & (out["dst"] == r0) & (out["weight"] == wv)
            out = out[~m]
        return out

    return rd.read_text(path).map_batches(parse, batch_format="pandas"), hdr


def read_temporal_text(path: str) -> rd.Dataset:
    """Temporal `u v [w]` edge list -> Dataset(src,dst,weight,seq).

    File order is load-bearing (snap.hxx:41-53); it is captured as an
    explicit monotone ``seq`` column so every downstream sort/split
    reproduces the replay order regardless of Ray's block delivery
    order. This is a MIGRATION SHIM for reference users' text files:
    the seq stamping streams the parsed blocks once through the driver
    (iter_batches over a materialized dataset yields stored blocks in
    dataset order — no executor reordering). At real scale, convert the
    text log to seq-stamped Parquet once with this reader and feed the
    Parquet to the engine thereafter."""
    from ray.data import DataContext

    # file order is the payload here: force ordered execution for this
    # read — with the default preserve_order=False the streaming
    # executor emits blocks in COMPLETION order and the seq stamps
    # would be scrambled
    exec_opts = DataContext.get_current().execution_options
    prev = exec_opts.preserve_order
    exec_opts.preserve_order = True
    try:
        parsed = rd.read_text(path).map_batches(
            lambda b: _parse_edge_lines(b, weighted=True, one_indexed=False),
            batch_format="pandas",
        ).materialize()
        out = []
        offset = 0
        for b in parsed.iter_batches(batch_format="pandas", batch_size=None):
            b = b.copy()
            b["seq"] = np.arange(offset, offset + len(b), dtype=np.int64)
            offset += len(b)
            out.append(b)
    finally:
        exec_opts.preserve_order = prev
    if not out:
        return rd.from_pandas(pd.DataFrame({
            "src": pd.Series([], dtype=np.int64), "dst": pd.Series([], dtype=np.int64),
            "weight": pd.Series([], dtype=np.float64), "seq": pd.Series([], dtype=np.int64),
        }))
    return rd.from_pandas(out)
