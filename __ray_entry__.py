"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (transcripts -> edge derivation ->
static PageRank on the shard actor pool) at sf0.001. ``queries()`` exposes
one callable per implemented operator/pipeline from SURVEY.md §2 (graph
family over the deterministic transcript fixture, relational family over
the driver's TPC-H-ish tables, training-data family over documents /
embeddings). ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query; iterative graph algorithms (PageRank variants, CC,
LP) and hash-randomized pipelines (MinHash/SimHash/LSH) are rows-only by
design.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pagerank_cuda_dynamic_ray import api
from pagerank_cuda_dynamic_ray.pipelines import analytics as A
from pagerank_cuda_dynamic_ray.sources import edges as E
from pagerank_cuda_dynamic_ray.sources import transcripts as T
from pagerank_cuda_dynamic_ray.stages import dedup as D
from pagerank_cuda_dynamic_ray.stages import multimodal as MM
from pagerank_cuda_dynamic_ray.stages import similarity as S
from pagerank_cuda_dynamic_ray.stages import text_stage as TS

NUM_PARTS = 8

# ----------------------------------------------------------------------
# caches (one graph build shared by all graph-family queries in a run)
# ----------------------------------------------------------------------

_CTX: dict[str, Any] = {}
_PR: dict[str, Any] = {}
_TRI: dict[str, Any] = {}


def _fixture(sf_dir: str) -> str:
    return T.ensure_fixture(T.scale_for_sf_dir(sf_dir))


def _graph(sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key not in _CTX:
        ctx, _ = api.build_graph(_fixture(sf_dir), num_parts=NUM_PARTS)
        _CTX[key] = ctx
    return _CTX[key]


def _pr(sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key not in _PR:
        ctx = _graph(sf_dir)
        res = ctx.pagerank("static")
        _PR[key] = ctx.ranks_dataset(res.ranks)
    return _PR[key]


def _tri(sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key not in _TRI:
        _TRI[key] = A.triangle_count(_graph(sf_dir))
    return _TRI[key]


def _rename(ds: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def _tbl(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# ----------------------------------------------------------------------
# entry
# ----------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline at sf0.001: transcripts -> edges -> vertex dict ->
    CSR shard pool -> static PageRank -> (conv_id, vid, rank) Dataset."""
    return _pr("/root/testdata/sf0.001")


# ----------------------------------------------------------------------
# graph-family queries (transcript fixture)
# ----------------------------------------------------------------------

def _q_edge_log(sf_dir: str):
    ts = E.read_transcripts(_fixture(sf_dir))
    return E.extract_edges(ts).select_columns(["src", "dst", "turn_idx"])


def _q_vertex_dictionary(sf_dir: str):
    d = _graph(sf_dir).dictionary
    return pa.table({"conv_id": pa.array(d), "vid": pa.array(np.arange(len(d), dtype=np.int64))})


def _q_out_degrees(sf_dir: str):
    ctx = _graph(sf_dir)
    dict_ref = ray.put(ctx.dictionary)

    def f(t: pa.Table) -> pa.Table:
        d = ray.get(dict_ref)
        return pa.table({"conv_id": pa.array(d[t["vid"].to_numpy()]), "outdeg": t["outdeg"]})

    return ctx.out_degrees().map_batches(f, batch_format="pyarrow")


def _q_self_loops(sf_dir: str):
    return pa.table({"self_loops": pa.array([_graph(sf_dir).count_self_loops()], pa.int64())})


def _q_triangle_total(sf_dir: str):
    total, _ = _tri(sf_dir)
    return pa.table({"triangles": pa.array([total], pa.int64())})


def _q_triangles_per_vertex(sf_dir: str):
    _, per_vertex = _tri(sf_dir)
    return per_vertex.select_columns(["conv_id", "triangles"])


def _q_pagerank_static(sf_dir: str):
    return _pr(sf_dir).select_columns(["conv_id", "rank"])


def _q_pagerank_top20(sf_dir: str):
    return (
        _pr(sf_dir)
        .sort(["rank", "conv_id"], descending=[True, False])
        .limit(20)
        .select_columns(["conv_id", "rank"])
    )


def _q_pagerank_dynamic(sf_dir: str):
    out = api.run_temporal_experiment(
        _fixture(sf_dir), num_parts=NUM_PARTS, num_batches=3, batch_fraction=1e-3
    )
    rows = []
    for bi, rec in enumerate(out["batches"]):
        for variant, r in rec.items():
            rows.append(
                {
                    "batch": bi,
                    "variant": variant,
                    "iterations": r["iterations"],
                    "l1_error_small": bool(r["l1_error"] < 1e-6),
                }
            )
    return pd.DataFrame(rows)


def _q_bfs_distances(sf_dir: str):
    ctx = _graph(sf_dir)
    return A.bfs_distances(ctx, 0).select_columns(["conv_id", "distance"])


def _q_modularity(sf_dir: str):
    ctx = _graph(sf_dir)
    A.label_propagation(ctx, max_iterations=10)
    q = A.modularity(ctx)
    return pa.table({"modularity": pa.array([q], pa.float64())})


def _q_connected_components(sf_dir: str):
    return A.connected_components(_graph(sf_dir)).select_columns(["conv_id", "component"])


def _q_label_propagation(sf_dir: str):
    return A.label_propagation(_graph(sf_dir), max_iterations=10).select_columns(["conv_id", "label"])


# ----------------------------------------------------------------------
# relational-family queries (TPC-H-ish driver tables)
# ----------------------------------------------------------------------

def _q_lineitem_agg(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(),
        Sum("l_quantity"),
        Min("l_extendedprice"),
        Max("l_extendedprice"),
    )
    return _rename(
        agg,
        {
            "count()": "n_rows",
            "sum(l_quantity)": "sum_qty",
            "min(l_extendedprice)": "min_price",
            "max(l_extendedprice)": "max_price",
        },
    )


def _q_top_customers(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _tbl(sf_dir, "orders", ["o_custkey"])
    agg = _rename(ds.groupby("o_custkey").aggregate(Count()), {"count()": "n_orders"})
    return agg.sort(["n_orders", "o_custkey"], descending=[True, False]).limit(10)


def _q_distinct_flags(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count())
        .select_columns(["l_returnflag", "l_linestatus"])
    )


def _q_events_summary(sf_dir: str):
    ds = _tbl(sf_dir, "events", ["event_type", "user_id", "value"])

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": np.array([len(g)], dtype=np.int64),
                "n_users": np.array([g["user_id"].nunique()], dtype=np.int64),
                "min_value": [g["value"].min()],
                "max_value": [g["value"].max()],
            }
        )

    return ds.groupby("event_type").map_groups(summarize, batch_format="pandas")


def _q_anti_join_users(sf_dir: str):
    """Users with a high-value purchase and no high-value error — the
    broadcast anti-join pattern (small side via ray.put, per-batch is_in
    instead of a shuffle join; SURVEY.md §2.6 set-difference)."""
    ds = _tbl(sf_dir, "events", ["user_id", "event_type", "value"])

    def high(t: pa.Table, etype: str) -> pa.Table:
        m = pc.and_(pc.equal(t["event_type"], etype), pc.greater(t["value"], 100.0))
        return t.filter(m).select(["user_id"])

    err_users = np.sort(
        np.unique(
            ds.map_batches(lambda t: high(t, "error"), batch_format="pyarrow")
            .to_pandas()["user_id"]
            .to_numpy()
        )
    )
    eref = ray.put(err_users)

    def f(t: pa.Table) -> pa.Table:
        u = high(t, "purchase")["user_id"].to_numpy()
        u = np.unique(u[~np.isin(u, ray.get(eref))])
        return pa.table({"user_id": pa.array(u, pa.int64())})

    pdf = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    u = np.unique(pdf["user_id"].to_numpy()) if len(pdf) else np.empty(0, np.int64)
    return pa.table({"user_id": pa.array(u, pa.int64())})


def _q_orders_by_segment(sf_dir: str):
    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    ds = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def annotate(t: pa.Table) -> pa.Table:
        seg = ray.get(seg_ref)
        s = np.array([seg[k] for k in t["o_custkey"].to_numpy()])
        return pa.table({"segment": pa.array(s), "o_totalprice": t["o_totalprice"]})

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "segment": [g["segment"].iloc[0]],
                "n_orders": np.array([len(g)], dtype=np.int64),
                "min_price": [g["o_totalprice"].min()],
                "max_price": [g["o_totalprice"].max()],
            }
        )

    return (
        ds.map_batches(annotate, batch_format="pyarrow")
        .groupby("segment")
        .map_groups(summarize, batch_format="pandas")
    )


# ----------------------------------------------------------------------
# training-data-family queries (documents / embeddings)
# ----------------------------------------------------------------------

def _q_exact_dedup(sf_dir: str):
    return D.exact_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]))


def _q_doc_tokens(sf_dir: str):
    ds = TS.analyze_documents(_tbl(sf_dir, "documents", ["doc_id", "text"]), with_fingerprint=False)
    return ds.select_columns(["doc_id", "n_chars", "n_tokens_ws", "n_tokens_bpe"])


def _q_doc_lang(sf_dir: str):
    ds = TS.analyze_documents(_tbl(sf_dir, "documents", ["doc_id", "text"]), with_fingerprint=False)
    return ds.select_columns(["doc_id", "lang"])


def _q_doc_quality(sf_dir: str):
    ds = TS.analyze_documents(_tbl(sf_dir, "documents", ["doc_id", "text"]), with_fingerprint=False)
    return ds.select_columns(["doc_id", "punct_ratio", "upper_ratio", "stop_ratio", "quality"])


def _q_doc_fingerprint(sf_dir: str):
    ds = TS.analyze_documents(_tbl(sf_dir, "documents", ["doc_id", "text"]), with_fingerprint=True)
    return ds.select_columns(["doc_id", "fingerprint"])


def _q_minhash_dedup(sf_dir: str):
    return D.minhash_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]), threshold=0.7)


def _q_simhash_dedup(sf_dir: str):
    return D.simhash_dedup(_tbl(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3)


def _q_embedding_neardup(sf_dir: str):
    # 0.45: the synthetic embeddings have no true near-dups (max off-diag
    # cosine ~0.51), so a lower threshold exercises the operator end-to-end.
    out = D.embedding_neardup_pairs(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.45
    )
    return pa.table(
        {
            "a": pa.array(out["a"].to_numpy().astype(np.int64) if len(out) else [], pa.int64()),
            "b": pa.array(out["b"].to_numpy().astype(np.int64) if len(out) else [], pa.int64()),
        }
    )


def _knn_queries(sf_dir: str) -> pd.DataFrame:
    pdf = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    return pdf.sort_values("vec_id").head(5).reset_index(drop=True)


def _q_knn_bruteforce(sf_dir: str):
    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = S.knn_bruteforce(emb, _knn_queries(sf_dir), k=10)
    out = out[["query_id", "neighbor_id", "rank"]].rename(columns={"rank": "knn_rank"})
    return out.astype({"query_id": np.int64, "neighbor_id": np.int64, "knn_rank": np.int64})


def _q_knn_lsh(sf_dir: str):
    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = S.knn_lsh(emb, _knn_queries(sf_dir), k=10, nbits=8, probes=2)
    out = out[["query_id", "neighbor_id", "rank"]].rename(columns={"rank": "knn_rank"})
    return out.astype({"query_id": np.int64, "neighbor_id": np.int64, "knn_rank": np.int64})


def _q_multimodal_decode(sf_dir: str):
    media = rd.from_arrow(MM.synth_media_table(256))
    return MM.decode_features(media, mode="fake", feature_dim=16)


def _q_frame_sample(sf_dir: str):
    media = rd.from_arrow(MM.synth_media_table(256))
    return MM.sample_frames(media, every_k=10, mode="fake").select_columns(
        ["media_id", "frame_idx"]
    )


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # graph family (SURVEY.md §2.1-2.4, §2.9)
        "edge_log": _q_edge_log,
        "vertex_dictionary": _q_vertex_dictionary,
        "out_degrees": _q_out_degrees,
        "self_loops": _q_self_loops,
        "triangle_total": _q_triangle_total,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "pagerank_static": _q_pagerank_static,
        "pagerank_top20": _q_pagerank_top20,
        "pagerank_dynamic": _q_pagerank_dynamic,
        "connected_components": _q_connected_components,
        "label_propagation": _q_label_propagation,
        "bfs_distances": _q_bfs_distances,
        "modularity": _q_modularity,
        # relational family (SURVEY.md §2.6)
        "lineitem_agg": _q_lineitem_agg,
        "top_customers": _q_top_customers,
        "distinct_flags": _q_distinct_flags,
        "events_summary": _q_events_summary,
        "anti_join_users": _q_anti_join_users,
        "orders_by_segment": _q_orders_by_segment,
        # training-data family
        "exact_dedup": _q_exact_dedup,
        "doc_tokens": _q_doc_tokens,
        "doc_lang": _q_doc_lang,
        "doc_quality": _q_doc_quality,
        "doc_fingerprint": _q_doc_fingerprint,
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "embedding_neardup": _q_embedding_neardup,
        "knn_bruteforce": _q_knn_bruteforce,
        "knn_lsh": _q_knn_lsh,
        "multimodal_decode": _q_multimodal_decode,
        "frame_sample": _q_frame_sample,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

_FX01 = T.fixture_path("sf0.01")

_GRAPH_CTE = f"""WITH tr AS (SELECT * FROM read_parquet('{_FX01}')),
raw_edges AS (SELECT conv_id AS src,
    coalesce(nullif(regexp_extract(tool, '^ref:([A-Za-z0-9_-]+)$', 1), ''),
             nullif(regexp_extract(text, 'see:([A-Za-z0-9_-]+)', 1), '')) AS dst,
    turn_idx FROM tr),
mention AS (SELECT src, dst, turn_idx FROM raw_edges WHERE dst IS NOT NULL),
ids AS (SELECT DISTINCT conv_id FROM (SELECT conv_id FROM tr UNION SELECT dst AS conv_id FROM mention)),
uedges AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM mention UNION SELECT conv_id, conv_id FROM ids)),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM uedges WHERE src <> dst)"""

_EN = "'the','and','of','to','a','in','is','it','that','for','was','with'"
_DE = "'der','die','das','und','ist','nicht','ein','eine','mit','für','auf'"
_FR = "'le','la','les','et','est','un','une','pour','dans','que','pas'"
_ES = "'el','la','los','las','es','un','una','para','que','no','con'"


def oracle_sql() -> dict[str, str]:
    T.ensure_fixture("sf0.01")  # the graph-family oracles read this path
    return {
        "edge_log": _GRAPH_CTE + "\nSELECT src, dst, turn_idx FROM mention",
        "vertex_dictionary": _GRAPH_CTE
        + "\nSELECT conv_id, CAST(row_number() OVER (ORDER BY conv_id) - 1 AS BIGINT) AS vid FROM ids",
        "out_degrees": _GRAPH_CTE
        + "\nSELECT src AS conv_id, count(*) AS outdeg FROM uedges GROUP BY src",
        "self_loops": _GRAPH_CTE
        + "\nSELECT count(*) AS self_loops FROM uedges WHERE src = dst",
        "triangle_total": _GRAPH_CTE
        + """
SELECT count(*) AS triangles
FROM und e1
JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b""",
        "triangles_per_vertex": _GRAPH_CTE
        + """,
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
corners AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT i.conv_id AS conv_id, CAST(coalesce(c.n, 0) AS BIGINT) AS triangles
FROM ids i LEFT JOIN (SELECT v, count(*) AS n FROM corners GROUP BY v) c ON c.v = i.conv_id""",
        "lineitem_agg": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top_customers": """
SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
ORDER BY n_orders DESC, o_custkey LIMIT 10""",
        "distinct_flags": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "events_summary": """
SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type""",
        "anti_join_users": """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND value > 100
  AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error' AND value > 100)""",
        "orders_by_segment": """
SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
       min(o.o_totalprice) AS min_price, max(o.o_totalprice) AS max_price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment""",
        "exact_dedup": "SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY text",
        "doc_tokens": r"""
SELECT doc_id, length(text) AS n_chars,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+')) AS BIGINT) AS n_tokens_bpe
FROM documents""",
        "doc_lang": f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS ws FROM documents),
h AS (SELECT doc_id,
        len(list_filter(ws, x -> x IN ({_DE}))) AS de,
        len(list_filter(ws, x -> x IN ({_EN}))) AS en,
        len(list_filter(ws, x -> x IN ({_ES}))) AS es,
        len(list_filter(ws, x -> x IN ({_FR}))) AS fr
      FROM w)
SELECT doc_id, CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
  WHEN de >= en AND de >= es AND de >= fr THEN 'de'
  WHEN en >= es AND en >= fr THEN 'en'
  WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang FROM h""",
        "doc_quality": rf"""
WITH f AS (SELECT doc_id, length(text) AS n_chars,
        len(regexp_extract_all(text, '\S+')) AS n_tok,
        len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
        len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
        len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'), x -> x IN ({_EN}))) AS n_stop
      FROM documents),
g AS (SELECT doc_id,
        n_punct / greatest(n_chars, 1) AS punct_ratio,
        n_upper / greatest(n_chars, 1) AS upper_ratio,
        n_stop / greatest(n_tok, 1) AS stop_ratio,
        (n_chars - greatest(n_tok - 1, 0)) / greatest(n_tok, 1) AS mean_token_len
      FROM f)
SELECT doc_id, punct_ratio, upper_ratio, stop_ratio,
       least(greatest(0.3 + 0.5 * stop_ratio - punct_ratio - greatest(mean_token_len - 12, 0) * 0.02, 0.0), 1.0) AS quality
FROM g""",
        "embedding_neardup": """
SELECT e1.vec_id AS a, e2.vec_id AS b
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.45""",
        "knn_bruteforce": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 5),
s AS (SELECT q.qid, e.vec_id AS nid, list_cosine_similarity(q.qe, e.embedding) AS cos
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) - 1 AS rk FROM s)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS BIGINT) AS knn_rank FROM r WHERE rk < 10""",
    }
