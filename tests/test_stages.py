"""Training-data pipeline stages: dedup, similarity, text, multimodal."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pagerank_cuda_dynamic_ray.stages import dedup, multimodal, similarity, text_stage


def _docs(texts):
    return rd.from_pandas(pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))


def test_exact_dedup():
    texts = ["alpha beta", "gamma", "alpha beta", "delta", "gamma", "gamma"]
    out = dedup.exact_dedup(_docs(texts)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert dict(zip(out["doc_id"], out["n_dups"])) == {0: 2, 1: 3, 3: 1}


def test_minhash_dedup_finds_near_dups():
    # long doc so a one-word edit keeps shingle Jaccard ~0.8 — high
    # enough that 16x4 banding pairs them for any permutation seed
    base = " ".join(
        "the quick brown fox jumps over the lazy dog again and again".split() * 3
    )
    near = base.replace("lazy", "sleepy", 1)
    other = "completely different words about graph engines and arrow batches here now"
    out = dedup.minhash_dedup(_docs([base, near, other, base]), threshold=0.5).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[0] == cl[3] == 0          # exact dup clustered
    assert cl[1] == 0                   # near dup joins cluster
    assert cl[2] == 2                   # unrelated stays alone
    assert out[out["doc_id"] == 0]["keep"].item()
    assert not out[out["doc_id"] == 3]["keep"].item()


def test_ngram_jaccard_exact_vs_bruteforce():
    # prefix filtering is LOSSLESS: the distributed pipeline must return
    # exactly the all-pairs >= threshold set, jaccard values bit-equal
    rng = np.random.RandomState(3)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, 20)) for _ in range(30)]
    texts.append(texts[4].replace("tok", "kot", 1))      # near dup of 4
    texts.append(texts[10])                              # exact dup of 10
    out = dedup.ngram_jaccard_pairs(_docs(texts), threshold=0.5)

    from pagerank_cuda_dynamic_ray.stages.dedup import _word_shingles
    sh = _word_shingles(texts, 3)
    expect = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(np.intersect1d(sh[i], sh[j]))
            jac = inter / max(1, len(sh[i]) + len(sh[j]) - inter)
            if jac >= 0.5:
                expect.append((i, j, jac))
    got = list(zip(out["a"], out["b"], out["jaccard"]))
    assert got == expect
    assert (10, 31, 1.0) in got          # planted exact dup surfaced


def test_simhash_dedup():
    # 64 shared tokens, one swapped -> hamming 2 (verified), so the
    # 4x16-bit chunk blocking must pair them (pigeonhole at hamming<=3)
    base = " ".join(f"word{i}" for i in range(64))
    near = base.replace("word63", "wordX")
    other = " ".join(f"zz{i}" for i in range(64))
    out = dedup.simhash_dedup(_docs([base, near, other]), max_hamming=3).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[0] == cl[1]
    assert cl[2] != cl[0]


def _emb_ds(mat):
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(mat), dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in mat],
    }))


def test_embedding_neardup_pairs():
    rng = np.random.RandomState(0)
    mat = rng.randn(40, 16)
    mat[7] = mat[3] + 0.01 * rng.randn(16)   # planted near-dup
    out = dedup.embedding_neardup_pairs(_emb_ds(mat), threshold=0.99)
    assert [tuple(r) for r in out[["a", "b"]].to_numpy()] == [(3, 7)]


def test_knn_bruteforce_matches_numpy():
    rng = np.random.RandomState(1)
    mat = rng.randn(60, 8)
    ds = _emb_ds(mat)
    queries = ds.to_pandas().iloc[:3]
    got = similarity.knn_bruteforce(ds, queries, k=5)
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in range(3):
        sims = m[qid] @ m.T
        sims[qid] = -np.inf
        want = np.argsort(-sims, kind="stable")[:5]
        rows = got[got["query_id"] == qid].sort_values("rank")
        assert rows["neighbor_id"].tolist() == want.tolist()
        np.testing.assert_allclose(rows["cosine"].to_numpy(), sims[want], atol=1e-9)


def test_knn_lsh_recall():
    # clustered data: LSH recall is meaningful when neighbors are close
    rng = np.random.RandomState(2)
    centers = rng.randn(10, 16) * 3
    mat = np.concatenate([c + 0.1 * rng.randn(30, 16) for c in centers])
    ds = _emb_ds(mat)
    queries = ds.to_pandas().iloc[:5]
    exact = similarity.knn_bruteforce(ds, queries, k=5)
    approx = similarity.knn_lsh(ds, queries, k=5, nbits=6, probes=2)
    hits = 0
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
    assert hits / 25 >= 0.8  # multi-probe recall on clustered data


def test_embedding_neardup_lsh_finds_planted():
    rng = np.random.RandomState(0)
    mat = rng.randn(40, 16)
    mat[7] = mat[3] + 0.01 * rng.randn(16)   # planted near-dup
    out = dedup.embedding_neardup_lsh(_emb_ds(mat), threshold=0.99, bands=6)
    assert (3, 7) in {tuple(r) for r in out[["a", "b"]].to_numpy()}


def test_knn_ivf_recall():
    # clustered data: IVF with nprobe covering a few cells should find
    # most true neighbors (they share the query's coarse cell)
    rng = np.random.RandomState(4)
    centers = rng.randn(10, 16) * 3
    mat = np.concatenate([c + 0.1 * rng.randn(30, 16) for c in centers])
    ds = _emb_ds(mat)
    queries = ds.to_pandas().iloc[:5]
    exact = similarity.knn_bruteforce(ds, queries, k=5)
    approx = similarity.knn_ivf(ds, queries, k=5, n_centroids=12, nprobe=3)
    hits = 0
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
    assert hits / 25 >= 0.8


def test_text_analysis():
    texts = [
        "The quick brown fox, it is the best of the dogs!",
        "der hund und die katze sind nicht ein problem",
        "",
    ]
    docs = _docs(texts)
    out = text_stage.analyze_documents(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_tokens_ws"].tolist() == [len(t.split()) for t in texts]
    assert out["n_chars"].tolist() == [len(t) for t in texts]
    assert out["lang"].tolist()[:2] == ["en", "de"]
    assert out["lang"].tolist()[2] == "und"
    # deterministic across runs, and the actor-pool variant is identical
    out2 = text_stage.analyze_documents(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
    out3 = (
        text_stage.analyze_documents(docs, concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out3)


def test_multimodal_plumbing():
    tbl = multimodal.synth_media_table(30, seed=1)
    ds = rd.from_arrow(tbl)
    feats = multimodal.decode_features(ds, mode="fake", feature_dim=8).to_pandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats["features"])
    feats2 = multimodal.decode_features(rd.from_arrow(tbl), mode="fake", feature_dim=8).to_pandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    assert all(np.allclose(x, y) for x, y in zip(a["features"], b["features"]))
    frames = multimodal.sample_frames(ds, every_k=10).to_pandas()
    videos = tbl.to_pandas().query("kind == 'video'")
    want = int(sum(int(np.ceil(nf / 10)) for nf in videos["n_frames"]))
    assert len(frames) == want
    assert set(frames["media_id"]) == set(videos["media_id"])


def test_multimodal_real_mode_raises_on_compressed():
    # hash-garbage payloads have no P6/RIFF magic -> the codec seam raises
    tbl = multimodal.synth_media_table(4, seed=2)
    ds = rd.from_arrow(tbl)
    with pytest.raises(Exception):
        multimodal.decode_features(ds, mode="real").to_pandas()


def test_multimodal_real_decode_uncompressed():
    tbl = multimodal.synth_real_media_table(24, seed=7)
    ds = rd.from_arrow(tbl)
    feats = multimodal.decode_features(ds, mode="real", feature_dim=16).to_pandas()
    assert len(feats) == 24
    assert all(len(f) == 16 and np.all(np.isfinite(f)) for f in feats["features"])
    # spot-check an image row against a direct numpy decode
    pdf = tbl.to_pandas()
    img = pdf.query("kind == 'image'").iloc[0]
    rgb = multimodal.decode_ppm(img["payload"])
    assert rgb.shape == (int(img["height"]), int(img["width"]), 3)
    got = np.asarray(feats.set_index("media_id").loc[img["media_id"], "features"])
    assert np.allclose(got, multimodal._image_features(rgb, 16))
    # spot-check an audio row: WAV round-trips through the stdlib decoder
    aud = pdf.query("kind == 'audio'").iloc[0]
    samples, rate = multimodal.decode_wav(aud["payload"])
    assert rate == 16_000 and samples.dtype == np.int16 and samples.size == 2048
    got_a = np.asarray(feats.set_index("media_id").loc[aud["media_id"], "features"])
    assert np.allclose(got_a, multimodal._audio_features(samples, 16))


def test_multimodal_real_frame_sample():
    tbl = multimodal.synth_real_media_table(24, seed=7, video_frames=6)
    ds = rd.from_arrow(tbl)
    frames = multimodal.sample_frames(ds, every_k=2, mode="real").to_pandas()
    videos = tbl.to_pandas().query("kind == 'video'")
    assert len(frames) == 3 * len(videos)  # frames 0, 2, 4 of 6
    # every sampled frame is a standalone decodable PPM with original pixels
    row = frames.iloc[0]
    vid = videos.set_index("media_id").loc[row["media_id"]]
    flen = len(vid["payload"]) // int(vid["n_frames"])
    f = int(row["frame_idx"])
    assert bytes(row["frame_payload"]) == bytes(vid["payload"][f * flen:(f + 1) * flen])
    rgb = multimodal.decode_ppm(bytes(row["frame_payload"]))
    assert rgb.shape == (int(vid["height"]), int(vid["width"]), 3)


def test_minhash_handles_null_and_empty_text():
    """Null / empty texts must flow through the shingle paths as empty
    shingle sets, not crash (regression: None.split())."""
    texts = ["alpha beta gamma delta epsilon", None, "", "alpha beta gamma delta epsilon"]
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts,
    }))
    out = dedup.minhash_dedup(docs, threshold=0.5).to_pandas().sort_values("doc_id")
    assert len(out) == 4
    assert bool(out.loc[out["doc_id"] == 1, "keep"].iloc[0])  # null: own cluster
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    assert set(zip(pairs["a"], pairs["b"])) == {(0, 3)}


def test_exact_dedup_dominant_text_across_blocks():
    """One text duplicated across MANY blocks (a single hash run spanning
    block boundaries): min id and count must still be exact, and the
    boundary path ships per-block partials, not raw rows."""
    n = 4000
    texts = ["common boilerplate text"] * n
    texts[1234] = "the one unique document"
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64), "text": texts,
    })).repartition(8)
    out = dedup.exact_dedup(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1234]
    assert dict(zip(out["doc_id"], out["n_dups"])) == {0: n - 1, 1234: 1}


def test_knn_bruteforce_exact_tie_at_k_boundary():
    """Duplicate vectors tie exactly at the k-th score: the contract
    (score desc, neighbor_id asc) must pick the LOWEST id regardless of
    block partitioning (regression: argpartition kept an arbitrary
    tied candidate)."""
    base = np.eye(4)[0]
    # vectors 1..6 identical (cosine 1.0 to the query), vector 0 = query
    mat = np.stack([base] * 7)
    ids = np.array([0, 6, 5, 4, 3, 2, 1], dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in mat]})
    for parts in (1, 4):
        ds = rd.from_pandas(df).repartition(parts)
        q = df[df["vec_id"] == 0]
        got = similarity.knn_bruteforce(ds, q, k=3)
        assert got["neighbor_id"].tolist() == [1, 2, 3]


def test_decode_ppm_comments_and_truncation():
    """PPM headers may contain '#' comment lines (netpbm tools emit
    them); truncated payloads must raise, not spin forever (regression:
    the header scan looped past end-of-buffer)."""
    rgb = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    with_comment = b"P6\n# made by gimp\n2 2\n# another\n255\n" + rgb.tobytes()
    np.testing.assert_array_equal(multimodal.decode_ppm(with_comment), rgb)
    for bad in (b"P6", b"P6\n2 2\n", b"P6\n2 2\n255\n" + rgb.tobytes()[:-1]):
        with pytest.raises(ValueError):
            multimodal.decode_ppm(bad)


def test_embedding_neardup_refuses_large_corpus():
    """The O(n^2) exact baseline must refuse oversized corpora loudly
    (the LSH variant is the scale path), not attempt an unbounded
    broadcast that looks like a hang."""
    rng = np.random.RandomState(2)
    mat = rng.randn(30, 4)
    ds = _emb_ds(mat)
    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        dedup.embedding_neardup_pairs(ds, max_rows=10)
    # under the cap the baseline still works
    out = dedup.embedding_neardup_pairs(ds, threshold=0.99)
    assert set(out.columns) == {"a", "b", "cosine"}


# ----------------------------------------------------------------------
# PII scrubbing
# ----------------------------------------------------------------------

def test_pii_scrub_planted_and_nulls():
    import duckdb
    import pandas as pd
    import ray.data as rd
    from pagerank_cuda_dynamic_ray.stages.text_stage import scrub_pii, PII_PATTERNS

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "mail a@b.co and c.d+x@e.org today",
            "call 555-123-4567 or 555.987.6543",
            "host 10.0.0.1 and 192.168.255.254",
            "a@b.co 555-123-4567 1.2.3.4 all three",
            None,
            "",
        ],
    })
    got = (scrub_pii(rd.from_pandas(df).repartition(3)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # DuckDB RE2 replay of the same sequential chain (dialect parity)
    con = duckdb.connect()
    con.register("d", df)
    email, phone, ip = (p[1] for p in PII_PATTERNS)
    want = con.sql(f"""
        WITH t0 AS (SELECT doc_id, coalesce(text,'') AS s0 FROM d),
        t1 AS (SELECT doc_id,
          CAST(length(regexp_extract_all(s0,'{email}')) AS BIGINT) AS n_emails,
          regexp_replace(s0,'{email}','<EMAIL>','g') AS s1 FROM t0),
        t2 AS (SELECT doc_id, n_emails,
          CAST(length(regexp_extract_all(s1,'{phone}')) AS BIGINT) AS n_phones,
          regexp_replace(s1,'{phone}','<PHONE>','g') AS s2 FROM t1)
        SELECT doc_id, n_emails, n_phones,
          CAST(length(regexp_extract_all(s2,'{ip}')) AS BIGINT) AS n_ips,
          regexp_replace(s2,'{ip}','<IP>','g') AS clean_text FROM t2
        ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert got["n_emails"].tolist() == [2, 0, 0, 1, 0, 0]
    assert got["n_phones"].tolist() == [0, 2, 0, 1, 0, 0]
    assert got["n_ips"].tolist() == [0, 0, 2, 1, 0, 0]
    assert got.loc[3, "clean_text"] == "<EMAIL> <PHONE> <IP> all three"
    # null text scrubs to empty, never NaN
    assert got.loc[4, "clean_text"] == ""


def test_pii_scrub_actor_pool_matches_tasks():
    import pandas as pd
    import ray.data as rd
    from pagerank_cuda_dynamic_ray.stages.text_stage import scrub_pii

    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                       "text": [f"u{i}@x.io line {i}" for i in range(50)]})
    a = scrub_pii(rd.from_pandas(df)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (scrub_pii(rd.from_pandas(df), concurrency=2, batch_size=8).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns])


# ----------------------------------------------------------------------
# embedding PCA (exact-integer covariance)
# ----------------------------------------------------------------------

def _pca_emb_ds(n=120, d=6, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m, rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r for r in m],
    }))


def test_embedding_covariance_partition_invariant_and_exact():
    m, _ = _pca_emb_ds()
    q = np.round(m.astype(np.float64) * similarity.PCA_SCALE).astype(np.int64)
    n = len(q)
    C = q.T @ q
    S = q.sum(0)
    outs = []
    for parts in (1, 5):
        _, ds = _pca_emb_ds()
        t = similarity.embedding_covariance(ds.repartition(parts)).to_pandas()
        outs.append(t)
        for _, r in t.iterrows():
            i, j = int(r["i"]), int(r["j"])
            assert r["cov_num"] == n * int(C[i, j]) - int(S[i]) * int(S[j])
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_embedding_pca_matches_numpy_and_is_partition_invariant():
    m, ds = _pca_emb_ds()
    got1 = (similarity.embedding_pca(ds.repartition(1), n_components=2).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    got5 = (similarity.embedding_pca(ds.repartition(5), n_components=2).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got1, got5)
    # numpy oracle on the QUANTIZED data (the engine's covariance is of
    # the round(x*scale) values; projection uses the raw rows)
    q = np.round(m.astype(np.float64) * similarity.PCA_SCALE) / similarity.PCA_SCALE
    cov = np.cov(q, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:2]]
    for k in range(2):
        a = np.abs(comps[:, k])
        lead = np.flatnonzero(a == a.max())[0]
        if comps[lead, k] < 0:
            comps[:, k] = -comps[:, k]
    want = (m.astype(np.float64) - q.mean(0)) @ comps
    np.testing.assert_allclose(
        got1[["pc0", "pc1"]].to_numpy(), want, rtol=0, atol=1e-9)
    # the two PCs are orthogonal directions of decreasing variance
    p = got1[["pc0", "pc1"]].to_numpy()
    assert p[:, 0].var() >= p[:, 1].var()


def test_quality_filter_drops_low_quality_docs():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "the and is a good long document with many plain words here",
            "!!! ??? ;;; ,,, ...",          # punct-heavy -> quality 0
            "xx yy",                        # too few tokens
            None,                           # empty -> filtered
        ],
    })
    out = text_stage.quality_filter(rd.from_pandas(df), min_quality=0.2,
                                    min_tokens=5).to_pandas()
    assert out["doc_id"].tolist() == [0]
    assert (out["quality"] >= 0.2).all()


def _ref_kmeans(ids, mat, k, iters, scale):
    """Pure-numpy replica of the exact-int fixed-round Lloyd contract."""
    q = np.floor(mat.astype(np.float64) * float(scale)).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cents = q[order[:k]].copy()
    for _ in range(iters):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                s = q[m].sum(axis=0)
                cents[c] = np.sign(s) * (np.abs(s) // m.sum())
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


@pytest.mark.parametrize("blocks", [1, 5])
def test_kmeans_matches_reference_and_is_split_invariant(blocks):
    from pagerank_cuda_dynamic_ray.stages import clustering

    rng = np.random.RandomState(11)
    k, n, d = 4, 120, 8
    centers = rng.randn(k, d) * 5
    mat = (centers[rng.randint(0, k, n)] + rng.randn(n, d)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)  # ids NOT in row order
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    ds = rd.from_pandas(df).repartition(blocks)
    got = (clustering.kmeans_assign(ds, k=k, iters=3).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    want = _ref_kmeans(ids, mat, k, 3, clustering.KMEANS_SCALE)
    order = np.argsort(ids, kind="stable")
    assert got["vec_id"].to_numpy().tolist() == ids[order].tolist()
    assert got["cluster"].to_numpy().tolist() == want[order].tolist()
    # planted structure recovered: rows from one true center agree
    lbl = got.set_index("vec_id")["cluster"]
    true = rng.randint  # noqa: F841  (structure checked implicitly above)


def test_kmeans_empty_cluster_keeps_centroid():
    from pagerank_cuda_dynamic_ray.stages import clustering

    # k=3 but only two distinct points: cluster of the duplicate point
    # wins everything, one centroid never gets members and must persist
    mat = np.array([[0.0, 0.0], [0.0, 0.0], [10.0, 10.0], [10.0, 10.0]],
                   dtype=np.float32)
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64),
                       "embedding": list(mat)})
    got = (clustering.kmeans_assign(rd.from_pandas(df), k=3, iters=2)
           .to_pandas().sort_values("vec_id"))
    want = _ref_kmeans(np.arange(4), mat, 3, 2, clustering.KMEANS_SCALE)
    assert got["cluster"].tolist() == want.tolist()


def test_ngram_exact_dedup_vs_bruteforce_and_boundaries():
    """Doc-level exact n-gram dup profile vs a brute-force oracle, with
    a k-gram duplicated across MANY docs (one sorted run spanning block
    boundaries) and several partitionings."""
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, 15)) for _ in range(40)]
    texts += ["shared boiler plate line"] * 25      # corpus-dominant run
    texts.append(texts[7])                          # exact dup of 7
    texts.append("zz qq " + texts[3])               # shares 3's tail grams

    from pagerank_cuda_dynamic_ray.stages.dedup import _word_shingles
    sh = _word_shingles(texts, 3)
    counts = {}
    for s in sh:
        for h in s.tolist():
            counts[h] = counts.get(h, 0) + 1
    want = {
        i: (len(s), sum(1 for h in s.tolist() if counts[h] >= 2))
        for i, s in enumerate(sh)
    }
    for parts in (1, 9):
        out = (dedup.ngram_exact_dedup(_docs(texts).repartition(parts), k=3)
               .to_pandas().sort_values("doc_id"))
        got = {int(r.doc_id): (int(r.n_ngrams), int(r.dup_ngrams))
               for r in out.itertuples()}
        assert got == want, parts
    # sanity on the planted structure: every boilerplate copy fully dup'd
    assert want[45][0] == want[45][1] > 0


def test_cluster_pairs_cc_matches_union_find():
    """The distributed-CC clustering scale path must produce EXACTLY the
    union-find mapping (min-id roots) on a random pair graph with
    chains, cliques and singleton-free structure."""
    rng = np.random.RandomState(13)
    a = rng.randint(0, 400, 300).astype(np.int64) * 7  # sparse id space
    b = rng.randint(0, 400, 300).astype(np.int64) * 7
    m = a != b
    pairs = pd.DataFrame({"a": np.minimum(a[m], b[m]), "b": np.maximum(a[m], b[m])})
    keys, vals = dedup.cluster_pairs_cc(pairs, num_parts=3)
    roots = dedup._uf_roots(pairs)
    want_keys = np.array(sorted(roots), dtype=np.int64)
    want_vals = np.array([roots[k] for k in want_keys], dtype=np.int64)
    np.testing.assert_array_equal(keys, want_keys)
    np.testing.assert_array_equal(vals, want_vals)
    # end-to-end: forcing the CC path through minhash changes nothing
    docs = _docs(["alpha beta gamma delta"] * 6 + ["x y z w"] * 2)
    via_uf = dedup.minhash_dedup(docs, threshold=0.7).to_pandas()
    via_cc = dedup.minhash_dedup(docs, threshold=0.7,
                                 cluster_pairs_limit=0).to_pandas()
    pd.testing.assert_frame_equal(
        via_uf.sort_values("doc_id").reset_index(drop=True),
        via_cc.sort_values("doc_id").reset_index(drop=True))


def test_grouped_centroid_sums_exact():
    rng = np.random.RandomState(4)
    n, d = 300, 6
    emb = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int32)
    df = pd.DataFrame({"label": labels, "embedding": [v for v in emb]})
    q = np.round(emb.astype(np.float64) * 10_000).astype(np.int64)
    for parts in (1, 6):
        got = (similarity.grouped_centroid_sums(
                   rd.from_pandas(df).repartition(parts), "label")
               .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
        for lab in range(4):
            m = labels == lab
            sub = got[got["label"] == lab]
            np.testing.assert_array_equal(sub["s"].to_numpy(), q[m].sum(0))
            assert (sub["n"] == m.sum()).all()


def _mk_ab(rows):
    import pyarrow as pa

    if rows:
        return pa.table({"a": pa.array([1], pa.int64()),
                         "b": pa.array([2], pa.int64())})
    return pa.table({"a": pa.array([], pa.int64()),
                     "b": pa.array([], pa.int64())})


def test_join_empty_leading_block():
    # Ray 2.49 hash-shuffle join fails with ArrowInvalid when a side's
    # FIRST block is empty (the schema-broadcast block fans out
    # nothing). state/ray_join_patch fixes it at the source, so the RAW
    # join must work and _join_safe must be a streaming identity.
    import pyarrow as pa

    from pagerank_cuda_dynamic_ray.state import ray_join_patch

    assert ray_join_patch.applied(), "patch should apply on Ray 2.49"
    left = rd.from_arrow([_mk_ab(0), _mk_ab(1), _mk_ab(0)])
    right = rd.from_arrow(pa.table({"doc_id": pa.array([2], pa.int64()),
                                    "p": pa.array([b"yy"], pa.binary())}))
    safe = dedup._join_safe(left, 4)
    assert safe is left  # identity: joins stream, no materialize
    j = safe.join(right, "inner", 4, on=("b",), right_on=("doc_id",))
    out = j.to_pandas()
    assert len(out) == 1 and out["p"].iloc[0] == b"yy"
    # raw join, no wrapper at all
    raw = (rd.from_arrow([_mk_ab(0), _mk_ab(1), _mk_ab(0)])
           .join(right, "inner", 4, on=("b",), right_on=("doc_id",))
           .to_pandas())
    assert len(raw) == 1 and raw["p"].iloc[0] == b"yy"


def test_join_all_empty_side_keeps_schema():
    # a side whose every block is empty (but typed) must join cleanly:
    # inner -> 0 rows; left_outer with the empty side on the right ->
    # all left rows with the right's columns present (null-filled)
    import pyarrow as pa

    right = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "p": pa.array([], pa.binary())}))
    left = rd.from_arrow([_mk_ab(1), _mk_ab(1)])
    inner = (rd.from_arrow(_mk_ab(0))
             .join(rd.from_arrow(pa.table(
                 {"doc_id": pa.array([2], pa.int64()),
                  "p": pa.array([b"yy"], pa.binary())})),
                 "inner", 4, on=("b",), right_on=("doc_id",)).to_pandas())
    assert len(inner) == 0
    lo = left.join(right, "left_outer", 4,
                   on=("b",), right_on=("doc_id",)).to_pandas()
    assert len(lo) == 2
    assert "p" in lo.columns and lo["p"].isna().all()


def test_attach_payload_distributed():
    # both endpoints get their payload via hash joins; values must match
    # a driver-side lookup exactly
    import pyarrow as pa

    pairs = rd.from_arrow(pa.table({"a": pa.array([0, 1, 2], pa.int64()),
                                    "b": pa.array([2, 3, 0], pa.int64())}))
    payload = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "blob": pa.array([bytes([i]) for i in range(4)], pa.binary()),
    }))
    out = dedup._attach_payload(pairs, payload, "p_a", "p_b").to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(out) == 3
    for _, r in out.iterrows():
        assert r["p_a"] == bytes([r["a"]]) and r["p_b"] == bytes([r["b"]])


def test_media_stats_real_codec_digest():
    # exact-integer sums through the REAL PPM/WAV parsers vs a direct
    # numpy recompute of the synthetic payload streams
    import numpy as np
    from pagerank_cuda_dynamic_ray.functions.hashing import splitmix64

    tbl = multimodal.synth_real_media_table(24)
    out = (multimodal.media_stats(rd.from_arrow(tbl)).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    assert len(out) == 24
    for r in out.itertuples():
        i = int(r.media_id)
        if r.kind == "audio":
            words = splitmix64(np.arange(2048, dtype=np.uint64)
                               + np.uint64(7 * 31 + 7) * np.uint64(i + 1))
            s = (words % np.uint64(65536)).astype(np.int64) - 32768
            assert r.n_units == 2048
            assert r.s0 == s.sum() and r.s1 == (s * s).sum() and r.s2 == 0
        else:
            nf = 6 if r.kind == "video" else 1
            tot = np.zeros(3, dtype=np.int64)
            for f in range(nf):
                base = i * 1000 + f if r.kind == "video" else i
                words = splitmix64(np.arange(24 * 32 * 3, dtype=np.uint64)
                                   + np.uint64(7 * 97 + 13) * np.uint64(base + 1))
                px = (words % np.uint64(256)).astype(np.int64)
                tot += np.bincount(np.arange(px.size) % 3, weights=px).astype(np.int64)
            assert r.n_units == nf * 24 * 32
            assert (np.array([r.s0, r.s1, r.s2]) == tot).all()


def test_iter_ppm_frames_roundtrip():
    import numpy as np

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (6, 4, 3)).astype(np.uint8) for _ in range(3)]
    buf = b"".join(multimodal.encode_ppm(f) for f in frames)
    got = list(multimodal.iter_ppm_frames(buf))
    assert len(got) == 3
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_resize_images_block_mean_and_passthrough():
    import numpy as np

    tbl = multimodal.synth_real_media_table(12)
    out = (multimodal.resize_images(rd.from_arrow(tbl), factor=2).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    src = tbl.to_pandas().sort_values("media_id").reset_index(drop=True)
    for r, s in zip(out.itertuples(), src.itertuples()):
        if s.kind != "image":
            assert r.payload == s.payload  # non-images untouched
            continue
        orig = multimodal.decode_ppm(s.payload)
        small = multimodal.decode_ppm(r.payload)
        assert small.shape == (orig.shape[0] // 2, orig.shape[1] // 2, 3)
        assert (r.width, r.height) == (orig.shape[1] // 2, orig.shape[0] // 2)
        want = (orig.astype(np.int64)
                .reshape(orig.shape[0] // 2, 2, orig.shape[1] // 2, 2, 3)
                .sum(axis=(1, 3)) // 4).astype(np.uint8)
        np.testing.assert_array_equal(small, want)


def test_frame_diffs_bruteforce():
    import numpy as np

    tbl = multimodal.synth_real_media_table(15)
    out = (multimodal.frame_diffs(rd.from_arrow(tbl)).to_pandas()
           .sort_values(["media_id", "frame_idx"]).reset_index(drop=True))
    src = tbl.to_pandas()
    vids = src[src["kind"] == "video"]
    assert set(out["media_id"]) == set(vids["media_id"])
    for _, v in vids.iterrows():
        frames = [f.astype(np.int64)
                  for f in multimodal.iter_ppm_frames(v["payload"])]
        assert len(frames) == 6
        rows = out[out["media_id"] == v["media_id"]]
        assert list(rows["frame_idx"]) == [1, 2, 3, 4, 5]
        for f, d in zip(rows["frame_idx"], rows["diff_sum"]):
            assert d == np.abs(frames[f] - frames[f - 1]).sum()


def test_media_stats_tolerates_trailing_bytes_on_images():
    import numpy as np
    import pyarrow as pa

    rgb = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    payload = multimodal.encode_ppm(rgb) + b"\n"  # netpbm trailing newline
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([payload], pa.binary()),
        "width": pa.array([3], pa.int32()),
        "height": pa.array([4], pa.int32()),
        "n_frames": pa.array([1], pa.int32()),
        "sample_rate": pa.array([0], pa.int32()),
    })
    out = multimodal.media_stats(rd.from_arrow(t)).to_pandas()
    flat = rgb.reshape(-1, 3).astype(np.int64)
    assert out["n_units"].iloc[0] == 12
    assert (out[["s0", "s1", "s2"]].to_numpy()[0] == flat.sum(axis=0)).all()


def test_normalized_exact_dedup_catches_case_and_punct_variants():
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["Hello, World!", "hello world", "  HELLO   world  ",
                 "different doc", "Different   DOC?", "unique one"],
    })
    for parts in (1, 4):
        got = (dedup.normalized_exact_dedup(rd.from_pandas(df).repartition(parts))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # groups: {0,1,2} -> min 0 x3; {3,4} -> min 3 x2; {5} -> 5 x1
        assert list(zip(got["doc_id"], got["n_dups"])) == [(0, 3), (3, 2), (5, 1)]
