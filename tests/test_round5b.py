"""Round-5 additions: DSIR weights, silhouette, join counts, Hausdorff
pairs, standard deviational ellipse. Oracle parity is covered by
tools/check_oracle.py; these tests pin the mathematical invariants the
SQL twin can't express (bounds, symmetry vs brute force, identities)."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_join_counts_identities(ray_session):
    from georay.queries import q_join_counts

    r = q_join_counts(SF).iloc[0]
    assert r["n_bb"] + r["n_bw"] + r["n_ww"] == r["n_joins"]
    assert r["n_b"] + r["n_w"] == r["m"]
    # expectations sum to n_joins·m·(m−1) over the shared denominator:
    # J·(nB(nB−1) + 2nBnW + nW(nW−1)) = J·m·(m−1)
    assert (r["ebb_num"] + r["ebw_num"] + r["eww_num"]
            == r["n_joins"] * r["e_den"])
    assert r["e_den"] == r["m"] * (r["m"] - 1)


def test_sde_ellipse_axis_order_and_bounds(ray_session):
    from georay.queries import q_sde_ellipse

    res = q_sde_ellipse(SF)
    assert len(res) >= 1
    assert (res["sigma_major"] >= res["sigma_minor"]).all()
    assert (res["sigma_minor"] >= 0).all()
    assert ((res["theta"] >= -np.pi / 2) & (res["theta"] <= np.pi / 2)).all()
    assert ((res["mean_x"] >= 0) & (res["mean_x"] <= 3600)).all()
    assert ((res["mean_y"] >= 0) & (res["mean_y"] <= 1800)).all()


def test_hausdorff_pairs_vs_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from georay.ops.spatial import HASH_LAT, HASH_LON
    from georay.queries import q_hausdorff_pairs

    res = q_hausdorff_pairs(SF).to_pandas().set_index("pair")
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id"])
    eid = t["event_id"].to_numpy().astype(np.int64)
    uid = t["user_id"].to_numpy().astype(np.int64)
    xi = (eid * HASH_LON) % 360000
    yi = (eid * HASH_LAT) % 180000
    for pair in res.index[:5]:
        a = (uid // 2 == pair) & (uid % 2 == 0)
        b = (uid // 2 == pair) & (uid % 2 == 1)
        dx = xi[a][:, None] - xi[b][None, :]
        dy = yi[a][:, None] - yi[b][None, :]
        d2 = dx * dx + dy * dy
        want = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
        assert int(res.loc[pair, "h2"]) == want
        assert int(res.loc[pair, "n_a"]) == int(a.sum())
        assert int(res.loc[pair, "n_b"]) == int(b.sum())
    # Hausdorff is symmetric in the two sides by construction
    assert (res["h2"] >= 0).all()


def test_silhouette_bounds(ray_session):
    import pyarrow.parquet as pq

    from georay.queries import SIL_SCALE, q_silhouette_labels

    res = q_silhouette_labels(SF).to_pandas()
    assert len(res) >= 2  # needs ≥2 labels for b to exist
    mean = res["sil_sum_scaled"] / (SIL_SCALE * res["n_pts"])
    assert ((mean >= -1.0) & (mean <= 1.0)).all()
    n_emb = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    assert int(res["n_pts"].sum()) == n_emb  # every point scored once


def test_nb_langid_confusion_structure(ray_session):
    """Every odd-doc_id test doc lands exactly once in the confusion
    matrix and predictions stay within the trained classes. (The
    synthetic fixture text shares one vocabulary across langs, so
    ACCURACY is near the majority base rate by construction — the
    pipeline mechanics, not the fixture's separability, are under test;
    bit-exactness vs the SQL twin is the oracle gate's job.)"""
    import pyarrow.parquet as pq

    from georay.queries import q_nb_langid

    res = q_nb_langid(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    n_test = int((docs["doc_id"] % 2 == 1).sum())
    total = int(res["n"].sum())
    assert total == n_test  # no doc dropped or double-counted
    classes = set(docs["lang"].unique())
    assert set(res["lang_true"]) <= classes
    assert set(res["lang_pred"]) <= classes
    diag = int(res.loc[res["lang_true"] == res["lang_pred"], "n"].sum())
    assert diag / total >= 0.2  # ≥ 5-class chance


def test_dsir_weights_direction(ray_session):
    """Docs in the target language must average a HIGHER importance
    weight than non-target docs — the defining property of DSIR."""
    import pyarrow.parquet as pq

    from georay.queries import q_dsir_weights

    res = q_dsir_weights(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    j = res.merge(docs, on="doc_id")
    assert len(j) == len(res)
    per_tok = j["dsir_scaled"] / j["n_tokens"]
    en = per_tok[j["lang"] == "en"]
    other = per_tok[j["lang"] != "en"]
    assert len(en) and len(other)
    assert en.mean() > other.mean()
    assert (j["n_tokens"] > 0).all()


def test_minhash_index_incremental_query(ray_session):
    """Build a persisted MinHashIndex, then probe NEW docs against it:
    a near-copy of an indexed doc must hit its source above threshold,
    unrelated text must miss. Exercises partition pruning, the two-sided
    candidate path and the stored-shingle verify."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from georay.queries import _read
    from georay.textindex import MinHashIndex

    root = tempfile.mkdtemp(prefix="georay_textidx_test_")
    try:
        docs = _read(SF, "documents", columns=["doc_id", "text"])
        MinHashIndex.build(docs, root, n_hashes=64, n_bands=16, shingle_k=5)
        idx = MinHashIndex(root)

        base = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        src_id = int(base["doc_id"][0].as_py())
        src_text = base["text"][0].as_py()
        q = pa.table({
            "doc_id": pa.array([10_000_000, 10_000_001], pa.int64()),
            "text": pa.array([src_text + " tail", "zzz qqq xxx " * 30]),
        })
        res = idx.query_pairs(ray.data.from_arrow(q),
                              threshold=0.7).to_pandas()
        hits = res[res["id_a"] == 10_000_000]
        assert src_id in set(hits["id_b"])  # near-copy found its source
        assert (res["id_a"] != 10_000_001).all()  # junk matches nothing
        assert (res["jaccard"] >= 0.7).all()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_minhash_index_self_pairs_match_inflight(ray_session):
    """Loaded-index self-query must reproduce the in-flight shuffle
    pipeline bit-for-bit (same candidates, same exact Jaccard)."""
    import shutil
    import tempfile

    from georay.ops import minhash as mh
    from georay.queries import _read
    from georay.textindex import MinHashIndex

    root = tempfile.mkdtemp(prefix="georay_textidx_self_")
    try:
        docs = _read(SF, "documents", columns=["doc_id", "text"])
        MinHashIndex.build(docs, root, n_hashes=64, n_bands=16, shingle_k=5)
        got = (MinHashIndex(root).self_pairs(threshold=0.7).to_pandas()
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        want = (mh.near_dup_pairs(docs, n_hashes=64, n_bands=16,
                                  shingle_k=5, threshold=0.7,
                                  verify="shuffle").to_pandas()
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        assert got.equals(want)
    finally:
        shutil.rmtree(root, ignore_errors=True)
