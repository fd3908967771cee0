"""LSH-bucketed ANN: recall against the brute-force oracle query."""

from __future__ import annotations

from detector_network_processor_spark.plans import all_queries

from conftest import SF_DIR


def test_lsh_topk_recall(spark):
    brute = all_queries()["cosine_topk"].fn(spark, SF_DIR).collect()
    lsh = all_queries()["cosine_topk_lsh"].fn(spark, SF_DIR).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh_sets = {}
    for r in lsh:
        lsh_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # multiprobe-1 over 8 planes on random vectors: expect decent overlap
    total = hits = 0
    for q, brute_n in brute_sets.items():
        total += len(brute_n)
        hits += len(brute_n & lsh_sets.get(q, set()))
    recall = hits / total
    assert recall >= 0.6, f"ANN recall vs brute force too low: {recall}"
    # every LSH similarity must be exact (scoring is not approximated)
    brute_sims = {(r.query_id, r.neighbor_id): r.sim for r in brute}
    for r in lsh:
        if (r.query_id, r.neighbor_id) in brute_sims:
            assert abs(brute_sims[(r.query_id, r.neighbor_id)] - r.sim) < 1e-9


def test_multimodal_decode_contract(spark):
    df = all_queries()["multimodal_features"].fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 500
    r = rows[0]
    assert r.n_bytes > 0 and 64 <= r.width < 64 + 1024
    assert 0 <= r.fsum0 <= 255 * ((r.n_bytes + 15) // 16)
    # determinism across runs
    rows2 = all_queries()["multimodal_features"].fn(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_ivf_topk_recall(spark):
    """IVF with nprobe=4 of 16 lists scores ~1/4 of the corpus; on the
    uniform-random fixture (LSH/IVF's adversarial case) recall still has to
    clear a floor, and every surfaced similarity must be exact."""
    brute = all_queries()["cosine_topk"].fn(spark, SF_DIR).collect()
    ivf = all_queries()["ivf_topk"].fn(spark, SF_DIR).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    total = sum(len(v) for v in brute_sets.values())
    hits = sum(len(v & ivf_sets.get(q, set())) for q, v in brute_sets.items())
    recall = hits / total
    assert recall >= 0.3, f"IVF recall vs brute force too low: {recall}"
    # every IVF result is fully ranked: exactly k rows per query, ranks 1..k
    per_q = {}
    for r in ivf:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    brute_sims = {(r.query_id, r.neighbor_id): r.sim for r in brute}
    for r in ivf:
        if (r.query_id, r.neighbor_id) in brute_sims:
            assert abs(brute_sims[(r.query_id, r.neighbor_id)] - r.sim) < 1e-9


def test_pq_encode_matches_numpy_and_preserves_ranking(spark):
    """PQ differential + fidelity: Spark's Arrow encode stage reproduces an
    independent numpy PQ model code-for-code, and the ADC ordering rank-
    correlates with exact L2 (Spearman > 0.25 per query on this fixture —
    the embeddings are near-isotropic random, which is PQ's worst case at
    32 bits/vector; clustered real-world embeddings sit far higher, per
    Jégou et al. 2011. Exact end-to-end adjudication is the pq_topk
    oracle's job; this pins the kernel and the fidelity floor)."""
    import numpy as np
    import pyspark.sql.functions as F

    from detector_network_processor_spark.io import load_table
    from detector_network_processor_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_encode,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Q = 8
    qv, cv, cids = V[:Q], V[Q:], ids[Q:]
    dim = V.shape[1]
    sub = dim // PQ_M
    cb = np.stack([cv[:PQ_K][:, m * sub:(m + 1) * sub] for m in range(PQ_M)])

    # numpy reference codes
    ref = np.stack(
        [
            np.argmin(
                ((cv[:, m * sub:(m + 1) * sub][:, None, :] - cb[m][None, :, :]) ** 2).sum(-1),
                axis=1,
            )
            for m in range(PQ_M)
        ],
        axis=1,
    )
    corp = emb.filter(F.col("vec_id") >= Q)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(corp, cb, dim).collect()
    }
    for i, vid in enumerate(cids):
        assert got[vid] == list(ref[i]), f"codes diverge for vec {vid}"

    # ADC fidelity: rank correlation vs exact L2
    lut = np.stack(
        [((qv[:, m * sub:(m + 1) * sub][:, None, :] - cb[m][None, :, :]) ** 2).sum(-1) for m in range(PQ_M)],
        axis=1,
    )
    adc = np.zeros((Q, len(cv)))
    for m in range(PQ_M):
        adc += lut[:, m, ref[:, m]]
    exact = ((qv[:, None, :] - cv[None, :, :]) ** 2).sum(-1)
    for i in range(Q):
        ra = np.argsort(np.argsort(adc[i]))
        rb = np.argsort(np.argsort(exact[i]))
        rho = float(np.corrcoef(ra, rb)[0, 1])
        assert rho > 0.25, f"query {i}: spearman {rho:.3f}"


def test_pq_train_monotonically_reduces_quantization_error(spark):
    """Distributed per-subspace Lloyd: the mean quantization error is
    non-increasing per iteration (the Lloyd guarantee) and strictly better
    than the untrained seed codebook after a few rounds."""
    from detector_network_processor_spark.io import load_table
    from detector_network_processor_spark.operators.similarity import pq_train

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    cb, history = pq_train(emb, dim=64, iters=6)
    assert len(history) == 6
    for a, b in zip(history, history[1:]):
        assert b <= a * (1 + 1e-9), f"error increased: {a} -> {b}"
    assert history[-1] < history[0] * 0.95, f"no real improvement: {history}"
    assert cb.shape == (4, 16, 16)


def test_multimodal_real_decode_soft_import(spark):
    """decode_media(fake=False): decodes real images when PIL is installed
    (skipped cleanly when not), raises NotImplementedError otherwise — the
    Spark-side plumbing (schema, Arrow batching) is identical either way."""
    import pytest

    from detector_network_processor_spark.operators.multimodal import decode_media

    media = spark.createDataFrame(
        [(1, b"not-an-image", "image")], "media_id long, media binary, media_type string"
    )
    try:
        import io

        from PIL import Image
    except ImportError:
        with pytest.raises(Exception) as ei:
            decode_media(media, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
        pytest.skip("PIL not installed — real-decode error path verified")
    # PIL present: decode a real 3x2 PNG end to end
    img = Image.new("RGB", (3, 2), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    real = spark.createDataFrame(
        [(1, buf.getvalue(), "image")], "media_id long, media binary, media_type string"
    )
    row = decode_media(real, fake=False).collect()[0]
    assert (row.width, row.height) == (3, 2)
    assert row.n_bytes == len(buf.getvalue())
