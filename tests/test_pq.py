"""Product-quantization ANN (ann/pq.py): determinism, code shape,
recall vs the exact oracle-checked brute force."""
import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.01"


def _emb_ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"],
                           override_num_blocks=8)


def test_train_deterministic_any_parallelism(ray_session):
    from jesterj_ray.ann.pq import train_pq
    a = train_pq(_emb_ds(), m=8, k=16, sample=256)
    b = train_pq(_emb_ds().repartition(13), m=8, k=16, sample=256)
    assert np.array_equal(a, b)
    assert a.shape == (8, 16, 8)


def test_encode_shape_and_determinism(ray_session):
    from jesterj_ray.ann.pq import encode_pq, train_pq
    books = train_pq(_emb_ds(), m=8, k=16, sample=256)
    codes = encode_pq(_emb_ds(), books).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(codes) == _emb_ds().count()
    c0 = np.asarray(codes["code"].iloc[0])
    assert c0.shape == (8,) and c0.dtype == np.uint8
    codes2 = encode_pq(_emb_ds().repartition(5), books).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert codes.equals(codes2)


def test_pq_recall_vs_exact(ray_session):
    from jesterj_ray.ann.knn import brute_force_topk
    from jesterj_ray.ann.pq import encode_pq, pq_topk, train_pq
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    qvecs = np.asarray(t["embedding"].to_list()[:8], dtype=np.float32)
    exact = brute_force_topk(_emb_ds(), qvecs, k=10)
    books = train_pq(_emb_ds(), m=16, k=32)
    codes = encode_pq(_emb_ds(), books)
    approx = pq_topk(codes, books, qvecs, k=30)   # 3x overfetch
    recalls = []
    for qi in range(len(qvecs)):
        e = set(exact[exact["qid"] == qi]["vec_id"])
        a = set(approx[approx["qid"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_pipeline_query_smoke(ray_session):
    from jesterj_ray.ann.pq import knn_pq_pipeline
    out = knn_pq_pipeline(SF)
    assert list(out["rank"]) == list(range(1, 11))
    # the query vector itself must be its own top hit (code distance 0)
    assert out["vec_id"].iloc[0] == 0


def test_pq_topk_block_layout_independent(ray_session):
    """r05 self-review #2: boundary ties resolve by (score, vec_id)
    regardless of block layout."""
    import numpy as np
    import pyarrow.parquet as pq
    from jesterj_ray.ann.pq import encode_pq, pq_topk, train_pq
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    qvecs = np.asarray(t["embedding"].to_list()[:4], dtype=np.float32)
    books = train_pq(_emb_ds(), m=4, k=8)    # tiny codes -> many ties
    codes = encode_pq(_emb_ds(), books).materialize()
    a = pq_topk(codes, books, qvecs, k=10)
    b = pq_topk(codes.repartition(17), books, qvecs, k=10)
    assert a.equals(b)
