"""Product quantization: encode twins, ADC+rerank recall vs exact L2."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gol_tool_spark.functions import synth
from gol_tool_spark.operators import ann


def _collect_vecs(df):
    rows = df.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return ids, X


def _np_encode(X, books):
    m, k, dsub = books.shape
    out = np.zeros((len(X), m), dtype=np.int64)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        out[:, j] = d.argmin(1)
    return out


class TestPq:
    def test_train_deterministic_shapes(self, spark):
        emb = synth.embeddings_synth(spark, 300, dim=64)
        b1 = ann.pq_train(emb, m=8, dim=64, k=16, sample=256)
        b2 = ann.pq_train(emb, m=8, dim=64, k=16, sample=256)
        assert b1.shape == (8, 16, 8)
        assert np.array_equal(b1, b2)

    def test_encode_matches_numpy_twin(self, spark):
        emb = synth.embeddings_synth(spark, 400, dim=64)
        books = ann.pq_train(emb, m=8, dim=64, k=16, sample=256)
        got = (
            ann.pq_encode(emb, books)
            .select("vec_id", "codes")
            .orderBy("vec_id")
            .collect()
        )
        ids, X = _collect_vecs(emb)
        want = _np_encode(X, books)
        assert [list(r.codes) for r in got] == want.tolist()

    def test_adc_rerank_recall(self, spark):
        emb = synth.embeddings_synth(spark, 500, dim=64, spread=1.0)
        books = ann.pq_train(emb, m=8, dim=64, k=16, sample=500)
        enc = ann.pq_encode(emb, books).cache()
        qids = [0, 1, 2, 3, 4]
        got = ann.pq_search(enc, qids, books, k=10, shortlist=100)
        res = {}
        for r in got.collect():
            res.setdefault(r.qid, set()).add(r.nid)
        ids, X = _collect_vecs(emb)
        recs = []
        for q in qids:
            d = ((X - X[q]) ** 2).sum(1)
            d[q] = np.inf
            exact = set(ids[np.argsort(d, kind="stable")[:10]].tolist())
            recs.append(len(res[q] & exact) / 10)
        assert np.mean(recs) >= 0.9, recs

    def test_exhaustive_shortlist_is_exact(self, spark, sf_dir):
        # the fixture embeddings are unclustered (nearest ~ median distance),
        # so a partial ADC shortlist may legitimately miss — but with
        # shortlist >= corpus the exact-L2 rerank must return the exact
        # top-k bit-for-bit
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dim = len(emb.first().embedding)
        books = ann.pq_train(emb, m=8, dim=dim, k=16, sample=256)
        n = emb.count()
        out = ann.pq_search(ann.pq_encode(emb, books), [0, 1], books, k=5, shortlist=n + 1)
        res = {}
        for r in out.collect():
            res.setdefault(r.qid, []).append((r.rank, r.nid))
        ids, X = _collect_vecs(emb)
        for q in (0, 1):
            d = ((X - X[q]) ** 2).sum(1)
            d[q] = np.inf
            exact = ids[np.argsort(d, kind="stable")[:5]].tolist()
            assert [nid for _, nid in sorted(res[q])] == exact

    def test_shortlist_bounds_candidates(self, spark):
        emb = synth.embeddings_synth(spark, 300, dim=64)
        books = ann.pq_train(emb, m=8, dim=64, k=16, sample=256)
        enc = ann.pq_encode(emb, books)
        out = ann.pq_search(enc, [0], books, k=10, shortlist=25)
        assert out.count() == 10
        # rank is contiguous 1..k per query
        ranks = sorted(r.rank for r in out.collect())
        assert ranks == list(range(1, 11))
