"""Connected-components dedup clustering (dup_clusters / dedup_canonical).

Oracle: a plain python union-find over the same edge list — exhaustive
equality on every graph shape that historically breaks CC algorithms
(chains, stars, cycles, cross-links, random graphs).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import dedup


def _uf_components(edges):
    """Union-find oracle: {node: min-node-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    nodes = set(parent)
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a bigint, doc_b bigint"
    )


def _run(spark, edges, **kw):
    got = {
        (r["doc_id"], r["comp"])
        for r in dedup.dup_clusters(_pairs_df(spark, edges), **kw).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


class TestDupClusters:
    def test_chain_transitive(self, spark):
        # a~b, b~c, c~d: one cluster even though a~d never fired
        _run(spark, [(1, 2), (2, 3), (3, 4)])

    def test_two_cliques(self, spark):
        _run(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)])

    def test_long_path(self, spark):
        # worst case for naive min-label propagation (diameter = n);
        # alternating star converges in O(log n) rounds — cap the rounds
        # far below the diameter and demand the exact answer
        n = 64
        edges = [(i, i + 1) for i in range(1, n)]
        _run(spark, edges, max_rounds=12)

    def test_cycle_and_cross_links(self, spark):
        _run(spark, [(1, 2), (2, 3), (3, 1), (3, 7), (7, 9), (20, 21)])

    def test_star_high_degree_center(self, spark):
        _run(spark, [(5, i) for i in range(6, 40)])

    def test_reversed_and_duplicate_edges(self, spark):
        _run(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (3, 3)])

    def test_random_graphs_vs_union_find(self, spark):
        rng = random.Random(41)
        for trial in range(3):
            nodes = list(range(1, 120))
            edges = [
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(140)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            _run(spark, edges)

    def test_empty_pairs(self, spark):
        df = dedup.dup_clusters(_pairs_df(spark, []))
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["doc_id", "comp"]

    def test_string_ids(self, spark):
        pairs = spark.createDataFrame(
            [("img_b", "img_a"), ("img_b", "img_c")], "id_a string, id_b string"
        )
        got = {
            (r["doc_id"], r["comp"])
            for r in dedup.dup_clusters(pairs, "id_a", "id_b").collect()
        }
        assert got == {("img_a", "img_a"), ("img_b", "img_a"), ("img_c", "img_a")}


class TestDedupCanonical:
    def test_keep_longest_then_min_id(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "short"),
                (2, "the longest document wins"),
                (3, "mid length doc"),
                (10, "equal"),
                (11, "equal"),
            ],
            "doc_id bigint, text string",
        )
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
            "doc_id bigint, comp bigint",
        )
        rows = {
            r["comp"]: (r["keep_id"], r["n_docs"])
            for r in dedup.dedup_canonical(docs, clusters).collect()
        }
        assert rows == {1: (2, 3), 10: (10, 2)}  # longest wins; tie -> min id

    def test_composes_with_pair_generators(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "alpha beta gamma delta zeta"),
                (3, "alpha beta gamma delta zeta eta"),
                (9, "completely unrelated text body here"),
            ],
            "doc_id bigint, text string",
        )
        pairs = dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.3, max_df=100)
        clusters = dedup.dup_clusters(pairs)
        comp = {r["doc_id"]: r["comp"] for r in clusters.collect()}
        assert comp[1] == comp[2] == comp[3] == 1
        assert 9 not in comp  # singleton never emitted


class TestNgramSpanDedup:
    """Exact-substring (n-token window) dedup vs a brute-force python twin:
    keeper retention, span merging, internal repeats, sub-n docs."""

    def _py_twin(self, rows, n):
        toks = {d: " ".join(t.lower().split()).split(" ") for d, t in rows}
        occ = {}
        for d in sorted(toks):
            w = toks[d]
            for i in range(len(w) - n + 1):
                occ.setdefault(tuple(w[i:i + n]), []).append((d, i + 1))
        rem = {d: set() for d in toks}
        for win, places in occ.items():
            if len(places) > 1:
                for d, p in sorted(places)[1:]:
                    rem[d].update(range(p, p + n))
        out = {}
        for d, w in toks.items():
            kept = [t for i, t in enumerate(w, 1) if i not in rem[d]]
            out[d] = (len(w), len(rem[d]), " ".join(kept))
        return out

    def _check(self, spark, rows, n):
        from gol_tool_spark.operators import text as T

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.text_dedup)
            for r in T.ngram_span_dedup(df, n=n).collect()
        }
        assert got == self._py_twin(rows, n)

    def test_basic_keeper_and_merge(self, spark):
        self._check(spark, [
            (1, "a b c d e f g h i j"),
            (2, "x y a b c d e f g h z"),
            (3, "short doc"),
            (4, "a b c d e f g h a b c d e f g h"),
        ], 8)

    def test_random_small_vocab(self, spark):
        import numpy as np

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(12)]
        rows = [
            (d, " ".join(rng.choice(vocab, rng.integers(3, 40)).tolist()))
            for d in range(60)
        ]
        self._check(spark, rows, 5)

    def test_normalization_collapses_whitespace(self, spark):
        self._check(spark, [
            (1, "a  b   c d e F"),
            (2, "A b\tc d E f"),
        ], 3)

    def test_no_python_in_plan(self, spark):
        from gol_tool_spark.operators import text as T

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = T.ngram_span_dedup(df, n=2)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        # createDataFrame's input RDD mentions applySchemaToPythonRDD; what
        # must NOT appear is any Python EVALUATION operator
        for node in ("BatchEvalPython", "ArrowEval", "MapInPandas",
                     "FlatMapGroupsInPandas"):
            assert node not in plan, node


class TestMixSample:
    def test_rates_and_determinism(self, spark):
        from gol_tool_spark.operators import text as T

        rows = [(i, f"doc text number {i}", f"src{i % 4}") for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
        out = T.mix_sample(df, rates, default_rate=0.25)
        got = {(r.doc_id, r.source) for r in out.collect()}
        # determinism: identical second run
        assert got == {(r.doc_id, r.source) for r in out.collect()}
        by_src = {}
        for _, s in got:
            by_src[s] = by_src.get(s, 0) + 1
        assert by_src.get("src0") == 500          # rate 1.0 keeps all
        assert "src2" not in by_src               # rate 0 keeps none
        assert 175 <= by_src.get("src1", 0) <= 325   # ~0.5 of 500
        assert 60 <= by_src.get("src3", 0) <= 190    # default 0.25 of 500

    def test_partitioning_independent(self, spark):
        from gol_tool_spark.operators import text as T

        rows = [(i, f"t {i}", "a") for i in range(500)]
        df1 = spark.createDataFrame(rows, "doc_id long, text string, source string").repartition(1)
        df2 = spark.createDataFrame(rows, "doc_id long, text string, source string").repartition(32)
        r = {"a": 0.4}
        k1 = {x.doc_id for x in T.mix_sample(df1, r).collect()}
        k2 = {x.doc_id for x in T.mix_sample(df2, r).collect()}
        assert k1 == k2 and 100 <= len(k1) <= 300


class TestLocalFinishEquivalence:
    """The size-gated numpy finisher must be bit-identical to the pure
    distributed star rounds — on path graphs (worst case for min-label
    propagation), random graphs, and a mid-loop switch (cap between the
    initial and round-1 edge counts)."""

    def _both(self, spark, pairs_rows, cap_for_mid=None):
        import os

        from gol_tool_spark.operators import dedup as D

        df = spark.createDataFrame(pairs_rows, "doc_a long, doc_b long")
        old = os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES")
        try:
            os.environ["SPARK_GRAFT_CC_LOCAL_EDGES"] = "0"
            dist = sorted((r.doc_id, r.comp) for r in D.dup_clusters(df).collect())
            os.environ["SPARK_GRAFT_CC_LOCAL_EDGES"] = "2000000"
            loc = sorted((r.doc_id, r.comp) for r in D.dup_clusters(df).collect())
            mid = None
            if cap_for_mid is not None:
                os.environ["SPARK_GRAFT_CC_LOCAL_EDGES"] = str(cap_for_mid)
                mid = sorted((r.doc_id, r.comp) for r in D.dup_clusters(df).collect())
        finally:
            if old is None:
                os.environ.pop("SPARK_GRAFT_CC_LOCAL_EDGES", None)
            else:
                os.environ["SPARK_GRAFT_CC_LOCAL_EDGES"] = old
        return dist, loc, mid

    def test_path_graph(self, spark):
        rows = [(i, i + 1) for i in range(200)]
        dist, loc, mid = self._both(spark, rows, cap_for_mid=150)
        assert dist == loc
        assert mid == dist
        assert all(c == 0 for _, c in dist)

    def test_random_graph_and_mid_switch(self, spark):
        import random

        rng = random.Random(7)
        rows = [(rng.randrange(500), rng.randrange(500)) for _ in range(400)]
        rows = [(a, b) for a, b in rows if a != b]
        dist, loc, mid = self._both(spark, rows, cap_for_mid=len(rows) // 2)
        assert dist == loc
        assert mid == dist

    def test_two_components_min_labels(self, spark):
        rows = [(10, 11), (11, 12), (20, 21), (22, 21), (12, 10)]
        dist, loc, _ = self._both(spark, rows)
        assert dist == loc
        comp = dict(loc)
        assert comp[10] == comp[11] == comp[12] == 10
        assert comp[20] == comp[21] == comp[22] == 20
