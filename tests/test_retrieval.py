"""BM25 ranked retrieval: exact scores vs a pure-python reference,
determinism, and plan shape (broadcast query side, no cartesian)."""

from __future__ import annotations

import math

import pytest

from gol_tool_spark.operators import retrieval

DOCS = [
    (1, "spark table join join"),
    (2, "fast scan filter"),
    (3, "spark spark spark window agg"),
    (4, "customer order merge stream table"),
    (5, "the quick brown fox"),
]
QUERIES = [("qa", "spark table"), ("qb", "fast fox")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        for d, t in toks.items():
            s = 0.0
            for term in set(qtext.lower().split()):
                tf = t.count(term)
                if tf == 0 or term not in df:
                    continue
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * dl[d] / avgdl))
            if s > 0:
                out[(qid, d)] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def q_df(spark):
    return spark.createDataFrame(QUERIES, "query_id string, qtext string")


class TestBM25:
    def test_scores_match_reference(self, docs_df, q_df):
        got = {
            (r.query_id, r.doc_id): r.score_r
            for r in retrieval.bm25(docs_df, q_df).collect()
        }
        want = _py_bm25(DOCS, QUERIES)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6), k

    def test_topk_order_and_tiebreak(self, docs_df, q_df):
        rows = retrieval.bm25_topk(docs_df, q_df, k=3).collect()
        by_q = {}
        for r in sorted(rows, key=lambda r: (r.query_id, r.rnk)):
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
            for a, bb in zip(rs, rs[1:]):
                assert (a.score_r, -a.doc_id) >= (bb.score_r, -bb.doc_id)
        # qa: doc3 (3x spark) and doc1 (2x join-heavy but has both terms)
        assert by_q["qa"][0].doc_id in (1, 3)

    def test_repeated_query_terms_count_once(self, docs_df, spark):
        q1 = spark.createDataFrame([("q", "spark")], "query_id string, qtext string")
        q2 = spark.createDataFrame([("q", "spark spark spark")], "query_id string, qtext string")
        s1 = {r.doc_id: r.score_r for r in retrieval.bm25(docs_df, q1).collect()}
        s2 = {r.doc_id: r.score_r for r in retrieval.bm25(docs_df, q2).collect()}
        assert s1 == s2

    def test_plan_broadcasts_query_side(self, docs_df, q_df, spark):
        plan = retrieval.bm25(docs_df, q_df)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestDistinctiveTerms:
    @staticmethod
    def _twin(docs, k):
        toks = {d: t.lower().split() for d, t in docs}
        df = {}
        for t in toks.values():
            for term in set(t):
                df[term] = df.get(term, 0) + 1
        out = {}
        for d, t in toks.items():
            tf = {}
            for term in t:
                tf[term] = tf.get(term, 0) + 1
            ranked = sorted(tf.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))
            for r, (term, f) in enumerate(ranked[:k], start=1):
                out[(d, term)] = (f, df[term], r)
        return out

    def test_matches_python_twin(self, docs_df):
        got = {
            (r.doc_id, r.term): (r.tf, r.df, r.rank)
            for r in retrieval.distinctive_terms(docs_df, k=3).collect()
        }
        assert got == self._twin(DOCS, 3)

    def test_df_breaks_tf_ties_rarer_first(self, spark):
        # doc 1: 'aa' and 'zz' both tf=1, but 'zz' is corpus-rare -> wins
        docs = spark.createDataFrame(
            [(1, "aa zz"), (2, "aa"), (3, "aa")], "doc_id long, text string"
        )
        top = retrieval.distinctive_terms(docs, k=1).filter("doc_id = 1").collect()
        assert [(r.term, r.tf, r.df, r.rank) for r in top] == [("zz", 1, 1, 1)]

    def test_k_bounds_and_validation(self, docs_df):
        assert retrieval.distinctive_terms(docs_df, k=2).groupBy("doc_id").count() \
            .filter("count > 2").count() == 0
        with pytest.raises(ValueError):
            retrieval.distinctive_terms(docs_df, k=0)

    def test_topk_prunes_before_final_sort(self, docs_df, spark):
        # the rank window must compile to a WindowGroupLimit (per-group
        # top-k pruning), not a full-window materialization
        plan = retrieval.distinctive_terms(docs_df, k=5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "WindowGroupLimit" in plan


def _ed1_twin(words):
    def ed(a, b):
        # DP levenshtein
        m, n = len(a), len(b)
        if abs(m - n) > 1:
            return 2
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    ws = sorted(set(words))
    return {
        (a, b)
        for i, a in enumerate(ws)
        for b in ws[i + 1:]
        if ed(a, b) <= 1
    }


class TestFuzzyPairs:
    def test_matches_bruteforce(self, spark):
        from gol_tool_spark.operators import text as T

        words = [
            "cold", "old", "bold", "bolt", "red", "rod", "rode", "node",
            "ab", "ba", "abc", "acb", "a", "b", "", "spark", "spars",
            "w123", "w124", "w12", "w1234",
        ]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        got = {(r.word_a, r.word_b) for r in T.fuzzy_pairs(df).collect()}
        expect = _ed1_twin([w for w in words if w])
        assert got == expect
        assert ("ab", "ba") not in got      # transposition verified away
        assert ("cold", "old") in got       # deletion pair
        assert ("red", "rod") in got        # substitution pair
        assert ("w12", "w123") in got       # insertion pair

    def test_duplicates_collapse(self, spark):
        from gol_tool_spark.operators import text as T

        df = spark.createDataFrame([("cat",), ("cat",), ("car",)], "word string")
        got = [(r.word_a, r.word_b) for r in T.fuzzy_pairs(df).collect()]
        assert got == [("car", "cat")]


class TestTermDrift:
    def test_matches_bruteforce(self, spark):
        import hashlib
        import re
        from collections import defaultdict

        rows = [(i, f"alpha beta w{i % 7} gamma" if i % 3 else f"alpha delta w{i % 5}")
                for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from gol_tool_spark.operators import text as T

        got = {
            r.term: (r.df_a, r.df_b, r.n_a, r.n_b, r.delta)
            for r in T.term_drift(df).collect()
        }
        split = {
            d: ("a" if hashlib.md5(t.encode()).hexdigest()[:8] < "80000000" else "b")
            for d, t in rows
        }
        n_a = sum(1 for v in split.values() if v == "a")
        n_b = len(rows) - n_a
        dfc = defaultdict(lambda: [0, 0])
        for d, t in rows:
            for w in set(re.sub(r"\s+", " ", t.lower()).strip().split(" ")):
                dfc[w][0 if split[d] == "a" else 1] += 1
        expect = {
            w: (a, b, n_a, n_b, str(a * n_b - b * n_a)) for w, (a, b) in dfc.items()
        }
        assert got == expect
        assert got["alpha"][0] + got["alpha"][1] == 60  # every doc has alpha

    def test_balanced_term_has_small_delta(self, spark):
        # a term in EVERY doc has delta exactly 0 regardless of split
        rows = [(i, f"common unique{i}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from gol_tool_spark.operators import text as T

        got = {r.term: int(r.delta) for r in T.term_drift(df).collect()}
        assert got["common"] == 0
        # each unique term appears in exactly one doc: |delta| = n_other
        n_a = [r for r in T.term_drift(df).collect() if r.term == "common"][0].n_a
        n_b = 40 - n_a
        assert {abs(v) for t, v in got.items() if t != "common"} <= {n_a, n_b}


class TestCollocations:
    @staticmethod
    def _twin(docs, max_df, min_pair):
        import itertools, re
        toks = {
            i: sorted(set(t for t in re.sub(r"\s+", " ", s.lower()).strip().split(" ") if t))
            for i, s in docs
        }
        df: dict = {}
        for ts in toks.values():
            for t in ts:
                df[t] = df.get(t, 0) + 1
        n_docs = sum(1 for ts in toks.values() if ts)
        pairs: dict = {}
        for ts in toks.values():
            kept = [t for t in ts if df[t] <= max_df]
            for a, b in itertools.combinations(kept, 2):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
        return {
            (a, b): (n, df[a], df[b], n_docs, str(n * n_docs - df[a] * df[b]))
            for (a, b), n in pairs.items() if n >= min_pair
        }

    def test_matches_twin_and_lift_sign(self, spark):
        from gol_tool_spark.operators import retrieval

        docs = [
            (1, "spark shuffle join  JOIN broadcast"),   # dup token collapses
            (2, "spark shuffle agg"),
            (3, "spark broadcast join"),
            (4, "duck  duck goose"),
            (5, "goose join duck"),
            (6, "   "),                                   # empty after trim
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for max_df, min_pair in ((10, 1), (10, 2), (2, 1)):
            got = {
                (r.term_a, r.term_b): (r.n_ab, r.df_a, r.df_b, r.n_docs, r.lift_delta)
                for r in retrieval.collocations(
                    df, max_df=max_df, min_pair=min_pair
                ).collect()
            }
            assert got == self._twin(docs, max_df, min_pair), (max_df, min_pair)
        full = self._twin(docs, 10, 1)
        # duck+goose attract (positive lift), spark+duck never co-occur
        assert int(full[("duck", "goose")][4]) > 0
        assert ("duck", "spark") not in full
        # n_docs excludes the whitespace-only doc
        assert next(iter(full.values()))[3] == 5

    def test_validation(self, spark):
        from gol_tool_spark.operators import retrieval

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        import pytest as _pt
        with _pt.raises(ValueError):
            retrieval.collocations(df, max_df=0)
        with _pt.raises(ValueError):
            retrieval.collocations(df, min_pair=0)
