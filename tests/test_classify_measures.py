"""Tests: tag diff/merge, projection, area rules, problem nodes, ghosts,
GST weighting, way measures, extra sinks, windowed streaming."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gol_tool_spark.functions import tags as TG
from gol_tool_spark.operators import classify, measures, projection
from gol_tool_spark.sinks import writers

TAGMAP = st.dictionaries(
    st.sampled_from(["a", "b", "c", "name", "highway"]),
    st.sampled_from(["1", "2", "x", "yes"]),
    max_size=4,
)


class TestTagDiffMerge:
    @given(a=TAGMAP, b=TAGMAP)
    @settings(max_examples=25, deadline=None)
    def test_roundtrip(self, spark_global, a, b):
        # merge(a, diff(a,b)) == b  (TagTableBuilderTest.java:49-80 parity)
        df = spark_global.createDataFrame(
            [(a, b)], "a map<string,string>, b map<string,string>"
        )
        out = df.select(
            TG.tags_merge(F.col("a"), TG.tags_diff(F.col("a"), F.col("b"))).alias("m"),
            TG.tags_diff(F.col("a"), F.col("a")).alias("selfdiff"),
        ).first()
        assert dict(out.m or {}) == b
        assert dict(out.selfdiff or {}) == {}

    def test_exclude_keys(self, spark_global):
        df = spark_global.createDataFrame(
            [({"created_by": "x", "tiger:cfcc": "y", "name": "ok"},)],
            "tags map<string,string>",
        )
        out = df.select(
            TG.exclude_keys(F.col("tags"), ["created_by"], ["tiger:"]).alias("t")
        ).first()
        assert dict(out.t) == {"name": "ok"}


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


class TestProjection:
    def test_exact_wildcard_computed(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 0, {"name": "n1", "addr:city": "berlin", "addr:street": "x", "other": "y"})],
            "id long, x long, y long, tags map<string,string>",
        )
        out = projection.project_columns(df, ["name", "lon", "lat", "addr:*"]).first()
        assert out.name == "n1" and out.lon == 0.0 and out.lat == 0.0
        assert set(out.tags.keys()) == {"addr:city", "addr:street"}


class TestAreaRules:
    def test_rules(self, spark):
        rows = [
            (1, {"building": "yes"}, True),
            (2, {"natural": "coastline"}, True),
            (3, {"natural": "water"}, True),
            (4, {"highway": "services"}, True),
            (5, {"highway": "primary"}, True),
            (6, {"building": "yes", "area": "no"}, True),
            (7, {"area": "yes"}, True),
            (8, {"building": "yes"}, False),  # not closed
        ]
        df = spark.createDataFrame(rows, "id long, tags map<string,string>, closed boolean")
        out = {r.id: r.is_area for r in classify.classify_ways(df).collect()}
        assert out[1] is True          # building any-value
        assert out[2] is False         # coastline blacklisted
        assert out[3] is True          # natural non-blacklisted
        assert out[4] is True          # highway whitelist
        assert out[5] is False         # highway non-whitelisted
        assert out[6] is False         # area=no override
        assert out[7] is True          # explicit area=yes
        assert out[8] is False         # open ring never an area

    def test_problem_nodes(self, spark):
        pts = spark.createDataFrame(
            [(1, 5, 5, {}), (2, 5, 5, {}), (3, 9, 9, {}), (4, 7, 7, {"name": "x"})],
            "id long, x long, y long, tags map<string,string>",
        )
        mem = spark.createDataFrame([(3,)], "node_ref long")
        out = {r.id: dict(r.tags) for r in classify.problem_nodes(pts, mem).collect()}
        assert out[1].get("geodesk:duplicate") == "yes"
        assert out[2].get("geodesk:duplicate") == "yes"
        assert out[1].get("geodesk:orphan") == "yes"  # dup AND orphan
        assert out[3] == {}                            # referenced by a way
        assert out[4] == {"name": "x"}                 # tagged: exempt

    def test_ghost_copies(self, spark):
        pts = spark.createDataFrame(
            [(1, 0, 0, 10), (2, 0, 0, 10), (3, 0, 0, 20)],
            "id long, x long, y long, tile long",
        )
        mem = spark.createDataFrame(
            [(100, 1, 1), (100, 2, 2), (100, 3, 3), (200, 1, 1)],
            "way_id long, seq int, node_ref long",
        )
        out = classify.ghost_copies(mem, pts).collect()
        g = {(r.way_id, r.tile): r.is_ghost for r in out}
        assert g == {(100, 10): False, (100, 20): True, (200, 10): False}

    def test_gst_weighting(self, spark):
        kv = spark.createDataFrame(
            [("highway", "key")] * 3 + [("primary", "value")] * 10 + [("outer", "role")] * 4,
            "s string, kind string",
        )
        out = {r.s: r.weight for r in classify.gst_strings(kv, indexed_keys=["highway"]).collect()}
        assert out["highway"] == 15 + 10_000_000_000_000
        assert out["primary"] == 10
        assert out["outer"] == 8


class TestMeasures:
    def test_lengths_and_closed(self, spark):
        pts = spark.createDataFrame(
            [(1, 0, 0), (2, 3, 4), (3, 3, 0), (4, 0, 0)], "id long, x long, y long"
        )
        mem = spark.createDataFrame(
            [(1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 4), (2, 1, 1), (2, 2, 2)],
            "way_id long, seq int, node_ref long",
        )
        out = {r.way_id: r for r in measures.way_measures(mem, pts).collect()}
        assert out[1].l1_len == 7 + 4 + 3
        assert abs(out[1].l2_len - (5.0 + 4.0 + 3.0)) < 1e-9
        assert out[1].closed is True
        assert out[2].closed is False
        assert out[2].l1_len == 7

    def test_ring_area(self, spark):
        df = measures.assemble_coords(
            spark.createDataFrame(
                [(1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 4)],
                "way_id long, seq int, node_ref long",
            ),
            spark.createDataFrame(
                [(1, 0, 0), (2, 10, 0), (3, 10, 10), (4, 0, 10)], "id long, x long, y long"
            ),
        )
        area2 = df.select(measures.ring_area2(F.col("coords")).alias("a")).first().a
        assert area2 == 200.0


class TestExtraSinks:
    def test_xml_fab_map(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 0, {"name": "pub"})], "id long, x long, y long, tags map<string,string>"
        )
        xml = writers.osm_xml_format(df).first().xml
        assert '<node id="1"' in xml and '<tag k="name" v="pub"/>' in xml
        fab = writers.fab_format(df).first().fab
        assert fab == "node/1: name=pub"
        html = writers.map_html(df)
        assert html.startswith("<!DOCTYPE html>") and "[0.0,0.0]" in html

    def test_xml_escaping_hostile_values(self, spark):
        """EscapeXml.java:15-31: & < > \" ' in tag keys/values and member
        roles must come out entity-escaped on every XML element kind."""
        df = spark.createDataFrame(
            [(1, 0, 0, {"na<me>": 'M&"s\''})],
            "id long, x long, y long, tags map<string,string>",
        )
        xml = writers.osm_xml_format(df).first().xml
        assert '<tag k="na&lt;me&gt;" v="M&amp;&quot;s&apos;"/>' in xml
        assert "M&\"" not in xml
        mem = spark.createDataFrame(
            [(10, 1, 100), (10, 2, 101)], "way_id long, seq int, node_ref long"
        )
        wtags = spark.createDataFrame(
            [(10, {"name": "A&B"})], "way_id long, tags map<string,string>"
        )
        wxml = writers.osm_xml_way_format(mem, tags_df=wtags).first().xml
        assert '<nd ref="100"/>' in wxml and '<tag k="name" v="A&amp;B"/>' in wxml
        members = spark.createDataFrame(
            [(20, 1, "way", 10, 'out"er&')],
            "rel_id long, seq int, mtype string, ref long, role string",
        )
        rtags = spark.createDataFrame(
            [(20, {"type": "route"})], "rel_id long, tags map<string,string>"
        )
        rxml = writers.osm_xml_relation_format(members, tags_df=rtags).first().xml
        assert 'role="out&quot;er&amp;"' in rxml
        assert '<tag k="type" v="route"/>' in rxml

    def test_geojson_feature_collection_wrapper(self, spark, tmp_path):
        """GeoJsonFeaturePrinter.java:42-57: wrapped FeatureCollection
        around the distributed GEOJSONL parts, parse-valid JSON."""
        import json

        df = spark.createDataFrame(
            [(i, i * 1000, -i * 1000) for i in range(25)], "id long, x long, y long"
        ).repartition(4)
        feats = writers.geojson_format(df)
        out = str(tmp_path / "fc.geojson")
        n = writers.write_geojson_collection(feats, out)
        doc = json.load(open(out))
        assert doc["type"] == "FeatureCollection"
        assert n == 25 and len(doc["features"]) == 25
        assert {f["id"] for f in doc["features"]} == set(range(25))

    def test_geometry_collection_for_mixed_relations(self, spark):
        """GeoJsonFeaturePrinter.java:87-143: a non-area relation prints a
        GeometryCollection of its members' geometries, member order kept."""
        import json

        members = spark.createDataFrame(
            [
                (5, 2, '{"type":"Point","coordinates":[1.0000000,2.0000000]}'),
                (5, 1, '{"type":"LineString","coordinates":[[0.0000000,0.0000000],[1.0000000,1.0000000]]}'),
            ],
            "rel_id long, seq int, geom_json string",
        )
        feat = writers.geojson_geometrycollection_format(members).first().feature
        doc = json.loads(feat)
        assert doc["geometry"]["type"] == "GeometryCollection"
        kinds = [g["type"] for g in doc["geometry"]["geometries"]]
        assert kinds == ["LineString", "Point"]  # seq order, not input order


class TestWindowedStreaming:
    def test_tumbling_counts(self, spark, tmp_path):
        from gol_tool_spark.streaming import windowed

        src = tmp_path / "events"
        src.mkdir()
        (src / "e1.json").write_text(
            '{"event_id":1,"ts":"2024-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.0}\n'
            '{"event_id":2,"ts":"2024-01-01T00:05:00Z","user_id":1,"event_type":"click","value":2.0}\n'
            '{"event_id":3,"ts":"2024-01-01T00:15:00Z","user_id":2,"event_type":"view","value":3.0}\n'
        )
        q = windowed.run_to_memory(spark, str(src), name="w1")
        q.awaitTermination(60)
        rows = spark.sql("SELECT * FROM w1").collect()
        got = {(str(r.w_start), r.event_type): r.n for r in rows}
        assert got[("2024-01-01 00:00:00", "click")] == 2
        assert got[("2024-01-01 00:10:00", "view")] == 1


class TestRingAssembly:
    def test_stitch_square_from_pieces_with_hole(self, spark):
        from gol_tool_spark.operators import rings

        # outer square 0..100 split into two open ways (one reversed),
        # inner hole 20..40 as a single closed way
        def coords(pts):
            return [{"seq": i, "x": x, "y": y} for i, (x, y) in enumerate(pts)]

        rows = [
            (1, "outer", coords([(0, 0), (100, 0), (100, 100)])),
            (1, "outer", coords([(0, 0), (0, 100), (100, 100)])),  # reversed join
            (1, "inner", coords([(20, 20), (40, 20), (40, 40), (20, 40), (20, 20)])),
            (2, "outer", coords([(0, 0), (50, 0)])),  # dangling: can't close
        ]
        df = spark.createDataFrame(
            rows, "rel_id long, role string, coords array<struct<seq:int,x:long,y:long>>"
        )
        out = rings.assemble_rings(df)
        r1 = {(r.role, r.ring_idx): r for r in out.filter(F.col("rel_id") == 1).collect()}
        outer = r1[("outer", 0)]
        assert outer.closed and outer.n_points == 5
        assert abs(outer.area2) == 2 * 100 * 100
        inner = r1[("inner", 0)]
        assert inner.closed and abs(inner.area2) == 2 * 20 * 20
        # multipolygon area = outer - inner
        mp = {r.rel_id: r for r in rings.multipolygon_area2(out).collect()}
        assert mp[1].area2 == 2 * (100 * 100 - 20 * 20)
        assert mp[1].n_rings == 2 and mp[1].n_inner == 1
        # rel 2: single open chain, not closed, excluded from area
        r2 = out.filter(F.col("rel_id") == 2).collect()
        assert len(r2) == 1 and not r2[0].closed
        assert 2 not in mp


class TestProjectionMultiWildcard:
    def test_two_patterns_and_star(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 0, {"addr:city": "b", "name:en": "x", "other": "y", "name": "z"})],
            "id long, x long, y long, tags map<string,string>",
        )
        out = projection.project_columns(df, ["addr:*", "*:en"]).first()
        assert set(out.tags.keys()) == {"addr:city", "name:en"}
        all_out = projection.project_columns(df, ["*"]).first()
        assert set(all_out.tags.keys()) == {"addr:city", "name:en", "other", "name"}


class TestRingCentroid:
    """Shoelace centroid vs the textbook formula; orientation invariance,
    degenerate rejection, closed-only filtering."""

    def _py_centroid(self, ring):
        n = len(ring)
        a2 = sx = sy = 0.0
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            c = x1 * y2 - x2 * y1
            a2 += c
            sx += (x1 + x2) * c
            sy += (y1 + y2) * c
        return sx / (3 * a2), sy / (3 * a2)

    def _run(self, spark, rings):
        from gol_tool_spark.operators import measures

        mem, pts, nid = [], [], 1000
        for wid, ring in rings.items():
            closed = list(ring) + [ring[0]]
            for seq, (x, y) in enumerate(closed):
                mem.append((wid, seq, nid))
                pts.append((nid, x, y))
                nid += 1
        mdf = spark.createDataFrame(mem, "way_id long, seq int, node_ref long")
        pdf = spark.createDataFrame(pts, "id long, x long, y long")
        return {
            r.way_id: (r.cx_c, r.cy_c)
            for r in measures.way_centroids(mdf, pdf).collect()
        }

    def test_known_shapes(self, spark):
        rings = {
            1: [(0, 0), (10, 0), (10, 10), (0, 10)],             # square
            2: [(0, 0), (9, 0), (0, 9)],                         # triangle
            3: [(0, 0), (0, 10), (10, 10), (10, 0)],             # CW square
            4: [(0, 0), (4, 0), (4, 6), (2, 6), (2, 2), (0, 2)], # L-shape
        }
        got = self._run(spark, rings)
        for wid, ring in rings.items():
            cx, cy = self._py_centroid(ring)
            assert got[wid] == (round(cx * 100), round(cy * 100)), wid
        assert got[1] == (500, 500) and got[3] == (500, 500)  # orientation-proof

    def test_degenerate_and_open_excluded(self, spark):
        from gol_tool_spark.operators import measures

        mem = [(1, 0, 1), (1, 1, 2), (1, 2, 3),          # open way
               (2, 0, 4), (2, 1, 5), (2, 2, 6), (2, 3, 4)]  # collinear closed
        pts = [(1, 0, 0), (2, 5, 0), (3, 9, 3),
               (4, 0, 0), (5, 5, 5), (6, 10, 10)]
        mdf = spark.createDataFrame(mem, "way_id long, seq int, node_ref long")
        pdf = spark.createDataFrame(pts, "id long, x long, y long")
        assert measures.way_centroids(mdf, pdf).count() == 0


class TestSimplifyWays:
    """Douglas-Peucker vs a recursive python twin; endpoint retention,
    tolerance monotonicity, zigzag preservation."""

    def _twin(self, pts, tol):
        import math

        def rec(a, b, keep):
            if b - a < 2:
                return
            ax, ay = pts[a]; bx, by = pts[b]
            dx, dy = bx - ax, by - ay
            seg = math.hypot(dx, dy)
            best, bi = -1.0, -1
            for i in range(a + 1, b):
                px, py = pts[i]
                d = (math.hypot(px - ax, py - ay) if seg == 0
                     else abs(dx * (py - ay) - dy * (px - ax)) / seg)
                if d > best:
                    best, bi = d, i
            if best > tol:
                keep.add(bi)
                rec(a, bi, keep)
                rec(bi, b, keep)

        keep = {0, len(pts) - 1}
        rec(0, len(pts) - 1, keep)
        return sorted(keep)

    def _run(self, spark, ways, tol):
        from gol_tool_spark.operators import measures

        mem, pts, nid = [], [], 5000
        for wid, line in ways.items():
            for seq, (x, y) in enumerate(line):
                mem.append((wid, seq, nid)); pts.append((nid, x, y)); nid += 1
        mdf = spark.createDataFrame(mem, "way_id long, seq int, node_ref long")
        pdf = spark.createDataFrame(pts, "id long, x long, y long")
        out = measures.simplify_ways(mdf, pdf, tol)
        return {
            r.way_id: [(c.x, c.y) for c in r.coords_simplified]
            for r in out.collect()
        }

    def test_matches_recursive_twin(self, spark):
        import numpy as np

        rng = np.random.default_rng(5)
        ways = {}
        for wid in range(12):
            n = int(rng.integers(2, 60))
            xs = np.cumsum(rng.integers(-50, 51, n))
            ys = np.cumsum(rng.integers(-50, 51, n))
            ways[wid] = list(zip(xs.tolist(), ys.tolist()))
        for tol in (0.0, 5.0, 40.0):
            got = self._run(spark, ways, tol)
            for wid, line in ways.items():
                want = [line[i] for i in self._twin(line, tol)]
                assert got[wid] == want, (wid, tol)

    def test_straight_line_collapses_zigzag_survives(self, spark):
        ways = {
            1: [(i * 10, 0) for i in range(20)],                 # straight
            2: [(i * 10, 100 if i % 2 else -100) for i in range(20)],  # zigzag
        }
        got = self._run(spark, ways, 50.0)
        assert got[1] == [(0, 0), (190, 0)]       # everything between dropped
        # zigzag: spikes survive per the exact DP recursion (the slanted
        # top-level chord absorbs a few near-chord spikes — twin agrees)
        want2 = [ways[2][i] for i in self._twin(ways[2], 50.0)]
        assert got[2] == want2 and len(got[2]) > 10


class TestConvexHulls:
    def _run(self, spark, ways):
        mem, pts, nid = [], [], 0
        for wid, line in ways.items():
            for seq, (x, y) in enumerate(line):
                mem.append((wid, seq, nid))
                pts.append((nid, x, y))
                nid += 1
        mdf = spark.createDataFrame(mem, "way_id long, seq int, node_ref long")
        pdf = spark.createDataFrame(pts, "id long, x long, y long")
        out = measures.convex_hulls(mdf, pdf)
        return {
            r.way_id: (r.n_in, r.n_hull, [(c.x, c.y) for c in r.hull])
            for r in out.collect()
        }

    @staticmethod
    def _jarvis(points):
        """Gift-wrapping twin (independent algorithm, exact ints)."""
        pts = sorted(set(points))
        if len(pts) <= 2:
            return pts

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        hull = []
        start = min(pts)
        p = start
        while True:
            hull.append(p)
            q = pts[0] if pts[0] != p else pts[1]
            for r in pts:
                if r == p or r == q:
                    continue
                c = cross(p, q, r)
                if c < 0 or (
                    c == 0
                    and (r[0] - p[0]) ** 2 + (r[1] - p[1]) ** 2
                    > (q[0] - p[0]) ** 2 + (q[1] - p[1]) ** 2
                ):
                    q = r
            p = q
            if p == start:
                break
        # gift wrapping walks CLOCKWISE with this orientation convention;
        # normalize both to a canonical rotation-invariant CCW cycle
        return hull

    @staticmethod
    def _canon_cycle(h):
        if len(h) <= 2:
            return tuple(sorted(h))
        i = h.index(min(h))
        fwd = tuple(h[i:] + h[:i])
        rev_list = list(reversed(h))
        j = rev_list.index(min(rev_list))
        rev = tuple(rev_list[j:] + rev_list[:j])
        return min(fwd, rev)

    def test_matches_gift_wrapping_twin(self, spark):
        import numpy as np

        rng = np.random.default_rng(9)
        ways = {}
        for wid in range(10):
            n = int(rng.integers(1, 40))
            xs = rng.integers(-(1 << 31), 1 << 31, n)  # full-plane coords
            ys = rng.integers(-(1 << 31), 1 << 31, n)
            ways[wid] = list(zip(xs.tolist(), ys.tolist()))
        ways[10] = [(0, 0), (10, 0), (5, 1), (5, 5), (0, 0)]  # near-collinear
        ways[11] = [(i, 2 * i) for i in range(9)]  # collinear
        ways[12] = [(3, 3)] * 4  # all-duplicate
        got = self._run(spark, ways)
        for wid, line in ways.items():
            n_in, n_hull, hull = got[wid]
            assert n_in == len(line)
            want = self._jarvis(line)
            assert self._canon_cycle(hull) == self._canon_cycle(want), wid
            assert n_hull == len(hull)
            # every input point is inside or on the hull (CCW: cross >= 0)
            if n_hull >= 3:
                for p in line:
                    for a, b in zip(hull, hull[1:] + hull[:1]):
                        c = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
                        assert c >= 0, (wid, p)

    def test_ccw_and_strict_vertices(self, spark):
        ways = {1: [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (2, 0)]}
        got = self._run(spark, ways)
        n_in, n_hull, hull = got[1]
        assert n_hull == 4 and set(hull) == {(0, 0), (4, 0), (4, 4), (0, 4)}
        # CCW: signed shoelace area positive
        area2 = sum(
            a[0] * b[1] - b[0] * a[1] for a, b in zip(hull, hull[1:] + hull[:1])
        )
        assert area2 > 0


def _resample_twin(ways, n_samples):
    # ways: {way_id: [(x, y), ...]} resolved+ordered; python floor math
    K = n_samples - 1
    out = {}
    for wid, cs in ways.items():
        if len(cs) < 2:
            continue
        lens = [abs(cs[i + 1][0] - cs[i][0]) + abs(cs[i + 1][1] - cs[i][1]) for i in range(len(cs) - 1)]
        cums = [0]
        for v in lens:
            cums.append(cums[-1] + v)
        L = cums[-1]
        for k in range(n_samples):
            dk = (k * L) // K
            c = sum(1 for v in cums if v < dk)
            i = max(1, min(len(cs) - 1, c))
            x0, y0 = cs[i - 1]
            x1, y1 = cs[i]
            ln = lens[i - 1]
            off = dk - cums[i - 1]
            if ln == 0:
                sx, sy = x0, y0
            else:
                sx = x0 + ((x1 - x0) * off) // ln
                sy = y0 + ((y1 - y0) * off) // ln
            out[(wid, k)] = (sx, sy)
    return out


class TestWayResample:
    def _dfs(self, spark, ways):
        mem, pts, nid = [], [], 0
        for wid, cs in ways.items():
            for seq, (x, y) in enumerate(cs):
                mem.append((wid, nid, seq))
                pts.append((nid, x, y))
                nid += 1
        return (
            spark.createDataFrame(mem, "way_id long, node_ref long, seq int"),
            spark.createDataFrame(pts, "id long, x long, y long"),
        )

    def test_matches_python_twin(self, spark):
        ways = {
            1: [(0, 0), (100, 0), (100, 50)],
            2: [((1 << 31) - 1, -(1 << 31)), (-(1 << 31), (1 << 31) - 1)],  # full-plane diagonal
            3: [(5, 5), (5, 5), (7, 5)],      # zero-length first segment
            4: [(9, 9), (9, 9)],              # L == 0 way
            5: [(3, 3)],                      # single node: emits nothing
        }
        mem, pts = self._dfs(spark, ways)
        got = {
            (r.way_id, r.k): (r.sx, r.sy)
            for r in measures.way_resample(mem, pts, n_samples=5).collect()
        }
        assert got == _resample_twin(ways, 5)
        # endpoints are exact vertices
        assert got[(1, 0)] == (0, 0) and got[(1, 4)] == (100, 50)
        assert got[(2, 0)] == ((1 << 31) - 1, -(1 << 31))
        assert got[(4, 2)] == (9, 9)
        assert (5, 0) not in got

    def test_even_spacing_on_straight_line(self, spark):
        ways = {1: [(0, 0), (1000, 0)]}
        mem, pts = self._dfs(spark, ways)
        got = {
            r.k: (r.sx, r.sy) for r in measures.way_resample(mem, pts, n_samples=5).collect()
        }
        assert got == {k: (k * 250, 0) for k in range(5)}

    def test_validation(self, spark):
        mem, pts = self._dfs(spark, {1: [(0, 0), (1, 1)]})
        import pytest

        with pytest.raises(ValueError):
            measures.way_resample(mem, pts, n_samples=1)
