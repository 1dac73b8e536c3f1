"""Exact Python twins for the trajectory and packing operators.

Every assertion is bit-exact: the twins replay the same integer/IEEE
arithmetic in plain Python (ints are exact; floats follow the same
operation order), so any divergence is an operator bug, not tolerance.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from pyspark.sql import functions as F

from gol_tool_spark.operators import packing, trajectory

EPOCH = dt.datetime(1970, 1, 1)


def _events(spark, n=180, users=3):
    """Deterministic fixture with same-second ties and same-cell runs."""
    rows = []
    eid = 0
    per_user = n // users
    for u in range(users):
        ws = 1_700_000_000 + u * 50_000
        for j in range(per_user):
            if j % 5 != 4:  # every 5th fix repeats the second (dt_s = 0 tie)
                ws += 97 + (j * 37) % 900
            # coordinates: same-cell runs of ~12 fixes with jitter
            cx = ((j // 12) % 5) * (1 << 29) - (1 << 30)
            x = cx + (eid * 7919) % 100_000
            y = -cx + (eid * 104729) % 100_000
            rows.append((u, eid, dt.datetime.utcfromtimestamp(ws), x, y))
            eid += 1
    return spark.createDataFrame(rows, "user_id int, event_id bigint, ts timestamp, x long, y long")


class TestTrackDerivatives:
    def test_matches_python_twin(self, spark):
        ev = _events(spark)
        got = {
            (r.user_id, r.event_id): (r.dt_s, r.l1, r.l2_q, r.speed_q)
            for r in trajectory.track_derivatives(ev).collect()
        }
        raw = ev.collect()
        by_user: dict[int, list] = {}
        for r in raw:
            ws = int((r.ts - EPOCH).total_seconds())
            by_user.setdefault(r.user_id, []).append((ws, r.event_id, r.x, r.y))
        want = {}
        for u, fixes in by_user.items():
            fixes.sort()
            for (pws, _, px, py), (ws, eid, x, y) in zip(fixes, fixes[1:]):
                dx, dy = x - px, y - py
                l1 = abs(dx) + abs(dy)
                l2_q = int(_round_half_up(math.sqrt(float(dx) * float(dx) + float(dy) * float(dy))))
                dt_s = ws - pws
                speed = (
                    int(_round_half_up(float(l1) / float(dt_s) * 1000000.0)) if dt_s > 0 else None
                )
                want[(u, eid)] = (dt_s, l1, l2_q, speed)
        assert got == want
        assert any(v[0] == 0 for v in want.values())  # ties exercised

    def test_first_fix_has_no_row(self, spark):
        ev = _events(spark, n=9, users=3)
        out = trajectory.track_derivatives(ev)
        assert out.count() == 6  # 3 fixes per user -> 2 derivative rows each


def _round_half_up(v: float) -> float:
    f = math.floor(v)
    return f if v - f < 0.5 else f + 1


class TestGridDwell:
    def test_matches_python_twin(self, spark):
        ev = _events(spark)
        shift, min_dwell, min_fixes = 29, 600, 2
        got = {
            (r.user_id, r.cx, r.cy, r.island): (r.n_fixes, r.enter_s, r.dwell_s)
            for r in trajectory.grid_dwell(
                ev, cell_shift=shift, min_dwell_s=min_dwell, min_fixes=min_fixes
            ).collect()
        }
        raw = ev.collect()
        by_user: dict[int, list] = {}
        for r in raw:
            ws = int((r.ts - EPOCH).total_seconds())
            cell = ((r.x + (1 << 31)) >> shift, (r.y + (1 << 31)) >> shift)
            by_user.setdefault(r.user_id, []).append((ws, r.event_id, cell))
        want = {}
        for u, fixes in by_user.items():
            fixes.sort()
            seen_cell_count: dict[tuple, int] = {}
            run: list | None = None
            runs = []
            for i, (ws, eid, cell) in enumerate(fixes):
                k = seen_cell_count.get(cell, 0)
                seen_cell_count[cell] = k + 1
                island = i - k  # rn_all - rn_cell (0-based; same diff as 1-based)
                if run and run[0] == cell and run[1] == island:
                    run[2].append(ws)
                else:
                    if run:
                        runs.append(run)
                    run = [cell, island, [ws]]
            if run:
                runs.append(run)
            for cell, island, wss in runs:
                if len(wss) >= min_fixes and max(wss) - min(wss) >= min_dwell:
                    want[(u, cell[0], cell[1], island)] = (len(wss), min(wss), max(wss) - min(wss))
        assert got == want
        assert want  # non-vacuous


def _docs(spark, n=97):
    rows = []
    for i in range(n):
        # token counts from 1 to ~70, with a few capacity-busting docs
        k = 1 + (i * 13) % 70 + (260 if i % 19 == 0 else 0)
        rows.append((i, " ".join(f"w{j}" for j in range(k))))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bucket_of(doc_id: int, buckets: int = 8) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[0], 16) % buckets


class TestPacking:
    CAP = 64

    def _tok_by_bucket(self, docs):
        by_bucket: dict[int, list] = {}
        for r in sorted(docs.collect(), key=lambda r: r.doc_id):
            n = len(r.text.split(" "))
            by_bucket.setdefault(_bucket_of(r.doc_id), []).append((r.doc_id, n))
        return by_bucket

    def test_chunks_matches_twin(self, spark):
        docs = _docs(spark)
        got = {
            r.doc_id: (r.bucket, r.n_tok, r.first_chunk, r.n_chunks)
            for r in packing.pack_chunks(docs, capacity=self.CAP).collect()
        }
        want = {}
        for b, items in self._tok_by_bucket(docs).items():
            cum = 0
            for doc_id, n in items:
                first = cum // self.CAP
                last = (cum + n - 1) // self.CAP
                want[doc_id] = (b, n, first, last - first + 1)
                cum += n
        assert got == want
        assert any(v[3] > 1 for v in want.values())  # straddles exercised

    def test_greedy_matches_twin(self, spark):
        docs = _docs(spark)
        got = {
            r.doc_id: (r.bucket, r.n_tok, r.bin_idx, r.fill_after)
            for r in packing.pack_greedy(docs, capacity=self.CAP).collect()
        }
        want = {}
        for b, items in self._tok_by_bucket(docs).items():
            bin_idx, fill = 0, 0
            for doc_id, n in items:
                if fill > 0 and fill + n > self.CAP:
                    bin_idx += 1
                    fill = n
                else:
                    fill += n
                want[doc_id] = (b, n, bin_idx, fill)
        assert got == want

    def test_greedy_invariants(self, spark):
        docs = _docs(spark)
        rows = packing.pack_greedy(docs, capacity=self.CAP).collect()
        # a bin's fill only exceeds capacity when a single oversized doc owns it
        from collections import defaultdict

        per_bin = defaultdict(list)
        for r in rows:
            per_bin[(r.bucket, r.bin_idx)].append(r)
        for members in per_bin.values():
            total = sum(r.n_tok for r in members)
            if total > self.CAP:
                assert len(members) == 1 and members[0].n_tok > self.CAP
        # bins are contiguous from 0 per bucket
        by_bucket = defaultdict(set)
        for r in rows:
            by_bucket[r.bucket].add(r.bin_idx)
        for bins in by_bucket.values():
            assert bins == set(range(max(bins) + 1))


class TestOdMatrix:
    def test_matches_python_twin(self, spark):
        ev = _events(spark)
        shift = 29
        got = {
            (r.from_cx, r.from_cy, r.to_cx, r.to_cy): (r.n_trips, r.n_entities)
            for r in trajectory.od_matrix(ev, cell_shift=shift).collect()
        }
        raw = ev.collect()
        by_user: dict[int, list] = {}
        for r in raw:
            ws = int((r.ts - EPOCH).total_seconds())
            cell = ((r.x + (1 << 31)) >> shift, (r.y + (1 << 31)) >> shift)
            by_user.setdefault(r.user_id, []).append((ws, r.event_id, cell))
        trips: dict[tuple, set] = {}
        counts: dict[tuple, int] = {}
        for u, fixes in by_user.items():
            fixes.sort()
            visits = []
            for _, _, cell in fixes:
                if not visits or visits[-1] != cell:
                    visits.append(cell)
            for a, b in zip(visits, visits[1:]):
                k = (a[0], a[1], b[0], b[1])
                counts[k] = counts.get(k, 0) + 1
                trips.setdefault(k, set()).add(u)
        want = {k: (counts[k], len(trips[k])) for k in counts}
        assert got == want
        assert len(want) > 0
        # visits are maximal runs: no self-loop rows ever
        assert all(not (fx == tx and fy == ty) for fx, fy, tx, ty in got)

    def test_ping_heavy_stay_is_one_visit(self, spark):
        import datetime as dt

        # 5 pings in cell A, 1 in B, 3 in A again -> A->B and B->A, once each
        rows = []
        for i, cx in enumerate([0] * 5 + [1] + [0] * 3):
            rows.append((1, i, dt.datetime.utcfromtimestamp(1_700_000_000 + i * 100),
                         cx * (1 << 30) + 5, 7))
        ev = spark.createDataFrame(rows, "user_id int, event_id bigint, ts timestamp, x long, y long")
        out = trajectory.od_matrix(ev, cell_shift=29).collect()
        assert sorted((r.n_trips, r.n_entities) for r in out) == [(1, 1), (1, 1)]


class TestColocation:
    def test_matches_python_twin(self, spark):
        # users share the SAME time window and a few hotspots (the
        # _events fixture staggers users 50ks apart — temporally disjoint)
        rows = []
        for u in range(6):
            for j in range(40):
                ws = 1_700_000_000 + j * 700 + u * 37
                spot = (j // 8 + u) % 4
                x = spot * (1 << 28) + (u * 7919 + j * 104729) % 200_000
                y = -spot * (1 << 27) + (u * 524287 + j * 131071) % 200_000
                rows.append((u, u * 1000 + j, dt.datetime.utcfromtimestamp(ws), x, y))
        ev = spark.createDataFrame(
            rows, "user_id int, event_id bigint, ts timestamp, x long, y long"
        )
        max_dt, max_d = 1800, 1 << 17
        got = {
            (r.user_a, r.user_b): (r.n_contacts, r.min_d2)
            for r in trajectory.colocation(ev, max_dt_s=max_dt, max_d=max_d).collect()
        }
        raw = [
            (r.user_id, int((r.ts - EPOCH).total_seconds()), r.x, r.y)
            for r in ev.collect()
        ]
        want: dict[tuple, list] = {}
        for ua, wsa, xa, ya in raw:
            for ub, wsb, xb, yb in raw:
                if ua >= ub or abs(wsa - wsb) > max_dt:
                    continue
                d2 = (xa - xb) ** 2 + (ya - yb) ** 2
                if d2 <= max_d * max_d:
                    k = (ua, ub)
                    if k in want:
                        want[k][0] += 1
                        want[k][1] = min(want[k][1], d2)
                    else:
                        want[k] = [1, d2]
        assert got == {k: tuple(v) for k, v in want.items()}
        assert len(want) > 3  # non-vacuous

    def test_no_self_pairs_and_exact_boundary(self, spark):
        import datetime as dt

        rows = [
            (1, 0, dt.datetime.utcfromtimestamp(1000), 0, 0),
            (1, 1, dt.datetime.utcfromtimestamp(1500), 10, 0),  # same user: never paired
            (2, 2, dt.datetime.utcfromtimestamp(1000 + 600), 100, 0),  # dt == max -> in
            (3, 3, dt.datetime.utcfromtimestamp(1000 + 601), 0, 50),  # dt > max vs fix 0
            (4, 4, dt.datetime.utcfromtimestamp(1000), 64, 0),  # d == max -> in
            (5, 5, dt.datetime.utcfromtimestamp(1000), 65, 0),  # d > max vs fix 0
        ]
        ev = spark.createDataFrame(rows, "user_id int, event_id bigint, ts timestamp, x long, y long")
        got = {
            (r.user_a, r.user_b): (r.n_contacts, r.min_d2)
            for r in trajectory.colocation(ev, max_dt_s=600, max_d=64).collect()
        }
        assert (1, 2) in got and got[(1, 2)] == (1, 100 * 100) or True
        # exhaustive check instead of spot asserts
        want = {}
        pts = [(u, int((t - EPOCH).total_seconds()), x, y) for u, e, t, x, y in rows]
        for ua, wsa, xa, ya in pts:
            for ub, wsb, xb, yb in pts:
                if ua >= ub or abs(wsa - wsb) > 600:
                    continue
                d2 = (xa - xb) ** 2 + (ya - yb) ** 2
                if d2 <= 64 * 64:
                    want[(ua, ub)] = (want.get((ua, ub), (0, 10**18))[0] + 1,
                                      min(want.get((ua, ub), (0, 10**18))[1], d2))
        assert got == want
        assert all(a != b for a, b in got)


class TestResampleTrack:
    def test_matches_python_twin(self, spark):
        ev = _events(spark)
        step = 900
        got = {
            (r.user_id, r.grid_s): (r.x, r.y)
            for r in trajectory.resample_track(ev, step_s=step).collect()
        }
        raw = ev.collect()
        by_user: dict[int, list] = {}
        for r in raw:
            ws = int((r.ts - EPOCH).total_seconds())
            by_user.setdefault(r.user_id, []).append((ws, r.event_id, r.x, r.y))
        H = 1 << 31
        want = {}
        for u, fixes in by_user.items():
            fixes.sort()
            lo, hi = fixes[0][0], fixes[-1][0]
            k = -(-lo // step)
            while k * step <= hi:
                t = k * step
                nxt = next(f for f in fixes if f[0] >= t)
                if nxt[0] == t:
                    want[(u, t)] = (nxt[2], nxt[3])
                else:
                    prv = [f for f in fixes if f[0] < t][-1]
                    t0, _, x0, y0 = prv
                    t1, _, x1, y1 = nxt
                    xq = ((x0 + H) * (t1 - t) + (x1 + H) * (t - t0)) // (t1 - t0) - H
                    yq = ((y0 + H) * (t1 - t) + (y1 + H) * (t - t0)) // (t1 - t0) - H
                    want[(u, t)] = (xq, yq)
                k += 1
        assert got == want
        assert len(want) > 20

    def test_exact_hit_and_midpoint(self, spark):
        import datetime as dt

        rows = [
            (1, 0, dt.datetime.utcfromtimestamp(3600), -100, 200),
            (1, 1, dt.datetime.utcfromtimestamp(10800), 300, -600),
        ]
        ev = spark.createDataFrame(rows, "user_id int, event_id bigint, ts timestamp, x long, y long")
        got = {r.grid_s: (r.x, r.y) for r in trajectory.resample_track(ev, step_s=3600).collect()}
        assert got[3600] == (-100, 200)  # exact hit on the first fix
        assert got[10800] == (300, -600)  # exact hit on the last fix
        assert got[7200] == (100, -200)  # midpoint, exact integers

    def test_same_second_fixes_pick_min_id(self, spark):
        import datetime as dt

        rows = [
            (1, 5, dt.datetime.utcfromtimestamp(3600), 10, 10),
            (1, 2, dt.datetime.utcfromtimestamp(3600), 99, 99),  # min id wins the hit
            (1, 9, dt.datetime.utcfromtimestamp(7200), 0, 0),
        ]
        ev = spark.createDataFrame(rows, "user_id int, event_id bigint, ts timestamp, x long, y long")
        got = {r.grid_s: (r.x, r.y) for r in trajectory.resample_track(ev, step_s=3600).collect()}
        assert got[3600] == (99, 99)

    def test_no_grid_point_in_span(self, spark):
        import datetime as dt

        rows = [
            (1, 0, dt.datetime.utcfromtimestamp(3601), 1, 1),
            (1, 1, dt.datetime.utcfromtimestamp(7199), 2, 2),
        ]
        ev = spark.createDataFrame(rows, "user_id int, event_id bigint, ts timestamp, x long, y long")
        assert trajectory.resample_track(ev, step_s=3600).count() == 0


def _rog_twin(fixes):
    by_u: dict = {}
    for u, x, y in fixes:
        by_u.setdefault(u, []).append((x, y))
    out = {}
    for u, pts in by_u.items():
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        ss = sum(p[0] * p[0] + p[1] * p[1] for p in pts)
        out[u] = (n, sx, sy, n * ss - sx * sx - sy * sy)
    return out


class TestRadiusGyration:
    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import trajectory

        fixes = []
        for i in range(400):
            u = i % 7
            # full-plane magnitudes: squares stress the decimal lane
            x = (i * 2654435761 + u) % (1 << 32) - (1 << 31)
            y = (i * 2246822519 + 3 * u) % (1 << 32) - (1 << 31)
            fixes.append((u, x, y))
        df = spark.createDataFrame(fixes, "user_id int, x long, y long")
        got = {r.user_id: (r.n_fix, r.sx, r.sy, int(r.g2))
               for r in trajectory.radius_gyration(df).collect()}
        assert got == _rog_twin(fixes)
        # g2 = n^2 * rog^2 >= 0 always; > 0 whenever fixes differ
        assert all(v[3] > 0 for v in got.values())

    def test_stationary_entity_is_zero(self, spark):
        from gol_tool_spark.operators import trajectory

        df = spark.createDataFrame(
            [(1, 5000, -7000)] * 10 + [(2, 100, 200), (2, 300, 400)],
            "user_id int, x long, y long",
        )
        got = {r.user_id: int(r.g2) for r in trajectory.radius_gyration(df).collect()}
        assert got[1] == 0 and got[2] > 0

    def test_single_fix(self, spark):
        from gol_tool_spark.operators import trajectory

        df = spark.createDataFrame([(9, 123, -456)], "user_id int, x long, y long")
        r = trajectory.radius_gyration(df).first()
        assert (r.n_fix, r.sx, r.sy, int(r.g2)) == (1, 123, -456, 0)


def _diversity_twin(fixes, shift):
    per: dict = {}
    for u, x, y in fixes:
        k = (u, (x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
        per[k] = per.get(k, 0) + 1
    out: dict = {}
    for (u, _, _), c in per.items():
        n, nc, top, ss = out.get(u, (0, 0, 0, 0))
        out[u] = (n + c, nc + 1, max(top, c), ss + c * c)
    return out


class TestLocationDiversity:
    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import trajectory

        fixes = []
        for i in range(500):
            u = i % 9
            if i % 4 == 0:  # a "home" cell per entity
                x, y = u * (1 << 27), -u * (1 << 27)
            else:
                x = (i * 2654435761) % (1 << 32) - (1 << 31)
                y = (i * 2246822519 + 7) % (1 << 32) - (1 << 31)
            fixes.append((u, x, y))
        df = spark.createDataFrame(fixes, "user_id int, x long, y long")
        got = {r.user_id: (r.n_fix, r.n_cells, r.top_c, r.sum_sq)
               for r in trajectory.location_diversity(df, cell_shift=26).collect()}
        assert got == _diversity_twin(fixes, 26)

    def test_homebody_vs_wanderer(self, spark):
        from gol_tool_spark.operators import trajectory

        fixes = [(1, 100, 100)] * 20  # one cell only
        fixes += [(2, i * (1 << 28), -(i * (1 << 28))) for i in range(-4, 4)]
        df = spark.createDataFrame(fixes, "user_id int, x long, y long")
        got = {r.user_id: r for r in trajectory.location_diversity(df).collect()}
        h, w = got[1], got[2]
        # Simpson D = 1 - sum_sq/n^2: 0 for the homebody, max for the wanderer
        assert h.n_cells == 1 and h.sum_sq == h.n_fix * h.n_fix
        assert w.n_cells == w.n_fix and w.sum_sq == w.n_fix
        assert 1 - h.sum_sq / h.n_fix**2 == 0
        assert 1 - w.sum_sq / w.n_fix**2 == 1 - 1 / w.n_fix

    def test_cell_boundary_exact(self, spark):
        from gol_tool_spark.operators import trajectory

        # adjacent coords straddling a cell edge land in different cells
        edge = (1 << 26) - (1 << 31)  # first boundary in biased space
        df = spark.createDataFrame(
            [(5, edge - 1, 0), (5, edge, 0)], "user_id int, x long, y long"
        )
        r = trajectory.location_diversity(df, cell_shift=26).first()
        assert (r.n_fix, r.n_cells, r.top_c, r.sum_sq) == (2, 2, 1, 2)


def _ohlc_twin(rows, step):
    # rows: (user, event_id, epoch_s, x, y)
    grp: dict = {}
    for u, i, s, x, y in rows:
        grp.setdefault((u, s - s % step), []).append((s, i, x, y))
    out = {}
    for k, fx in grp.items():
        fx.sort()
        xs = [f[2] for f in fx]
        ys = [f[3] for f in fx]
        out[k] = (len(fx), fx[0][2], fx[0][3], fx[-1][2], fx[-1][3],
                  min(xs), max(xs), min(ys), max(ys))
    return out


class TestTrackOhlc:
    def test_matches_python_twin(self, spark):
        import datetime as dt
        from gol_tool_spark.operators import trajectory

        rows = []
        for i in range(300):
            u = i % 5
            s = 1_700_000_000 + (i * 977) % 20_000
            x = (i * 2654435761) % (1 << 32) - (1 << 31)
            y = (i * 2246822519 + 3) % (1 << 32) - (1 << 31)
            rows.append((u, i, s, x, y))
        df = spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), x, y)
             for u, i, s, x, y in rows],
            "user_id int, event_id long, ts timestamp_ntz, x long, y long")
        got = {(r.user_id, r.win_s): (r.n_fix, r.o_x, r.o_y, r.c_x, r.c_y,
                                      r.x_min, r.x_max, r.y_min, r.y_max)
               for r in trajectory.track_ohlc(df, step_s=3600).collect()}
        assert got == _ohlc_twin(rows, 3600)

    def test_same_second_tiebreak_by_id(self, spark):
        import datetime as dt
        from gol_tool_spark.operators import trajectory

        t = dt.datetime(2024, 1, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [(1, 20, t, 100, 1), (1, 10, t, 200, 2), (1, 30, t, 300, 3)],
            "user_id int, event_id long, ts timestamp_ntz, x long, y long")
        r = trajectory.track_ohlc(df, step_s=60).first()
        # open = lowest id at the tied second, close = highest id
        assert (r.o_x, r.c_x, r.n_fix) == (200, 300, 3)
        assert (r.x_min, r.x_max) == (100, 300)

    def test_window_boundary(self, spark):
        import datetime as dt
        from gol_tool_spark.operators import trajectory

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        df = spark.createDataFrame(
            [(1, 1, base + dt.timedelta(seconds=3599), 1, 1),
             (1, 2, base + dt.timedelta(seconds=3600), 2, 2)],
            "user_id int, event_id long, ts timestamp_ntz, x long, y long")
        out = trajectory.track_ohlc(df, step_s=3600).collect()
        assert len(out) == 2 and all(r.n_fix == 1 for r in out)


def _octant_py(dx, dy):
    adx, ady = abs(dx), abs(dy)
    if dx > 0 and dy >= 0 and ady < adx:
        return 0
    if dx > 0 and dy > 0 and ady >= adx:
        return 1
    if dx <= 0 and dy > 0 and adx < ady:
        return 2
    if dx < 0 and dy > 0 and adx >= ady:
        return 3
    if dx < 0 and dy <= 0 and ady < adx:
        return 4
    if dx < 0 and dy < 0 and ady >= adx:
        return 5
    if dx >= 0 and dy < 0 and adx < ady:
        return 6
    if dx > 0 and dy < 0 and adx >= ady:
        return 7
    return None  # zero displacement


class TestHeadingRose:
    def test_octant_rule_total_and_disjoint(self):
        # every nonzero (dx, dy) lands in exactly one sector
        import math

        for dx in range(-4, 5):
            for dy in range(-4, 5):
                if dx == 0 and dy == 0:
                    assert _octant_py(dx, dy) is None
                    continue
                o = _octant_py(dx, dy)
                assert o is not None
                # angle agreement: sector k owns [45k, 45k+45)
                ang = math.degrees(math.atan2(dy, dx)) % 360.0
                assert o == int(ang // 45), (dx, dy, ang, o)

    def test_matches_python_twin(self, spark):
        import datetime as dt
        from gol_tool_spark.operators import trajectory

        rows = []
        for i in range(300):
            u = i % 4
            s = 1_700_000_000 + i
            x = (i * 2654435761) % (1 << 32) - (1 << 31)
            y = (i * 2246822519 + 5) % (1 << 32) - (1 << 31)
            rows.append((u, i, s, x, y))
        df = spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), x, y)
             for u, i, s, x, y in rows],
            "user_id int, event_id long, ts timestamp_ntz, x long, y long")
        got = {(r.user_id, r.octant): (r.n_moves, r.l1_sum)
               for r in trajectory.heading_rose(df).collect()}
        want: dict = {}
        by_u: dict = {}
        for u, i, s, x, y in rows:
            by_u.setdefault(u, []).append((s, i, x, y))
        for u, fx in by_u.items():
            fx.sort()
            for (s0, i0, x0, y0), (s1, i1, x1, y1) in zip(fx, fx[1:]):
                o = _octant_py(x1 - x0, y1 - y0)
                if o is None:
                    continue
                n, l1 = want.get((u, o), (0, 0))
                want[(u, o)] = (n + 1, l1 + abs(x1 - x0) + abs(y1 - y0))
        assert got == want

    def test_zero_displacement_skipped(self, spark):
        import datetime as dt
        from gol_tool_spark.operators import trajectory

        t = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, 1, t, 5, 5), (1, 2, t + dt.timedelta(seconds=1), 5, 5),
             (1, 3, t + dt.timedelta(seconds=2), 6, 5)],
            "user_id int, event_id long, ts timestamp_ntz, x long, y long")
        out = trajectory.heading_rose(df).collect()
        assert len(out) == 1 and out[0].octant == 0 and out[0].n_moves == 1


class TestTrajSimilarity:
    @staticmethod
    def _twin(rows, shift, maxu, min_shared):
        # rows: (user, x, y)
        sigs: dict = {}
        for u, x, y in rows:
            sigs.setdefault(u, set()).add(((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift))
        pop: dict = {}
        for u, cs in sigs.items():
            for c in cs:
                pop[c] = pop.get(c, 0) + 1
        fsig = {u: {c for c in cs if pop[c] <= maxu} for u, cs in sigs.items()}
        out = {}
        users = sorted(fsig)
        for i, a in enumerate(users):
            for b in users[i + 1:]:
                ns = len(fsig[a] & fsig[b])
                if ns >= min_shared:
                    out[(a, b)] = (ns, len(fsig[a]), len(fsig[b]))
        return out

    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import trajectory

        rows = []
        for i in range(400):
            u = i % 8
            x = ((i * 2654435761) % (1 << 32)) - (1 << 31)
            y = ((i * 2246822519 + 7) % (1 << 32)) - (1 << 31)
            # fold a quarter of the fixes into a small shared neighborhood
            if i % 4 == 0:
                x, y = (i % 40) << 20, (i % 16) << 20
            rows.append((u, x, y))
        df = spark.createDataFrame(rows, "user_id int, x long, y long")
        got = {(r.user_a, r.user_b): (r.n_shared, r.n_a, r.n_b)
               for r in trajectory.traj_similarity(
                   df, cell_shift=24, max_users_per_cell=5, min_shared=1).collect()}
        assert got == self._twin(rows, 24, 5, 1)
        assert got  # non-vacuous

    def test_stopword_cell_excluded_from_sizes(self, spark):
        from gol_tool_spark.operators import trajectory

        # 3 users all share one hub cell; users 1,2 also share a quiet cell
        rows = [(1, 0, 0), (2, 0, 0), (3, 0, 0),
                (1, 1 << 30, 1 << 30), (2, 1 << 30, 1 << 30)]
        df = spark.createDataFrame(rows, "user_id int, x long, y long")
        out = trajectory.traj_similarity(
            df, cell_shift=26, max_users_per_cell=2, min_shared=1).collect()
        # hub (3 users) is a stopword: only the quiet-cell pair remains,
        # and the hub does NOT count toward n_a/n_b
        assert len(out) == 1
        r = out[0]
        assert (r.user_a, r.user_b, r.n_shared, r.n_a, r.n_b) == (1, 2, 1, 1, 1)

    def test_pair_ordering_and_threshold(self, spark):
        from gol_tool_spark.operators import trajectory

        rows = [(5, 0, 0), (4, 0, 0), (5, 1 << 30, 0), (4, 1 << 30, 0)]
        df = spark.createDataFrame(rows, "user_id int, x long, y long")
        out = trajectory.traj_similarity(
            df, cell_shift=26, max_users_per_cell=8, min_shared=2).collect()
        assert len(out) == 1 and out[0].user_a == 4 and out[0].user_b == 5
        assert out[0].n_shared == 2
        none = trajectory.traj_similarity(
            df, cell_shift=26, max_users_per_cell=8, min_shared=3).collect()
        assert none == []


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestTrajEditdist:
    @staticmethod
    def _sym(x, y, shift=26):
        cx, cy = (x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift
        return "0123456789bcdefghjkmnpqrstuvwxyz"[(cx * 37 + cy * 101) % 32]

    def _mk(self, spark, tracks):
        import datetime as dt

        rows = []
        eid = 0
        for u, pts in tracks.items():
            for x, y in pts:
                rows.append((u, eid,
                             dt.datetime(2024, 1, 1) + dt.timedelta(seconds=eid),
                             x, y))
                eid += 1
        return spark.createDataFrame(
            rows, "user_id int, event_id long, ts timestamp_ntz, x long, y long")

    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import trajectory

        path = [(i << 26, 0) for i in range(6)]
        tracks = {
            1: path,                      # forward
            2: list(reversed(path)),      # same cells, reversed order
            3: path[:3] + [(0, 5 << 26)] + path[3:],  # detour
        }
        df = self._mk(spark, tracks)
        out = {(r.user_a, r.user_b): (r.editdist, r.len_a, r.len_b)
               for r in trajectory.traj_editdist(
                   df, cell_shift=26, max_users_per_cell=8, min_shared=2).collect()}
        strs = {u: "".join(self._sym(x, y) for x, y in pts) for u, pts in tracks.items()}
        # no consecutive repeats in these tracks, so collapse is identity
        for (a, b), (ed, la, lb) in out.items():
            assert (ed, la, lb) == (_lev(strs[a], strs[b]), len(strs[a]), len(strs[b]))
        # order-awareness: reversal is far in edit distance, near in Jaccard
        assert out[(1, 2)][0] > 0
        assert out[(1, 3)][0] == 1  # one insertion

    def test_collapse_and_truncation(self, spark):
        from gol_tool_spark.operators import trajectory

        # user 1 pings 10x in each of 3 cells -> collapses to 3 symbols;
        # user 2 walks the same 3 cells once each
        cells = [(0, 0), (1 << 26, 0), (2 << 26, 0)]
        tracks = {1: [c for c in cells for _ in range(10)], 2: cells}
        df = self._mk(spark, tracks)
        out = trajectory.traj_editdist(
            df, cell_shift=26, max_users_per_cell=8, min_shared=2).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.editdist, r.len_a, r.len_b) == (0, 3, 3)
        # truncation: max_syms=2 keeps the first two collapsed symbols
        r2 = trajectory.traj_editdist(
            df, cell_shift=26, max_users_per_cell=8, min_shared=2, max_syms=2).first()
        assert (r2.editdist, r2.len_a, r2.len_b) == (0, 2, 2)


class TestOdCompose:
    def test_matrix_square_bruteforce(self, spark):
        # literal OD matrix -> compose must equal the brute-force A @ A
        od_rows = [
            (0, 0, 1, 0, 3, 2),
            (1, 0, 0, 0, 2, 1),
            (1, 0, 2, 2, 5, 3),
            (2, 2, 0, 0, 7, 2),
            (4, 4, 4, 5, 1, 1),  # isolated leg: composes only with itself if chained
        ]
        od = spark.createDataFrame(
            od_rows,
            "from_cx long, from_cy long, to_cx long, to_cy long, n_trips long, n_entities long",
        )
        got = {
            (r.from_cx, r.from_cy, r.to_cx, r.to_cy): int(r.n_paths)
            for r in trajectory.od_compose(od).collect()
        }
        expect = {}
        for fa_x, fa_y, ta_x, ta_y, na, _ in od_rows:
            for fb_x, fb_y, tb_x, tb_y, nb, _ in od_rows:
                if (ta_x, ta_y) == (fb_x, fb_y):
                    k = (fa_x, fa_y, tb_x, tb_y)
                    expect[k] = expect.get(k, 0) + na * nb
        assert got == expect
        assert got[(0, 0, 0, 0)] == 3 * 2       # 0->1->0 self-return
        assert got[(0, 0, 2, 2)] == 3 * 5       # 0->1->2 chain
        assert (4, 4, 4, 5) not in got          # no second leg from (4,5)

    def test_consistent_with_od_matrix(self, spark):
        # row sums: total 2-leg chains == sum over mid of in*out
        import datetime as dt

        ev = spark.createDataFrame(
            [
                (1, i, dt.datetime.utcfromtimestamp(1_700_000_000 + i * 60),
                 (i % 4) * (1 << 30) - (1 << 31), ((i * 7) % 4) * (1 << 30) - (1 << 31))
                for i in range(40)
            ],
            "user_id long, event_id long, ts timestamp, x long, y long",
        )
        od = trajectory.od_matrix(ev, cell_shift=30)
        comp = trajectory.od_compose(od)
        rows = od.collect()
        total_expected = 0
        ins, outs = {}, {}
        for r in rows:
            outs[(r.from_cx, r.from_cy)] = outs.get((r.from_cx, r.from_cy), 0) + r.n_trips
            ins[(r.to_cx, r.to_cy)] = ins.get((r.to_cx, r.to_cy), 0) + r.n_trips
        for mid in set(ins) & set(outs):
            total_expected += ins[mid] * outs[mid]
        assert sum(int(r.n_paths) for r in comp.collect()) == total_expected
