"""Brute-force Viterbi twin + invariant tests for trajectory.hmm_match."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import trajectory

# cell width must exceed segment extent (the _cover_cells recall
# contract) — every hand-built segment below is < 2^15 long
CS = 16


def _fixes(spark, rows):
    # rows: (user_id, event_id, t, x, y)
    return spark.createDataFrame(
        rows, "user_id long, event_id long, t long, x long, y long"
    )


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "seg long, x1 long, y1 long, x2 long, y2 long"
    )


def _d2(px, py, s):
    _, x1, y1, x2, y2 = s
    dx, dy = x2 - x1, y2 - y1
    num = dx * (px - x1) + dy * (py - y1)
    den = dx * dx + dy * dy
    t = min(max(num / den, 0.0), 1.0)
    ddx = (px - x1) - t * dx
    ddy = (py - y1) - t * dy
    return ddx * ddx + ddy * ddy


def _brute_viterbi(fix_rows, seg_rows, cell_shift, W):
    """Enumerate ALL candidate paths per chain (tiny cases only)."""
    r2 = float((1 << cell_shift) ** 2)
    per_fix = []
    for (_, eid, t, px, py) in sorted(fix_rows, key=lambda r: (r[2], r[1])):
        cands = {
            s[0]: _d2(px, py, s) for s in seg_rows if _d2(px, py, s) <= r2
        }
        per_fix.append((eid, sorted(cands.items())))
    out = {}
    chain = []

    def flush():
        if not chain:
            return
        best = None
        for path in itertools.product(*[range(len(c)) for _, c in chain]):
            cost = 0.0
            segs = []
            for (eid, cands), k in zip(chain, path):
                sg, dd = cands[k]
                cost += dd
                segs.append(sg)
            cost += W * sum(a != b for a, b in zip(segs, segs[1:]))
            key = (cost, tuple(segs))
            if best is None or key < best:
                best = key
        for (eid, cands), sg in zip(chain, best[1]):
            out[eid] = sg
        chain.clear()

    for eid, cands in per_fix:
        if not cands:
            flush()
            out[eid] = None
            continue
        chain.append((eid, cands))
    flush()
    return out


class TestHmmMatch:
    def test_brute_twin_small(self, spark):
        # two near-parallel "roads" + a decoy; 5-fix track wiggles between
        segs = [
            (1, 0, 0, 20000, 0),        # road A (y = 0)
            (2, 0, 600, 20000, 600),    # road B (y = 600)
            (3, 0, 30000, 100, 30500),  # far decoy
        ]
        fixes = [
            (7, 1, 10, 1000, 200),
            (7, 2, 20, 5000, 500),   # nearer B
            (7, 3, 30, 9000, 100),   # nearer A
            (7, 4, 40, 13000, 450),
            (7, 5, 50, 17000, 250),
        ]
        for W in (0.0, 1e5, 1e12):
            got = {
                r.event_id: r.seg
                for r in trajectory.hmm_match(
                    _fixes(spark, fixes), _segs(spark, segs),
                    cell_shift=CS, switch_cost=W,
                ).collect()
            }
            want = _brute_viterbi(fixes, segs, CS, W)
            assert got == want, f"W={W}"

    def test_zero_penalty_is_nearest(self, spark):
        segs = [(1, 0, 0, 8000, 0), (2, 0, 900, 8000, 900)]
        fixes = [(3, i, i * 10, 500 + i * 700, 300 if i % 2 else 700)
                 for i in range(1, 7)]
        got = {
            r.event_id: r.seg
            for r in trajectory.hmm_match(
                _fixes(spark, fixes), _segs(spark, segs),
                cell_shift=CS, switch_cost=0.0,
            ).collect()
        }
        for (_, eid, _, px, py) in fixes:
            nearest = min(segs, key=lambda s: (_d2(px, py, s), s[0]))[0]
            assert got[eid] == nearest

    def test_large_penalty_forces_one_segment(self, spark):
        # both roads stay in range of every fix -> one segment wins outright
        segs = [(1, 0, 0, 8000, 0), (2, 0, 900, 8000, 900)]
        fixes = [(3, i, i * 10, 500 + i * 700, 300 if i % 2 else 700)
                 for i in range(1, 7)]
        got = [
            r.seg
            for r in trajectory.hmm_match(
                _fixes(spark, fixes), _segs(spark, segs),
                cell_shift=CS, switch_cost=1e15,
            ).collect()
        ]
        assert len(set(got)) == 1

    def test_chain_break_resets(self, spark):
        # fix 2 sits far from every segment: NULL row + independent chains
        segs = [(1, 0, 0, 8000, 0)]
        fixes = [
            (9, 1, 10, 1000, 100),
            (9, 2, 20, 2_000_000, 2_000_000),  # unmatched
            (9, 3, 30, 5000, 200),
        ]
        rows = {r.event_id: r for r in trajectory.hmm_match(
            _fixes(spark, fixes), _segs(spark, segs),
            cell_shift=CS, switch_cost=1e9,
        ).collect()}
        assert rows[2].seg is None and rows[2].n_cands == 0
        assert rows[1].seg == 1 and rows[3].seg == 1

    def test_dedup_candidates(self, spark):
        # a fix in the same cell as both segment cover cells: n_cands
        # counts DISTINCT segments
        segs = [(1, 0, 0, 3000, 3000)]
        fixes = [(5, 1, 10, 1500, 1500)]
        r = trajectory.hmm_match(
            _fixes(spark, fixes), _segs(spark, segs), cell_shift=CS
        ).collect()[0]
        assert r.n_cands == 1 and r.seg == 1
