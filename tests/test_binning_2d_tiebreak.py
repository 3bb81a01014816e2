"""Fuzz pin for the 2-D exact-cover tie-break: the engine's
_exact_cover (memoized profile DP, first-max in DFS order) vs the
oracle's 322-partition exhaustive SQL enumeration
(ORDER BY round(obj, 9) DESC, pid). Small-integer grids maximize
exact-objective tie opportunities — the r13 ADVICE fuzz found 3/3000
grids where mathematically equal objectives differed by 1 ulp between
the DP's memoized accumulation and the SQL flat sum, so the two picked
different partitions. Both sides now compare at 9dp with ties to the
first/lowest enumeration index; this test replays that fuzz with a
stable seed. No Spark needed (pure DuckDB vs the driver-side DP).
"""

from __future__ import annotations

import zlib

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E
from optbinning_spark.binning_2d import OptimalBinning2D


def _fuzz_sql(NE, EV, min_frac):
    parts = E._rect_partitions_3x3()
    rects = sorted({rc for p in parts for rc in p})
    rid = {rc: i for i, rc in enumerate(rects)}
    cvals = ", ".join(
        f"({bx}, {by}, {float(NE[bx, by])}, {float(EV[bx, by])})"
        for bx in range(3) for by in range(3))
    rsel = " UNION ALL ".join(
        f"SELECT {i} AS rid, {r1} AS r1, {r2} AS r2, {c1} AS c1, "
        f"{c2} AS c2, "
        f"(SELECT coalesce(sum(ne),0) FROM cells WHERE bx >= {r1} "
        f"AND bx < {r2} AND by >= {c1} AND by < {c2}) AS ne, "
        f"(SELECT coalesce(sum(ev),0) FROM cells WHERE bx >= {r1} "
        f"AND bx < {r2} AND by >= {c1} AND by < {c2}) AS ev"
        for i, (r1, r2, c1, c2) in enumerate(rects))
    psel = ", ".join(
        f"({p}, {rid[rc]})" for p, pr in enumerate(parts) for rc in pr)
    return f"""
  WITH cells(bx, by, ne, ev) AS (VALUES {cvals}),
  tot AS (SELECT sum(ne) AS t_ne, sum(ev) AS t_ev FROM cells),
  rectstats AS ({rsel}),
  rectx AS (
    SELECT r.*,
           (r.ne > 0 AND r.ev > 0
            AND r.ne + r.ev >= {min_frac} * (t.t_ne + t.t_ev)) AS feas,
           CASE WHEN r.ne > 0 AND r.ev > 0
                THEN (r.ev / t.t_ev - r.ne / t.t_ne)
                     * ln((r.ev / t.t_ev) / (r.ne / t.t_ne))
                ELSE 0 END AS term
    FROM rectstats r, tot t),
  partrects(pid, rid) AS (VALUES {psel}),
  cand AS (
    SELECT p.pid, bool_and(x.feas) AS feas, sum(x.term) AS obj
    FROM partrects p JOIN rectx x ON x.rid = p.rid
    GROUP BY p.pid),
  best AS (SELECT pid FROM cand WHERE feas
           ORDER BY round(obj, 9) DESC, pid LIMIT 1)
  SELECT x.r1, x.r2, x.c1, x.c2
  FROM partrects p JOIN rectx x ON x.rid = p.rid
  WHERE p.pid = (SELECT pid FROM best)
  ORDER BY x.r1, x.r2, x.c1, x.c2"""


def _engine_cover(NE, EV, min_frac):
    t_ne, t_ev = NE.sum(), EV.sum()
    total = t_ne + t_ev
    min_cnt = min_frac * total
    pne = np.zeros((4, 4))
    pev = np.zeros((4, 4))
    pne[1:, 1:] = NE.cumsum(0).cumsum(1)
    pev[1:, 1:] = EV.cumsum(0).cumsum(1)

    def rect_value(r1, r2, c1, c2):
        ne = pne[r2, c2] - pne[r1, c2] - pne[r2, c1] + pne[r1, c1]
        ev = pev[r2, c2] - pev[r1, c2] - pev[r2, c1] + pev[r1, c1]
        if ne <= 0 or ev <= 0 or (ne + ev) < min_cnt:
            return None
        p = ev / t_ev
        q = ne / t_ne
        return (p - q) * np.log(p / q)

    _, picks = OptimalBinning2D._exact_cover(None, 3, 3, rect_value)
    return picks


@pytest.mark.parametrize("n_grids", [
    25, pytest.param(250, marks=pytest.mark.full)])
def test_exact_cover_sql_matches_engine_fuzz_3x3(n_grids):
    con = duckdb.connect()
    rng = np.random.default_rng(zlib.crc32(b"exact_cover_3x3"))
    checked = 0
    for t in range(n_grids):
        # small integers force frequent exact-IV ties; occasional
        # zeros exercise infeasible cells
        NE = rng.integers(0, 7, (3, 3)).astype(float)
        EV = rng.integers(0, 7, (3, 3)).astype(float)
        if NE.sum() == 0 or EV.sum() == 0:
            continue
        min_frac = 0.15 if t % 2 == 0 else 0.0
        picks = _engine_cover(NE, EV, min_frac)
        rows = con.execute(_fuzz_sql(NE, EV, min_frac)).fetchall()
        if picks is None:
            # no feasible cover: the production oracle has no rows for
            # this case (q_binning_2d_3x3 falls to guillotine /
            # full-range); just assert the SQL agrees nothing covers
            assert rows == []
            continue
        want = sorted((r1, r2, c1, c2) for r1, r2, c1, c2 in picks)
        got = [tuple(map(int, r)) for r in rows]
        assert got == want, (t, NE.tolist(), EV.tolist(), got, want)
        checked += 1
    assert checked > n_grids // 2


@pytest.mark.parametrize("n_grids", [
    8, pytest.param(120, marks=pytest.mark.full)])
def test_exact_cover_36cell_fuzz(n_grids):
    """Production-ceiling fuzz (r14 verdict ask #6): 36-cell grids —
    the largest the exact-cover dispatch runs (_EXACT_CELL_LIMIT)
    before the guillotine fallback — via tools/fuzz_2d_tiebreak:
    objective invariance + local merge dominance on the full grid,
    winner IDENTITY vs an exhaustive oracle-order enumerator on
    sampled sub-grids. The default slice is a seeded prefix of the
    full sweep."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from fuzz_2d_tiebreak import run

    n_full, n_sub = run(n_grids=n_grids, verbose=False)
    assert n_full > n_grids // 2
    assert n_sub > n_grids // 3


@pytest.mark.parametrize("n_grids", [
    20, pytest.param(150, marks=pytest.mark.full)])
def test_guillotine_fallback_invariants(n_grids):
    """Structural invariants of the >36-cell guillotine fallback on
    RANDOM grids (since r16 the fallback also carries a full hash
    oracle on a pinned 7x7 grid — binning_2d_guillotine_pinned — and
    a pinned 9dp first-max; this fuzz keeps covering the grid shapes
    and degenerate profiles the one pinned instance cannot):

    - the plan it returns is a VALID exact cover of feasible rects;
    - its recorded objective equals an independent flat fsum of the
      winning rects' IV terms (< 1e-9, the same decomposability bound
      the exact path documents);
    - on grids where BOTH paths run, the exact cover's objective
      dominates the guillotine's (guillotine covers are a subset of
      rectangle partitions, so exact < guillotine would be a solver
      bug, not a tie artifact).
    """
    import math

    from optbinning_spark.binning_2d import OptimalBinning2D

    rng = np.random.default_rng(zlib.crc32(b"guillotine_invariants"))
    n_checked = 0
    for t in range(n_grids):
        big = t % 2 == 0
        nx, ny = ((8, 8) if big else (5, 5))
        NE = rng.integers(0, 7, (nx, ny)).astype(float)
        EV = rng.integers(0, 7, (nx, ny)).astype(float)
        if NE.sum() == 0 or EV.sum() == 0:
            continue
        min_frac = (0.0, 0.02)[t % 2]
        t_ne, t_ev = NE.sum(), EV.sum()
        min_cnt = min_frac * (t_ne + t_ev)

        def rect_iv(r1, r2, c1, c2):
            ne = NE[r1:r2, c1:c2].sum()
            ev = EV[r1:r2, c1:c2].sum()
            if ne <= 0 or ev <= 0 or (ne + ev) < min_cnt:
                return None
            p, q = ev / t_ev, ne / t_ne
            return (p - q) * np.log(p / q)

        # force the guillotine path regardless of grid size
        ob = OptimalBinning2D(min_bin_size=min_frac)
        ob._EXACT_CELL_LIMIT = 0
        ob._solve(NE, EV)
        g_obj, g_rects = ob.objective_, ob.rects_
        if len(g_rects) == 1 and rect_iv(*g_rects[0]) is None:
            continue  # no feasible plan: the degenerate whole-grid bin
        covered = np.zeros((nx, ny), dtype=int)
        terms = []
        for rc in g_rects:
            covered[rc[0]:rc[1], rc[2]:rc[3]] += 1
            v = rect_iv(*rc)
            assert v is not None, (t, "guillotine kept infeasible", rc)
            terms.append(float(v))
        assert (covered == 1).all(), (t, "guillotine not an exact cover")
        assert abs(math.fsum(terms) - g_obj) < 1e-9, (
            t, g_obj, math.fsum(terms))
        if not big:
            # exact path available: must dominate the guillotine family
            ob2 = OptimalBinning2D(min_bin_size=min_frac)
            ob2._solve(NE, EV)
            assert ob2.objective_ >= g_obj - 1e-9, (
                t, ob2.objective_, g_obj,
                NE.tolist(), EV.tolist())
        n_checked += 1
    assert n_checked > n_grids // 2
