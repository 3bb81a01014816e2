"""Tie-break fuzz pins for the multiclass and scenario partition DPs
(the two solvers whose r14 pinned selection — 9dp-rounded objective,
lowest boundary mask — is not already covered by the binary/shape
fuzzes in test_wide_fit_oracle.py). Each test replays the solver as
the SAME mask enumeration its production oracle runs
(multiclass_binning_table: summed one-vs-rest JS;
scenario_binning_table: scenario-averaged IV with per-scenario
feasibility and cross-scenario monotonicity) on literal small-integer
counts, which maximize exact-objective tie opportunities. Pure
DuckDB vs numpy, no Spark.
"""

from __future__ import annotations

import zlib

import duckdb
import numpy as np
import pytest

from optbinning_spark.core.solver import solve_multiclass, solve_scenarios


def _mc_sql(M, trends=None):
    """Mask enumeration for 3-class multiclass: JS objective and
    feasibility exactly as _sql_multiclass_binning_table; optional
    per-class asc/desc as one-vs-rest rate lag checks."""
    n = M.shape[0]
    rows = ", ".join(
        f"({pb}, {float(M[pb].sum())}, "
        + ", ".join(f"{float(M[pb, c])}" for c in range(3)) + ")"
        for pb in range(n))
    js_c = []
    for c in range(3):
        p = f"(ev{c} / t.tev{c})"
        q = f"((cnt - ev{c}) / (t.tall - t.tev{c}))"
        m = f"(({p} + {q}) / 2)"
        js_c.append(
            f"0.5 * (CASE WHEN ev{c} > 0 THEN {p} * ln({p} / {m}) ELSE 0 END"
            f" + CASE WHEN cnt - ev{c} > 0 THEN {q} * ln({q} / {m})"
            f" ELSE 0 END)")
    js_term = " + ".join(f"({t})" for t in js_c)
    feas = " AND ".join(
        f"bool_and(ev{c} > 0 AND cnt - ev{c} > 0)" for c in range(3))
    evsum = ", ".join(f"sum(ev{c}) AS ev{c}" for c in range(3))
    mono = []
    if trends:
        for c, tr in enumerate(trends):
            er = f"ev{c} / CAST(cnt AS DOUBLE)"
            # strict moves only: an equal step is compatible with
            # either leg of a peak/valley (the DP's edge_allowed uses
            # >= / <=), so peak-validity is exactly "every strict
            # increase comes before every strict decrease"
            max_inc = f"max(CASE WHEN {er} > er{c}_prev THEN seg END)"
            min_dec = f"min(CASE WHEN {er} < er{c}_prev THEN seg END)"
            max_dec = f"max(CASE WHEN {er} < er{c}_prev THEN seg END)"
            min_inc = f"min(CASE WHEN {er} > er{c}_prev THEN seg END)"
            if tr == "ascending":
                mono.append(f"bool_and(er{c}_prev IS NULL"
                            f" OR {er} >= er{c}_prev)")
            elif tr == "descending":
                mono.append(f"bool_and(er{c}_prev IS NULL"
                            f" OR {er} <= er{c}_prev)")
            elif tr == "peak":
                mono.append(f"({max_inc} IS NULL OR {min_dec} IS NULL"
                            f" OR {max_inc} < {min_dec})")
            elif tr == "valley":
                mono.append(f"({max_dec} IS NULL OR {min_inc} IS NULL"
                            f" OR {max_dec} < {min_inc})")
    mono_sel = (" AND " + " AND ".join(mono)) if mono else ""
    lags = ", ".join(
        f"lag(ev{c} / CAST(cnt AS DOUBLE))"
        f" OVER (PARTITION BY mask ORDER BY seg) AS er{c}_prev"
        for c in range(3))
    return f"""
  WITH pre(pb, cnt, ev0, ev1, ev2) AS (VALUES {rows}),
  tot AS (SELECT sum(cnt) AS tall,
                 sum(ev0) AS tev0, sum(ev1) AS tev1, sum(ev2) AS tev2
          FROM pre),
  masks AS (SELECT g AS mask FROM generate_series(0, {2 ** (n - 1) - 1}) t(g)),
  segs AS (
    SELECT m.mask,
           bit_count(CAST(m.mask AS BIGINT) & ((1::BIGINT << pb) - 1)) AS seg,
           sum(cnt) AS cnt, {evsum}
    FROM masks m, pre GROUP BY 1, 2),
  segx AS (SELECT s.*, {lags} FROM segs s),
  cand AS (
    SELECT mask, {feas}{mono_sel} AS feas,
           sum({js_term}) AS obj
    FROM segx s, tot t GROUP BY mask),
  best AS (SELECT mask FROM cand WHERE feas
           ORDER BY round(obj, 9) DESC, mask LIMIT 1)
  SELECT seg, cnt, ev0, ev1, ev2 FROM segs
  WHERE mask = (SELECT mask FROM best)
  ORDER BY seg"""


@pytest.mark.parametrize("trends", [None, ["ascending", None, None],
                                    [None, "descending", "ascending"],
                                    # peak/valley route through the
                                    # phase-mask bit transform whose
                                    # tie-break the r15 fix pins to
                                    # _better_pinned on predecessor
                                    # boundary masks (ADVICE #1) —
                                    # previously untested
                                    ["peak", None, None],
                                    [None, "valley", None],
                                    ["peak", "valley", "ascending"],
                                    ["valley", "peak", None]])
@pytest.mark.parametrize("n_profiles", [
    20, pytest.param(200, marks=pytest.mark.full)])
def test_multiclass_sql_matches_dp_fuzz(trends, n_profiles):
    con = duckdb.connect()
    seed = zlib.crc32(repr(trends).encode())
    rng = np.random.default_rng(seed)
    checked = 0
    for t in range(n_profiles):
        n = int(rng.integers(2, 9))
        M = rng.integers(0, 25, (n, 3)).astype(float)
        if (M.sum(axis=0) == 0).any():
            continue
        sol = solve_multiclass(M, monotonic_trends=trends)
        rows = con.execute(_mc_sql(M, trends)).fetchall()
        if sol.status == "INFEASIBLE":
            assert rows == []
            continue
        want = [
            (i, M[j:k + 1].sum(), *(M[j:k + 1, c].sum() for c in range(3)))
            for i, (j, k) in enumerate(sol.segments)]
        got = [tuple(r) for r in rows]
        assert got == want, (t, trends, got, want)
        checked += 1
    assert checked > n_profiles // 2


def _sc_sql(NEm, EVm, trend):
    """Mask enumeration for scenario binning: per-scenario
    feasibility, scenario-averaged IV, monotonicity across ALL
    scenarios, auto_asc_desc preferring ascending on rounded ties —
    the _sql scenario oracle's exact selection order."""
    n, n_s = NEm.shape
    rows = ", ".join(
        f"({pb}, {s}, {float(NEm[pb, s])}, {float(EVm[pb, s])})"
        for pb in range(n) for s in range(n_s))
    mono = {"ascending": "mono_asc", "descending": "mono_desc",
            "auto_asc_desc": "(mono_asc OR mono_desc)"}[trend]
    pref = (", (CASE WHEN mono_asc THEN 0 ELSE 1 END)"
            if trend == "auto_asc_desc" else "")
    return f"""
  WITH pre(pb, scen, ne, ev) AS (VALUES {rows}),
  stot AS (SELECT scen, sum(ne) AS t_ne, sum(ev) AS t_ev
           FROM pre GROUP BY scen),
  masks AS (SELECT g AS mask FROM generate_series(0, {2 ** (n - 1) - 1}) t(g)),
  segscen AS (
    SELECT m.mask, p.scen,
           bit_count(CAST(m.mask AS BIGINT) & ((1::BIGINT << p.pb) - 1)) AS seg,
           sum(ne) AS ne, sum(ev) AS ev
    FROM masks m, pre p GROUP BY 1, 2, 3),
  segx AS (
    SELECT s.*,
           CASE WHEN ev > 0 AND ne > 0
                THEN (ev / t.t_ev - ne / t.t_ne)
                     * ln((ev / t.t_ev) / (ne / t.t_ne)) ELSE 0 END AS iv_term,
           ev / CAST(ev + ne AS DOUBLE) AS er,
           lag(ev / CAST(ev + ne AS DOUBLE))
             OVER (PARTITION BY mask, scen ORDER BY seg) AS er_prev
    FROM segscen s JOIN stot t USING (scen)),
  cand AS (
    SELECT mask,
           bool_and(ev > 0 AND ne > 0) AS feas,
           bool_and(er_prev IS NULL OR er >= er_prev) AS mono_asc,
           bool_and(er_prev IS NULL OR er <= er_prev) AS mono_desc,
           sum(iv_term) / {n_s} AS obj
    FROM segx GROUP BY mask),
  best AS (
    SELECT mask FROM cand WHERE feas AND {mono}
    ORDER BY round(obj, 9) DESC{pref}, mask LIMIT 1)
  SELECT seg, sum(ne) AS ne, sum(ev) AS ev
  FROM segscen WHERE mask = (SELECT mask FROM best)
  GROUP BY seg ORDER BY seg"""


@pytest.mark.parametrize("trend", ["ascending", "descending",
                                   "auto_asc_desc"])
@pytest.mark.parametrize("n_profiles", [
    20, pytest.param(200, marks=pytest.mark.full)])
def test_scenario_sql_matches_dp_fuzz(trend, n_profiles):
    con = duckdb.connect()
    rng = np.random.default_rng(zlib.crc32(trend.encode()) ^ 0x5C)
    checked = 0
    for t in range(n_profiles):
        n = int(rng.integers(2, 9))
        n_s = int(rng.integers(2, 4))
        NEm = rng.integers(0, 25, (n, n_s)).astype(float)
        EVm = rng.integers(0, 25, (n, n_s)).astype(float)
        if (NEm.sum(axis=0) == 0).any() or (EVm.sum(axis=0) == 0).any():
            continue
        sol = solve_scenarios(NEm, EVm, monotonic_trend=trend)
        rows = con.execute(_sc_sql(NEm, EVm, trend)).fetchall()
        if sol.status == "INFEASIBLE":
            assert rows == []
            continue
        want = [(i, NEm[j:k + 1].sum(), EVm[j:k + 1].sum())
                for i, (j, k) in enumerate(sol.segments)]
        got = [tuple(r) for r in rows]
        assert got == want, (t, trend, got, want)
        checked += 1
    assert checked > n_profiles // 2
