"""COVERAGE.md's "in-window" claims are GENERATED from the
correctness history, never hand-written (round-11 verdict: the doc
claimed pack_sequences_bpe was driver-verified when no
CORRECTNESS_r*.json had ever contained it). This test pins the
contract: every `(oracle..., in-window)` annotation names a query
with at least one driver hash row in some CORRECTNESS_r*.json OR a
seat in the current driver window (first DRIVER_WINDOW registry
entries — the driver will hash it when the round closes; round-12
verdict asked for exactly this so a mid-round rotation can't leave
the suite mechanically red), and every `(oracle..., tail)`
annotation names one with neither — i.e. running the sync tool is a
no-op on the committed doc."""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


def test_in_window_claims_match_correctness_history():
    from update_readme_counts import (_ANNOT, driver_checked_queries,
                                      pending_window_queries,
                                      sync_coverage_annotations)

    rewrites = sync_coverage_annotations(write=False)
    assert rewrites == [], (
        "COVERAGE.md annotations disagree with CORRECTNESS_r*.json "
        f"history — run tools/update_readme_counts.py: {rewrites}")
    # belt and braces: re-scan the doc directly
    checked = driver_checked_queries() | pending_window_queries()
    src = open(os.path.join(ROOT, "COVERAGE.md")).read()
    seen = 0
    for m in _ANNOT.finditer(src):
        name, pos = m.group("name"), m.group("pos")
        seen += 1
        if pos == "in-window":
            assert name in checked, (
                f"COVERAGE.md claims {name} is in-window but no "
                "CORRECTNESS_r*.json ever contained it")
    assert seen >= 10, f"annotation regex matched only {seen} rows"


def test_annotation_binds_to_nearest_preceding_name():
    """Regression: in a multi-query cell like
    "`ivf_topk`; `ivf_topk_pinned` (oracle, in-window)" the annotation
    must bind to `ivf_topk_pinned`, not to the earlier unannotated
    name — the original regex let the first name cross the second's
    backticks and claim (then corrupt) its in-window state."""
    from update_readme_counts import _ANNOT

    cell = ("| x | impl | `base_q`; `pinned_q` (oracle, in-window); "
            "`trained_q` (oracle: exhaustive, tail) |")
    got = [(m.group("name"), m.group("pos"))
           for m in _ANNOT.finditer(cell)]
    assert got == [("pinned_q", "in-window"), ("trained_q", "tail")], got


def test_annotated_names_are_registered_queries():
    """An annotation naming a query that no longer exists in the
    registry is stale documentation — catch renames."""
    from update_readme_counts import _ANNOT

    sys.path.insert(0, ROOT)
    import __spark_entry__ as E

    q = set(E.queries())
    src = open(os.path.join(ROOT, "COVERAGE.md")).read()
    unknown = {m.group("name") for m in _ANNOT.finditer(src)} - q
    assert not unknown, f"COVERAGE.md annotates unregistered: {unknown}"
