"""Driver-contract invariants on the query registry, checked without
starting Spark: the driver hash-verifies only the FIRST 50 entries of
``queries()`` against ``oracle_sql()``, so an accidental reorder or a
dropped oracle would silently downgrade a window slot to the weaker
rows-only check. Pin the contract here instead of noticing it in the
next round's CORRECTNESS artifact."""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as E  # noqa: E402


# Rows-only BY NATURE (no SQL oracle can exist): the production
# approx-probe wide fit (HLL + GK sketch state) and the default
# weighted multi-objective counterfactual search. They still rotate
# through the driver window for rows+schema freshness (r15 verdict
# ask #2 rotated all 19 r13-vintage entries, these two included);
# their accuracy/search-space risk is bounded by hash-checked
# siblings (wide_fit_exact + wide_fit_contract; the three pinned
# counterfactuals + counterfactual_contract, the r16 brute-force
# optimality contract on the production CF configuration itself).
# Anything else in the window must be oracle-backed.
ROWS_ONLY_BY_NATURE = {"wide_process_fit", "counterfactual"}


def test_first_50_queries_are_all_oracle_backed():
    window = list(E.queries())[:50]
    oracles = set(E.oracle_sql())
    missing = [q for q in window
               if q not in oracles and q not in ROWS_ONLY_BY_NATURE]
    assert not missing, (
        "driver hash window contains queries with no oracle — they "
        f"would get only a rows-only check: {missing}")


def test_rows_only_allowlist_is_exactly_the_oracleless_registry():
    """The allowlist above must stay in lockstep with reality: every
    registered query WITHOUT an oracle is in it, and everything in it
    is a registered oracle-less query."""
    qs = set(E.queries())
    oracles = set(E.oracle_sql())
    oracleless = qs - oracles
    assert oracleless == ROWS_ONLY_BY_NATURE, (
        f"registry oracle-less set {sorted(oracleless)} != allowlist "
        f"{sorted(ROWS_ONLY_BY_NATURE)}")


def test_every_oracle_names_a_registered_query():
    qs = set(E.queries())
    stale = set(E.oracle_sql()) - qs
    assert not stale, f"oracle_sql has entries for unregistered: {stale}"


def test_oracle_sql_strings_are_nonempty_selects():
    for name, sql in E.oracle_sql().items():
        s = sql.strip().lower()
        assert s, f"{name}: empty oracle"
        assert s.startswith(("select", "with")), (
            f"{name}: oracle must be a SELECT/WITH statement")
