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


def test_first_50_queries_are_all_oracle_backed():
    window = list(E.queries())[:50]
    oracles = set(E.oracle_sql())
    missing = [q for q in window if q not in oracles]
    assert not missing, (
        "driver hash window contains queries with no oracle — they "
        f"would get only a rows-only check: {missing}")


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
