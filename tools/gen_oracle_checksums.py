"""Regenerate tests/oracle_checksums.json — the committed ledger of
VERIFIED oracle SQL.

The r10 advisor finding: DEBUT_ORACLE_QUERIES was maintained by
convention ("list the additions/edits here every round"), so the exact
r9 gap it closes — fresh oracle SQL that no gate ever executed against
DuckDB — could recur if a round forgets the manual step. This ledger
makes the check mechanical: tests/test_driver_contract.py asserts every
oracle_sql() entry either (a) md5-matches its committed checksum (the
SQL ran under a prior round's gates) or (b) is listed in
DEBUT_ORACLE_QUERIES, whose test executes the DuckDB side in-repo NOW.
A forgotten debut entry therefore fails the suite instead of shipping.

Run AFTER the local differential gates pass (check_oracle at sf0.001 +
sf0.01), never before — regenerating checksums for unverified SQL would
defeat the ledger. Commit the refreshed file with the round.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "oracle_checksums.json",
)


def checksums() -> dict[str, str]:
    return {
        name: hashlib.md5(sql.encode()).hexdigest()
        for name, sql in sorted(entrymod.oracle_sql().items())
    }


def main() -> None:
    with open(OUT, "w") as f:
        json.dump(checksums(), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(checksums())} entries)")


if __name__ == "__main__":
    main()
