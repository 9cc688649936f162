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

Names currently listed in DEBUT_ORACLE_QUERIES are NOT regenerated —
they keep the value from the last COMMITTED ledger (git show HEAD:...),
or are omitted if new. The r11 advisor gap: regenerating the ledger in
the same change as a new/edited oracle made the debut guard
self-bypassing (the fresh md5 satisfied the ledger check with no DEBUT
entry, so an unexecuted DuckDB twin could still ship). Baselining debut
names against HEAD means same-commit regeneration can never launder
them past the guard; they enter the ledger only at rotation, after the
debut test has executed their DuckDB side in-repo.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from tests.test_driver_contract import DEBUT_ORACLE_QUERIES

OUT = os.path.join(REPO, "tests", "oracle_checksums.json")


def _committed_ledger() -> dict[str, str]:
    try:
        blob = subprocess.run(
            ["git", "show", "HEAD:tests/oracle_checksums.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(blob)
    except (subprocess.CalledProcessError, json.JSONDecodeError, OSError):
        return {}


def checksums() -> dict[str, str]:
    committed = _committed_ledger()
    out = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        if name in DEBUT_ORACLE_QUERIES:
            if name in committed:  # keep the last VERIFIED value
                out[name] = committed[name]
            # new debut: omitted — it ledgers at rotation, not before
        else:
            out[name] = hashlib.md5(sql.encode()).hexdigest()
    return out


def main() -> None:
    with open(OUT, "w") as f:
        json.dump(checksums(), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(checksums())} entries)")


if __name__ == "__main__":
    main()
