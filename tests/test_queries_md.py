"""Staleness gate for the generated registry index (r9 verdict item 7)."""

from __future__ import annotations

import os
import sys


def test_queries_md_is_current():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    import gen_queries_md

    with open(os.path.join(root, "QUERIES.md")) as fh:
        committed = fh.read()
    assert committed == gen_queries_md.generate(), (
        "QUERIES.md is stale — run `python scripts/gen_queries_md.py` "
        "and commit the result"
    )
