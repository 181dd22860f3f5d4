"""Run the reference's fullstack-test expression corpus against the
engine (VERDICT r2 item 4 / SURVEY M7).

Each ``/root/reference/tests/fullstack-test/expr/*.test`` file is parsed
and executed by ``tiflash_tpu.testing.reftest``; expected outputs come
from the files themselves (TiDB's recorded answers — the strongest
parity oracle available).  ``reftest_manifest.json`` records each file's
expected status:

- ``pass``: >= 1 query verified, zero mismatches (a regression fails CI)
- ``zero``: parses and runs, but every query exercises documented-
  unsupported surface (reasons recorded per statement)
- ``unsupported``: file-level gap (JSON column type, generated columns,
  ...) with the reason in the manifest
- ``fail``: known semantic gap, tracked with a reason — xfail so a fix
  is surfaced as XPASS
"""

import glob
import json
import os
import pathlib

import pytest

HERE = pathlib.Path(__file__).parent
CORPUS = "/root/reference/tests/fullstack-test/expr"
MANIFEST = json.loads((HERE / "reftest_manifest.json").read_text())

FILES = sorted(os.path.basename(p) for p in glob.glob(f"{CORPUS}/*.test"))


@pytest.mark.skipif(not os.path.isdir(CORPUS),
                    reason="reference corpus not present")
@pytest.mark.parametrize("fname", FILES)
def test_reference_corpus_file(fname):
    from tiflash_tpu.testing.reftest import Unsupported, run_test_file

    entry = MANIFEST.get(fname, {"status": "pass"})
    status = entry["status"]
    if status == "fail":
        pytest.xfail(f"known gap: {entry.get('reason', '')}")
    try:
        checked = run_test_file(f"{CORPUS}/{fname}")
    except Unsupported as e:
        assert status == "unsupported", (
            f"{fname} newly unsupported: {e}")
        return
    if status == "pass":
        assert checked >= 1, f"{fname} verified no queries (was passing)"
    elif status == "zero":
        # all statements documented-unsupported — stays mismatch-free
        assert checked >= 0
    elif status == "unsupported":
        # previously file-level unsupported now runs: tighten manifest
        pytest.fail(f"{fname} now runs ({checked} checked) — promote it")


def test_manifest_counts():
    """The corpus scoreboard can only improve: fails/unsupported counts
    are ceilings, pass count is a floor."""
    from collections import Counter

    c = Counter(v["status"] for v in MANIFEST.values())
    assert c["pass"] >= 67, c
    assert c["fail"] <= 22, c
    assert c["unsupported"] <= 23, c
