"""Reference doc-example parity sweep.

Runs every runnable example from the reference's remap function specs
(website/cue/reference/remap/functions/*.cue — source snippet plus
expected `return:` literal) against our function registry via
tools/cue_sweep.py.  This is the widest single correctness net we have
for the VRL stdlib: 280+ examples across ~190 functions.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.cue_sweep import CUE_DIR, sweep  # noqa: E402


@pytest.mark.skipif(not os.path.isdir(CUE_DIR), reason="reference docs not available")
def test_all_doc_examples_pass():
    buckets = sweep()
    assert buckets["MISSING_FN"] == [], buckets["MISSING_FN"]
    assert buckets["ERROR"] == [], buckets["ERROR"]
    assert buckets["MISMATCH"] == [], buckets["MISMATCH"]
    # the runnable-coverage floor: regressions that silently divert
    # examples into SKIP buckets should fail loudly too
    assert len(buckets["OK"]) >= 363, {k: len(v) for k, v in buckets.items()}
