"""DatadogSearch reference-vector parity sweep.

Runs every (query, pass_event, fail_event) triple from the reference's
``src/conditions/datadog_search.rs`` ``get_checks()`` matrix against our
from-scratch compiler (vector_ray/datadog_search.py) via
tools/dd_checks.py.  200 vectors covering bare terms, facets, tags,
wildcards, ranges, CIDR, boolean operators and quoting.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.dd_checks import DD_SRC, run_checks  # noqa: E402


@pytest.mark.skipif(not os.path.isfile(DD_SRC), reason="reference source not available")
def test_all_reference_checks_pass():
    ok, failures = run_checks()
    assert failures == [], failures[:10]
    assert ok >= 200, ok
