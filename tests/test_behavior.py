"""Behavior-TOML harness — the `vector test` analog over our topology
(SURVEY.md §5.2); TOMLs under tests/behavior/ mirror the reference's
tests/behavior/transforms/*.toml semantics."""

import os

import pytest

from vector_ray.behavior import BehaviorTestFailure, run_behavior_dir, run_behavior_file

HERE = os.path.join(os.path.dirname(__file__), "behavior")


def test_all_behavior_tomls():
    results = run_behavior_dir(HERE)
    assert set(results) >= {
        "dedupe.toml",
        "filter.toml",
        "remap.toml",
        "route.toml",
        "sample_throttle.toml",
        "reduce.toml",
        "log_to_metric.toml",
    }
    assert all(len(v) >= 1 for v in results.values())


def test_failure_reporting(tmp_path):
    bad = tmp_path / "bad.toml"
    bad.write_text(
        """
[config.transforms.f]
type = "filter"
inputs = ["in"]
condition = ".x > 0"

[[tests]]
name = "wrong expectation"
[tests.input]
insert_at = "f"
rows = [{x = 1}]
[[tests.outputs]]
extract_from = "f"
count = 2
"""
    )
    with pytest.raises(BehaviorTestFailure, match="expected 2 rows"):
        run_behavior_file(str(bad))
