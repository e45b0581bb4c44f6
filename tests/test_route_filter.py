"""Route/filter behavior matrix — mirrors the reference's inline tests
(src/transforms/route.rs:179-421: multi-match copies, _unmatched,
reroute_unmatched=false; exclusive first-match-wins)."""

import pyarrow as pa
import ray.data as rd

from vector_ray.stages import (
    UNMATCHED,
    exclusive_route,
    exclusive_route_tagged,
    filter_stage,
    route,
    route_tagged,
)


def events():
    # route.rs:216-260 shape: first/second/third discriminating fields
    return rd.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2, 3]),
                "second": pa.array(["x", None, "x", None]),
                "third": pa.array(["y", "y", None, None]),
            }
        )
    )


ROUTES = {
    "even": ".id == 0 || .id == 2",
    "has_second": "exists(.second)",
}


def ids(ds):
    return sorted(r["id"] for r in ds.take_all())


def test_route_multimatch_copies():
    out = route(events(), ROUTES)
    assert ids(out["even"]) == [0, 2]
    assert ids(out["has_second"]) == [0, 2]
    assert ids(out[UNMATCHED]) == [1, 3]
    # masks stripped from outputs
    assert all(not c.startswith("__route__") for c in out["even"].schema().names)


def test_route_no_unmatched_port():
    out = route(events(), ROUTES, reroute_unmatched=False)
    assert UNMATCHED not in out


def test_route_tagged_duplicates_multimatch():
    tagged = route_tagged(events(), ROUTES)
    rows = sorted((r["id"], r["route"]) for r in tagged.take_all())
    assert rows == [
        (0, "even"),
        (0, "has_second"),
        (1, UNMATCHED),
        (2, "even"),
        (2, "has_second"),
        (3, UNMATCHED),
    ]


def test_exclusive_route_first_match_wins():
    out = exclusive_route(events(), ROUTES)
    assert ids(out["even"]) == [0, 2]
    assert ids(out["has_second"]) == []  # 0 and 2 already taken by 'even'
    assert ids(out[UNMATCHED]) == [1, 3]


def test_exclusive_route_tagged_label():
    tagged = exclusive_route_tagged(events(), {"a": "exists(.third)", "b": "exists(.second)"})
    rows = dict((r["id"], r["route"]) for r in tagged.take_all())
    assert rows == {0: "a", 1: "a", 2: "b", 3: UNMATCHED}


def test_filter(log_ds):
    out = filter_stage(log_ds, ".status == 500")
    rows = out.take_all()
    assert len(rows) == 4  # k%10==9 → 4 of 40
    assert all(r["status"] == 500 for r in rows)
