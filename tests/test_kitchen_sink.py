"""End-to-end config-driven integration: framed source → decode →
remap → route → per-sink aggregate, all through the Topology registry —
the full `vector run` shape over the round-3 component set."""

import pyarrow as pa

from vector_ray.topology import Topology


def test_kitchen_sink_topology(ray_session, tmp_path):
    # octet-counted syslog-5424 stream with a planted bad frame
    msgs = [
        b"<34>1 2023-10-11T22:14:15.003Z host-a app - ID1 - level=INFO code=200",
        b"<34>1 2023-10-11T22:14:16.003Z host-b app - ID2 - level=ERROR code=500",
        b"<34>1 2023-10-11T22:14:17.003Z host-a app - ID3 - level=INFO code=204",
        b"not syslog at all",
    ]
    p = tmp_path / "stream.bin"
    p.write_bytes(b"".join(str(len(m)).encode() + b" " + m for m in msgs))

    topo = Topology({
        "sources": {
            "in": {"type": "framed", "path": str(p),
                   "framing": "octet_counting", "decoding": "syslog"},
        },
        "transforms": {
            "parse": {"type": "remap", "inputs": ["in"], "drop_on_error": True,
                      "steps": [
                          ["parse_regex", "msg",
                           r"level=(?P<level>\w+) code=(?P<code>\d+)"],
                      ]},
            "split": {"type": "route", "inputs": ["parse"],
                      "routes": {"errors": ".level == 'ERROR'",
                                 "ok": ".level == 'INFO'"}},
        },
        "sinks": {},
    })
    out = topo._build("split")
    ok_rows = out["ok"].take_all()
    err_rows = out["errors"].take_all()
    # bad frame decodes to error → dropped by decode; remap parses the rest
    assert len(ok_rows) == 2 and len(err_rows) == 1
    assert sorted(r["hostname"] for r in ok_rows) == ["host-a", "host-a"]
    assert err_rows[0]["code"] == "500" and err_rows[0]["hostname"] == "host-b"
