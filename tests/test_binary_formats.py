"""parse_cbor / parse_dnstap / tag_types_externally / set_semantic_meaning.

Fixture payloads are the documented examples from the reference's
function docs (website/cue/reference/remap/functions/parse_cbor.cue and
parse_dnstap.cue) — the same inputs its own doc tests assert on.
"""

import base64
import json

import pyarrow as pa
import pytest

from vector_ray.functions.binary_formats import (
    cbor_loads,
    parse_dns_message,
    parse_dnstap_payload,
)
from vector_ray.functions.scalar import FUNCTIONS, call

# parse_dnstap.cue example: a BIND ResolverQuery frame
DNSTAP_B64 = (
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zGgBy5wEIAxACGAEiEAAAAAAA"
    "AAAAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3WNlI2kwIAAAAB"
    "AAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAMAAoACOxjCAG9zVgzWgUDY29t"
    "AGAAbQAAAAByZLM4AAAAAQAAAAAAAQJoNQdleGFtcGxlA2NvbQAABgABAAApBNABAUAAADkA"
    "DwA1AAlubyBTRVAgbWF0Y2hpbmcgdGhlIERTIGZvdW5kIGZvciBkbnNzZWMtZmFpbGVkLm9y"
    "Zy54AQ=="
)


class TestCbor:
    def test_doc_example(self):
        # parse_cbor.cue: a1 65 field 65 value
        assert cbor_loads(base64.b64decode("oWVmaWVsZGV2YWx1ZQ==")) == {
            "field": "value"
        }

    def test_scalars(self):
        assert cbor_loads(bytes([0x17])) == 23
        assert cbor_loads(bytes([0x18, 0x64])) == 100
        assert cbor_loads(bytes([0x20])) == -1
        assert cbor_loads(bytes([0x39, 0x03, 0xE7])) == -1000
        assert cbor_loads(bytes([0xF4])) is False
        assert cbor_loads(bytes([0xF5])) is True
        assert cbor_loads(bytes([0xF6])) is None

    def test_floats(self):
        import struct

        assert cbor_loads(b"\xf9" + struct.pack(">e", 1.5)) == 1.5
        assert cbor_loads(b"\xfa" + struct.pack(">f", 0.25)) == 0.25
        assert cbor_loads(b"\xfb" + struct.pack(">d", 3.14159)) == 3.14159

    def test_nested_and_indefinite(self):
        # {"a": [1, 2], "b": h'0102'} definite
        buf = bytes.fromhex("a2616182010261624201 02".replace(" ", ""))
        assert cbor_loads(buf) == {"a": [1, 2], "b": b"\x01\x02"}
        # indefinite array [1, 2]: 9f 01 02 ff
        assert cbor_loads(bytes.fromhex("9f0102ff")) == [1, 2]
        # indefinite text "ab" from two chunks: 7f 61 61 61 62 ff
        assert cbor_loads(bytes.fromhex("7f61616162ff")) == "ab"
        # tag 0 (datetime string) passes through to the inner value
        assert cbor_loads(bytes.fromhex("c074323031332d30332d32315432303a30343a30305a")) \
            == "2013-03-21T20:04:00Z"

    def test_column_fn(self):
        col = pa.array(["oWVmaWVsZGV2YWx1ZQ=="])
        out = call("parse_cbor", col)
        assert dict(out.to_pylist()[0]) == {"field": "value"}
        # binary column path
        col = pa.array([base64.b64decode("oWVmaWVsZGV2YWx1ZQ==")], type=pa.binary())
        out = call("parse_cbor", col)
        assert dict(out.to_pylist()[0]) == {"field": "value"}

    def test_trailing_garbage_rejected(self):
        with pytest.raises(ValueError):
            cbor_loads(bytes([0x01, 0x01]))


class TestDnstap:
    def test_doc_example_envelope(self):
        d = parse_dnstap_payload(DNSTAP_B64)
        assert d["serverId"] == "james-Virtual-Machine"
        assert d["serverVersion"] == "BIND 9.16.3"
        assert d["dataType"] == "Message"
        assert d["dataTypeId"] == 1
        assert d["messageType"] == "ResolverQuery"
        assert d["messageTypeId"] == 3
        assert d["extraInfo"] == ""
        assert d["queryZone"] == "com."
        assert d["socketFamily"] == "INET6"
        assert d["socketProtocol"] == "UDP"
        assert d["timePrecision"] == "ns"

    def test_doc_example_request(self):
        d = parse_dnstap_payload(DNSTAP_B64)
        req = d["requestData"]
        h = req["header"]
        assert h["id"] == 37634
        assert h["qdCount"] == 1 and h["arCount"] == 1
        assert h["anCount"] == 0 and h["nsCount"] == 0
        assert not h["aa"] and not h["ad"] and not h["cd"] and not h["tc"]
        assert h["opcode"] == 0 and h["rcode"] == 0
        assert req["fullRcode"] == 0
        assert req["rcodeName"] == "NoError"
        q = req["question"][0]
        assert q["domainName"] == "facebook1.com."
        assert q["questionType"] == "A" and q["questionTypeId"] == 1
        assert q["class"] == "IN"
        opt = req["opt"]
        assert opt["udpPayloadSize"] == 512
        assert opt["do"] is True
        assert opt["ednsVersion"] == 0 and opt["extendedRcode"] == 0
        assert opt["options"][0] == {
            "optCode": 10,
            "optName": "Cookie",
            "optValue": "7GMIAb3NWDM=",
        }

    def test_doc_example_response(self):
        d = parse_dnstap_payload(DNSTAP_B64)
        res = d["responseData"]
        assert res["header"]["id"] == 45880
        assert res["fullRcode"] == 16
        opt = res["opt"]
        assert opt["udpPayloadSize"] == 1232
        assert opt["ednsVersion"] == 1 and opt["extendedRcode"] == 1
        assert opt["do"] is False
        ede = opt["ede"][0]
        assert ede["infoCode"] == 9
        assert ede["purpose"] == "DNSKEY Missing"
        assert ede["extraText"] == (
            "no SEP matching the DS found for dnssec-failed.org."
        )

    def test_lowercase_hostnames(self):
        # Same frame; hostnames already lowercase, so equal either way —
        # assert the flag is plumbed through by spot-checking one name.
        d = parse_dnstap_payload(DNSTAP_B64, lowercase_hostnames=True)
        assert d["requestData"]["question"][0]["domainName"] == "facebook1.com."

    def test_answer_rdata_rendering(self):
        import struct

        # Build a tiny response: header + 1 question + 1 A answer
        header = struct.pack(">HHHHHH", 7, 0x8180, 1, 1, 0, 0)
        qname = b"\x03foo\x03com\x00"
        question = qname + struct.pack(">HH", 1, 1)
        # answer uses compression pointer to offset 12 (the question name)
        answer = b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 300, 4) + bytes(
            [93, 184, 216, 34]
        )
        msg = parse_dns_message(header + question + answer)
        a = msg["answers"][0]
        assert a["domainName"] == "foo.com."
        assert a["recordType"] == "A"
        assert a["ttl"] == 300
        assert a["rData"] == "93.184.216.34"

    def test_column_fn(self):
        # typed nested output (parse_dnstap.cue shape), not a flat map
        out = call("parse_dnstap", pa.array([DNSTAP_B64]))
        m = out.to_pylist()[0]
        assert m["messageType"] == "ResolverQuery"
        assert m["requestData"]["question"][0]["domainName"] == "facebook1.com."
        assert m["responseData"]["header"]["rcode"] == 16  # EDNS-folded
        assert m["timestamp"] == "2020-06-30T03:50:07.920014129Z"


class TestTagTypes:
    def test_scalars(self):
        out = call("tag_types_externally", pa.array([123], type=pa.int64()))
        assert out.to_pylist()[0] == {"integer": 123}
        out = call("tag_types_externally", pa.array(["foo"]))
        assert out.to_pylist()[0] == {"string": "foo"}
        out = call("tag_types_externally", pa.array([67.9]))
        assert out.to_pylist()[0] == {"float": 67.9}
        out = call("tag_types_externally", pa.array([None], type=pa.string()))
        assert out.to_pylist()[0] is None

    def test_nested_object(self):
        col = pa.array([{"message": "Hello world", "duration_ms": 67.9}])
        out = call("tag_types_externally", col)
        m = out.to_pylist()[0]
        assert m["message"] == {"string": "Hello world"}
        assert m["duration_ms"] == {"float": 67.9}

    def test_root_array(self):
        col = pa.array([["foo", "bar"]], type=pa.list_(pa.string()))
        out = call("tag_types_externally", col)
        assert out.to_pylist()[0] == [{"string": "foo"}, {"string": "bar"}]


def test_set_semantic_meaning_noop():
    from vector_ray.functions.binary_formats import SEMANTIC_MEANINGS

    out = call("set_semantic_meaning", pa.array(["a", "b"]), "severity", ".level")
    assert len(out) == 2 and out.null_count == 2
    assert SEMANTIC_MEANINGS["severity"] == ".level"


def test_all_reference_names_registered():
    """Every documented remap function name resolves in FUNCTIONS or is
    implemented as a row-shaping stage (unnest)."""
    import os

    ref = "/root/reference/website/cue/reference/remap/functions"
    if not os.path.isdir(ref):
        pytest.skip("reference docs not present")
    names = {f[:-4] for f in os.listdir(ref) if f.endswith(".cue")}
    stage_level = {"unnest"}  # stages/unnest.py — changes row count
    missing = sorted(n for n in names if n not in FUNCTIONS and n not in stage_level)
    assert missing == [], f"unregistered reference functions: {missing}"
