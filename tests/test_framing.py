"""Framer parity — ports of lib/codecs/src/decoding/framing/* tests."""

import gzip

import pytest

from vector_ray.framing import (
    GELF_MAGIC,
    frame_character_delimited,
    frame_chunked_gelf,
    frame_length_delimited,
    frame_newline,
    frame_octet_counting,
    frame_varint_length_delimited,
    framed_source,
)


def test_newline_basic_and_trailing_fragment():
    assert frame_newline(b"a\nbc\n") == [b"a", b"bc"]
    # fragment without trailing newline is still a frame
    assert frame_newline(b"a\nbc") == [b"a", b"bc"]
    assert frame_newline(b"") == []


def test_newline_max_length_discards():
    # LinesCodec discard semantics: over-long frames are dropped whole
    assert frame_newline(b"short\nwaytoolongline\nok", max_length=6) == [b"short", b"ok"]


def test_character_delimited():
    assert frame_character_delimited(b"a,b,,c", b",") == [b"a", b"b", b"", b"c"]
    assert frame_character_delimited(b"a;b;", b";") == [b"a", b"b"]


def test_length_delimited_roundtrip():
    # tokio LengthDelimitedCodec default: 4-byte big-endian prefix
    data = b"".join(len(f).to_bytes(4, "big") + f for f in (b"foo", b"", b"barbaz"))
    assert frame_length_delimited(data) == [b"foo", b"", b"barbaz"]
    with pytest.raises(ValueError):
        frame_length_delimited(data + b"\x00\x00\x00\x05oops")


def test_varint_length_delimited():
    def varint(n):
        out = b""
        while True:
            b, n = n & 0x7F, n >> 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out

    big = b"x" * 300
    data = varint(3) + b"foo" + varint(300) + big
    assert frame_varint_length_delimited(data) == [b"foo", big]


def test_octet_counting_rfc6587():
    # octet_counting.rs: "<count> <msg>" frames, non-transparent
    # newline fallback for invalid prefixes
    msg1 = b"<13>1 2023 host app - - - hi"
    data = str(len(msg1)).encode() + b" " + msg1 + b"5 hello"
    assert frame_octet_counting(data) == [msg1, b"hello"]
    # invalid prefix falls back to the next newline
    assert frame_octet_counting(b"notacount here\n3 abc") == [b"notacount here", b"abc"]


def test_chunked_gelf_reassembly():
    mid = (42).to_bytes(8, "big")
    c0 = GELF_MAGIC + mid + bytes([0, 2]) + b'{"version":"1.1","host":"a",'
    c1 = GELF_MAGIC + mid + bytes([1, 2]) + b'"short_message":"m"}'
    whole = b'{"version":"1.1","host":"b","short_message":"w"}'
    # out-of-order arrival, duplicate chunk kept-first, plus a whole datagram
    out = frame_chunked_gelf([c1, whole, c0, c1])
    assert whole in out
    assert b'{"version":"1.1","host":"a","short_message":"m"}' in out
    assert len(out) == 2
    # incomplete message (missing chunk) is dropped
    assert frame_chunked_gelf([c0]) == []
    # gzip-compressed whole datagram decompresses transparently
    assert frame_chunked_gelf([gzip.compress(whole)]) == [whole]


def test_framed_source_reads_files(ray_session, tmp_path):
    p = tmp_path / "log.txt"
    p.write_bytes(b"one\ntwo\nthree\n")
    ds = framed_source(str(p), frame_newline, as_string=True)
    assert sorted(r["message"] for r in ds.take_all()) == ["one", "three", "two"]


def test_framed_source_in_topology(ray_session, tmp_path):
    """framed source type drives a full config topology."""
    from vector_ray.topology import Topology

    p = tmp_path / "syslog.bin"
    msg = b"<13>1 host app m1"
    p.write_bytes(str(len(msg)).encode() + b" " + msg + b"8 m2 short")
    topo = Topology({
        "sources": {"in": {"type": "framed", "path": str(p),
                           "framing": "octet_counting"}},
        "transforms": {"keep": {"type": "filter", "inputs": ["in"],
                                "condition": ".message != ''"}},
        "sinks": {},
    })
    rows = topo._build("keep").take_all()
    assert sorted(r["message"] for r in rows) == ["<13>1 host app m1", "m2 short"]


def test_enframe_roundtrips():
    from vector_ray import framing as fr

    frames = [b"foo", b"", b"bar baz", b"x" * 200]
    assert fr.frame_newline(fr.enframe_newline([b"a", b"b"])) == [b"a", b"b"]
    assert fr.frame_length_delimited(fr.enframe_length_delimited(frames)) == frames
    assert fr.frame_varint_length_delimited(
        fr.enframe_varint_length_delimited(frames)) == frames
    nonempty = [b"foo", b"bar baz"]
    assert fr.frame_octet_counting(fr.enframe_octet_counting(nonempty)) == nonempty
    assert fr.frame_character_delimited(
        fr.enframe_character_delimited(nonempty, b"|"), b"|") == nonempty


def test_framed_source_with_decoding(ray_session, tmp_path):
    """Reference-style framing + decoding pair on one source config."""
    from vector_ray.topology import Topology

    msg = b"<34>1 2003-10-11T22:14:15.003Z mymachine su - ID47 - 'su root' failed"
    p = tmp_path / "syslog.bin"
    p.write_bytes(str(len(msg)).encode() + b" " + msg)
    topo = Topology({
        "sources": {"in": {"type": "framed", "path": str(p),
                           "framing": "octet_counting",
                           "decoding": "syslog"}},
        "transforms": {"t": {"type": "filter", "inputs": ["in"],
                             "condition": "true"}},
        "sinks": {},
    })
    rows = topo._build("t").take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["appname"] == "su" and r["hostname"] == "mymachine"


def test_write_framed_roundtrip(ray_session, tmp_path):
    """Framed sink → framed source roundtrip (octet counting)."""
    import glob

    import pyarrow as pa
    import ray.data as rd

    from vector_ray import framing as fr
    from vector_ray.sinks import write_framed

    msgs = ["alpha", "beta gamma", "d"]
    ds = rd.from_arrow(pa.table({"message": msgs}))
    out = str(tmp_path / "framed")
    write_framed(ds, out, framing="octet_counting")
    data = b"".join(open(f, "rb").read() for f in sorted(glob.glob(out + "/*")))
    assert sorted(f.decode() for f in fr.frame_octet_counting(data)) == sorted(msgs)


def test_framed_source_chunked_streaming(ray_session, tmp_path):
    """A file larger than chunk_bytes streams in chunks with correct
    frame boundaries across chunk edges."""
    p = tmp_path / "big.log"
    lines = [f"line-{i:06d}" for i in range(5000)]
    p.write_bytes(("\n".join(lines) + "\n").encode())
    ds = framed_source(str(p), frame_newline, as_string=True, chunk_bytes=4096)
    got = sorted(r["message"] for r in ds.take_all())
    assert got == sorted(lines)


def test_framed_source_split_boundaries_exhaustive(ray_session, tmp_path):
    """Byte-range splits reproduce exact frames at every chunk size —
    including ranges landing exactly on frame starts and mid-frame."""
    p = tmp_path / "b.log"
    lines = [f"x{i}" * (i % 4 + 1) for i in range(200)]
    p.write_bytes(("\n".join(lines) + "\n").encode())
    for cb in (7, 16, 33, 100):
        ds = framed_source(str(p), frame_newline, as_string=True, chunk_bytes=cb)
        got = sorted(r["message"] for r in ds.take_all())
        assert got == sorted(lines), cb


def test_framed_source_runaway_frame_capped(ray_session, tmp_path):
    """A delimiter-less stretch longer than max_frame_bytes is dropped
    instead of pulling the rest of the file into one task."""
    p = tmp_path / "runaway.log"
    good = [f"g{i}" for i in range(50)]
    p.write_bytes(
        ("\n".join(good[:25]) + "\n").encode()
        + b"X" * 200_000  # delimiter-less runaway
        + ("\n" + "\n".join(good[25:]) + "\n").encode()
    )
    ds = framed_source(str(p), frame_newline, as_string=True,
                       chunk_bytes=8192, max_frame_bytes=16384)
    got = [r["message"] for r in ds.take_all()]
    # every good line survives; the runaway frame does not appear whole
    assert set(good) <= set(got)
    assert not any(len(m) > 100_000 for m in got)


def test_multibyte_delimiter_falls_back_to_whole_file(ray_session, tmp_path):
    """A multi-byte delimiter bypasses ranged splits (boundary probes
    are single-byte) — frames stay exact."""
    from functools import partial

    from vector_ray.framing import frame_character_delimited

    p = tmp_path / "multi.dat"
    frames = [f"f{i}".encode() for i in range(100)]
    p.write_bytes(b"||".join(frames) + b"||")
    ds = framed_source(
        str(p), partial(frame_character_delimited, delimiter=b"||"),
        as_string=True, chunk_bytes=16,
    )
    got = sorted(r["message"] for r in ds.take_all())
    assert got == sorted(f.decode() for f in frames)


def test_in_range_overlong_frame_dropped(ray_session, tmp_path):
    """max_frame_bytes applies to frames fully inside one range too."""
    p = tmp_path / "inrange.log"
    p.write_bytes(b"ok1\n" + b"Y" * 5000 + b"\nok2\n" + b"z" * 200_000)
    ds = framed_source(str(p), frame_newline, as_string=True,
                       chunk_bytes=100_000, max_frame_bytes=1000)
    got = sorted(r["message"] for r in ds.take_all())
    assert got == ["ok1", "ok2"]
