"""Stream framers — byte streams → message frames (§2.6 framing).

Reference: lib/codecs/src/decoding/framing/ — newline_delimited.rs,
character_delimited.rs, length_delimited.rs,
varint_length_delimited.rs, octet_counting.rs (RFC 6587),
chunked_gelf.rs.  Each framer here is a pure function over a complete
byte buffer (batch engines see whole objects, not sockets): it returns
the list of frames, applying the same boundary/overflow semantics the
reference's incremental decoders enforce.

``framed_source`` turns (path, framer) into a Ray Dataset with one row
per frame — the file-per-task read shape of sources/parquet.py.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Callable, Dict, List, Optional

import pyarrow as pa

GELF_MAGIC = b"\x1e\x0f"  # chunked_gelf.rs GELF_MAGIC


def frame_newline(data: bytes, max_length: Optional[int] = None) -> List[bytes]:
    """newline_delimited.rs: split on \\n; a trailing fragment without a
    newline is still a frame; frames over max_length are discarded
    (LinesCodec discard semantics)."""
    return frame_character_delimited(data, b"\n", max_length)


def frame_character_delimited(
    data: bytes, delimiter: bytes, max_length: Optional[int] = None
) -> List[bytes]:
    """character_delimited.rs: split on a 1-byte delimiter; over-long
    frames are discarded rather than truncated."""
    if not data:
        return []
    parts = data.split(delimiter)
    if parts and parts[-1] == b"":
        parts = parts[:-1]  # trailing delimiter closes the last frame
    if max_length is not None:
        parts = [p for p in parts if len(p) <= max_length]
    return parts


def frame_length_delimited(
    data: bytes, length_size: int = 4, byteorder: str = "big"
) -> List[bytes]:
    """length_delimited.rs (tokio LengthDelimitedCodec defaults): a
    ``length_size``-byte unsigned prefix, then that many payload bytes.
    A truncated trailing frame raises (the stream is incomplete)."""
    out = []
    i, n = 0, len(data)
    while i < n:
        if i + length_size > n:
            raise ValueError("truncated length prefix")
        ln = int.from_bytes(data[i : i + length_size], byteorder)
        i += length_size
        if i + ln > n:
            raise ValueError("truncated frame payload")
        out.append(data[i : i + ln])
        i += ln
    return out


def frame_varint_length_delimited(data: bytes) -> List[bytes]:
    """varint_length_delimited.rs: protobuf LEB128 varint length prefix."""
    out = []
    i, n = 0, len(data)
    while i < n:
        ln, shift = 0, 0
        while True:
            if i >= n:
                raise ValueError("truncated varint prefix")
            b = data[i]
            i += 1
            ln |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("varint length prefix too long")
        if i + ln > n:
            raise ValueError("truncated frame payload")
        out.append(data[i : i + ln])
        i += ln
    return out


def frame_octet_counting(data: bytes, max_length: Optional[int] = None) -> List[bytes]:
    """octet_counting.rs (RFC 6587 syslog): frames are ``<count> <msg>``
    where count is the byte length of msg.  A frame whose prefix isn't a
    valid count falls back to newline framing for that stretch (the
    reference falls back to LinesCodec); over-long frames are discarded.
    """
    out = []
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n and data[j : j + 1].isdigit():
            j += 1
        if j > i and j < n and data[j : j + 1] == b" ":
            ln = int(data[i:j])
            start = j + 1
            if start + ln <= n:
                frame = data[start : start + ln]
                if max_length is None or len(frame) <= max_length:
                    out.append(frame)
                i = start + ln
                continue
        # invalid prefix or truncated count: non-transparent fallback —
        # consume to the next newline as one frame
        nl = data.find(b"\n", i)
        end = n if nl == -1 else nl
        frame = data[i:end]
        if frame and (max_length is None or len(frame) <= max_length):
            out.append(frame)
        i = end + 1
    return out


def _maybe_decompress(payload: bytes) -> bytes:
    if payload[:2] == b"\x1f\x8b":  # GZIP_MAGIC
        try:
            return gzip.decompress(payload)
        except (OSError, EOFError):  # corrupt/truncated: per-message skip,
            return payload          # not a batch-fatal error
    if payload[:1] == b"\x78":  # ZLIB_MAGIC family
        try:
            return zlib.decompress(payload)
        except zlib.error:
            return payload
    return payload


def frame_chunked_gelf(datagrams: List[bytes]) -> List[bytes]:
    """chunked_gelf.rs: each datagram is either a whole GELF message or
    a chunk ``1e 0f | message_id u64 | seq u8 | total u8 | payload``.
    Chunks reassemble per message id in sequence order; messages with
    missing chunks are dropped (the reference times them out);
    duplicate chunks keep the first; gzip/zlib payloads decompress
    transparently (the reference's decoder does the same sniff)."""
    whole: List[bytes] = []
    pending: Dict[int, dict] = {}
    order: List[int] = []
    for dg in datagrams:
        if dg[:2] != GELF_MAGIC:
            whole.append(_maybe_decompress(dg))
            continue
        if len(dg) < 12:
            continue  # malformed chunk header
        mid = int.from_bytes(dg[2:10], "big")
        seq, total = dg[10], dg[11]
        if seq >= total:
            continue  # sequence beyond total (reference error, chunk dropped)
        entry = pending.get(mid)
        if entry is None:
            entry = {"total": total, "chunks": {}}
            pending[mid] = entry
            order.append(mid)
        if entry["total"] != total:
            continue  # conflicting totals: chunk dropped
        entry["chunks"].setdefault(seq, dg[12:])
    for mid in order:
        entry = pending[mid]
        if len(entry["chunks"]) == entry["total"]:
            payload = b"".join(entry["chunks"][s] for s in range(entry["total"]))
            whole.append(_maybe_decompress(payload))
    return whole


def framed_source(paths, framer: Callable[[bytes], List[bytes]], column: str = "message",
                  as_string: bool = False, chunk_bytes: int = 64 << 20,
                  max_frame_bytes: int = 64 << 20, **kw):
    """File-per-task framed reads → Dataset with one row per frame.

    Delimiter-based framers (newline / character_delimited) stream
    files larger than ``chunk_bytes`` in bounded chunks (the per-task
    generator yields one block per chunk, so Ray's streaming executor
    backpressures normally).  Length-prefixed framers read whole files:
    they are record containers, typically written bounded."""
    import os

    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = []
            for root, _d, fs in os.walk(paths):
                files += [os.path.join(root, f) for f in sorted(fs)]
        else:
            files = [paths]
    else:
        files = list(paths)

    delimiter = getattr(framer, "keywords", {}).get("delimiter") if hasattr(framer, "keywords") else None
    base = getattr(framer, "func", framer)
    delim = b"\n" if base is frame_newline else delimiter
    if delim is not None and len(delim) != 1:
        # ranged ownership probes exactly one boundary byte; a
        # multi-byte delimiter could also straddle a forward-read edge —
        # fall back to whole-file reads for those (rare) framings
        delim = None

    def _emit(frames: List[bytes], cap: Optional[int] = None) -> pa.Table:
        if cap is not None:
            frames = [f for f in frames if len(f) <= cap]
        if as_string:
            arr = pa.array([f.decode("utf-8", "replace") for f in frames], type=pa.string())
        else:
            arr = pa.array(frames, type=pa.binary())
        return pa.table({column: arr})

    # Delimiter framing splits each file into byte-range TASKS with
    # Hadoop-text-split adjustment (a frame belongs to the range its
    # first byte lands in): one giant log parallelizes across the
    # cluster instead of serializing through one reader.  Non-seekable
    # framings (length-prefixed, octet-counting) read whole files —
    # they are record containers, typically written bounded.
    splits = []
    for f in files:
        size = os.path.getsize(f)
        if delim is not None and size > chunk_bytes:
            for off in range(0, size, chunk_bytes):
                splits.append({"path": f, "offset": off,
                               "length": min(chunk_bytes, size - off),
                               "size": size})
        else:
            splits.append({"path": f, "offset": 0, "length": size, "size": size})

    def _read(batch: pa.Table):
        for p, off, ln, size in zip(
            batch["path"].to_pylist(),
            batch["offset"].to_pylist(),
            batch["length"].to_pylist(),
            # planning-time size: all ranges must agree on ONE snapshot
            # even if the file is appended between planning and reading
            batch["size"].to_pylist(),
        ):
            with open(p, "rb") as fh:
                if delim is None or (off == 0 and ln >= size):
                    yield _emit(framer(fh.read(size) if size else b""))
                    continue
                fh.seek(off - 1 if off else 0)
                prev_is_delim = off > 0 and fh.read(1) == delim
                buf = fh.read(ln)
                if off > 0 and not prev_is_delim:
                    # a frame belongs to the range holding its FIRST
                    # byte: when off lands mid-frame, the head fragment
                    # is the previous range's (it reads forward to
                    # finish it); when off-1 was the delimiter, the
                    # frame starting AT off is ours — no skip
                    cut = buf.find(delim)
                    if cut == -1:
                        continue  # no frame STARTS in this range
                    buf = buf[cut + 1 :]
                # complete the boundary-spanning tail frame from the next
                # range (read forward to its delimiter); an EMPTY buf
                # means no frame starts in this range — the next frame
                # begins at the next range's offset and belongs to it
                if buf and off + ln < size and not buf.endswith(delim):
                    tail_start = buf.rfind(delim) + 1  # 0 when buf is all one frame
                    while True:
                        more = fh.read(1 << 20)
                        if not more:
                            break
                        cut = more.find(delim)
                        if cut != -1:
                            buf += more[: cut + 1]
                            break
                        buf += more
                        if len(buf) - tail_start > max_frame_bytes:
                            break  # stop pulling; frame dropped below
                    if len(buf) - tail_start > max_frame_bytes:
                        # runaway frame (delimiter-less stretch): drop it
                        # rather than pull the rest of the file into one
                        # worker (LinesCodec max-length discard semantics)
                        buf = buf[:tail_start]
                if buf:
                    # over-long frames inside the range are dropped too,
                    # so the cap doesn't depend on chunk alignment
                    yield _emit(framer(buf), cap=max_frame_bytes)

    items = rd.from_items(splits)
    return items.repartition(max(1, len(splits))).map_batches(
        _read, batch_format="pyarrow", batch_size=None, **kw
    )


# ----------------------------------------------------------- encode side
# (lib/codecs/src/encoding/framing/: the sink-side inverses)

def enframe_newline(frames: List[bytes]) -> bytes:
    return b"".join(f + b"\n" for f in frames)


def enframe_character_delimited(frames: List[bytes], delimiter: bytes) -> bytes:
    return delimiter.join(frames) + (delimiter if frames else b"")


def enframe_length_delimited(
    frames: List[bytes], length_size: int = 4, byteorder: str = "big"
) -> bytes:
    return b"".join(len(f).to_bytes(length_size, byteorder) + f for f in frames)


def enframe_varint_length_delimited(frames: List[bytes]) -> bytes:
    def varint(n: int) -> bytes:
        out = bytearray()
        while True:
            b, n = n & 0x7F, n >> 7
            out.append(b | (0x80 if n else 0))
            if not n:
                return bytes(out)

    return b"".join(varint(len(f)) + f for f in frames)


def enframe_octet_counting(frames: List[bytes]) -> bytes:
    """RFC 6587 octet-counting: ``<len> <msg>`` per frame."""
    return b"".join(str(len(f)).encode() + b" " + f for f in frames)
