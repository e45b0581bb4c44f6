"""demo_logs source — deterministic synthetic log generator.

Reference: src/sources/demo_logs.rs:106-141 (formats Shuffle /
ApacheCommon / ApacheError / Syslog / Json).  Ray-native: ray.data.range
→ vectorized render in map_batches; fully deterministic per row index
so tests can oracle the output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_METHODS = np.array(["GET", "POST", "PUT", "DELETE"])
_PATHS = np.array(["/", "/api/v1/items", "/login", "/metrics", "/health"])
_LEVELS = np.array(["INFO", "WARN", "ERROR", "DEBUG"])


def _render(fmt: str):
    def _f(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy()
        status = np.where(i % 10 < 7, 200, np.where(i % 10 < 9, 404, 500))
        if fmt == "apache_common":
            msg = [
                f"10.0.{k % 256 // 16}.{k % 16} - user{k % 7} [01/Jan/2024:00:{k % 60:02d}:00 +0000] "
                f'"{_METHODS[k % 4]} {_PATHS[k % 5]} HTTP/1.1" {s} {100 + k % 900}'
                for k, s in zip(i.tolist(), status.tolist())
            ]
        elif fmt == "syslog":
            msg = [
                f"<{k % 8}>1 2024-01-01T00:00:{k % 60:02d}Z host{k % 5} app{k % 3} {k % 100} - - "
                f"{_LEVELS[k % 4]} event {k}"
                for k in i.tolist()
            ]
        elif fmt == "json":
            msg = [
                f'{{"level": "{_LEVELS[k % 4]}", "code": {int(s)}, "seq": {k}}}'
                for k, s in zip(i.tolist(), status.tolist())
            ]
        elif fmt == "apache_error":
            msg = [
                f"[2024-01-01 00:{k % 60:02d}:00] [error] [client 10.0.0.{k % 256 % 16}] "
                f"File does not exist: {_PATHS[k % 5]}"
                for k in i.tolist()
            ]
        elif fmt == "bsd_syslog":  # RFC 3164
            msg = [
                f"<{k % 8}>Jan  1 00:{k % 60:02d}:00 host{k % 5} app{k % 3}[{k % 100}]: "
                f"{_LEVELS[k % 4]} event {k}"
                for k in i.tolist()
            ]
        else:
            raise ValueError(f"unknown demo format {fmt!r}")
        return pa.table(
            {
                "seq": pa.array(i),
                "message": pa.array(msg, type=pa.string()),
                "timestamp": pa.array(1_700_000_000_000_000 + i * 1_000_000).cast(
                    pa.timestamp("us")
                ),
                "host": pa.array([f"host{k % 5}" for k in i.tolist()]),
                "source_type": pa.array(["demo_logs"] * len(i)),
            }
        )

    return _f


def demo_logs(count: int, fmt: str = "apache_common", lines=None):
    """Formats: apache_common / apache_error / syslog (RFC 5424) /
    bsd_syslog (RFC 3164) / json / shuffle (cycle user ``lines`` —
    demo_logs.rs Shuffle variant, deterministic rotation)."""
    if fmt == "shuffle":
        if not lines:
            raise ValueError("a non-empty list of lines is required for the shuffle format")
        arr = np.asarray(lines, dtype=object)

        def _sh(batch: pa.Table) -> pa.Table:
            i = batch["id"].to_numpy()
            msg = arr[i % len(arr)]
            return pa.table({
                "seq": pa.array(i),
                "message": pa.array(msg.tolist(), type=pa.string()),
                "timestamp": pa.array(1_700_000_000_000_000 + i * 1_000_000).cast(pa.timestamp("us")),
                "host": pa.array([f"host{k % 5}" for k in i.tolist()]),
                "source_type": pa.array(["demo_logs"] * len(i)),
            })

        return rd.range(count).map_batches(_sh, batch_format="pyarrow")
    return rd.range(count).map_batches(_render(fmt), batch_format="pyarrow")
