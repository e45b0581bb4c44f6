import pyarrow as pa
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture()
def log_events() -> pa.Table:
    """Small behavior-test log table (FIXTURES.md T2 shape)."""
    import numpy as np

    n = 40
    i = np.arange(n)
    return pa.table(
        {
            "message": pa.array([f"msg-{k % 6}" for k in i]),
            "timestamp": pa.array(1_700_000_000_000_000 + i * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "host": pa.array([f"host-{k % 3}" for k in i]),
            "a": pa.array([None if k % 7 == 0 else int(k % 4) for k in i], type=pa.int64()),
            "b": pa.array([int(k % 2) for k in i], type=pa.int64()),
            "second": pa.array([("x" if k % 2 == 0 else None) for k in i], type=pa.string()),
            "third": pa.array([("y" if k % 3 == 0 else None) for k in i], type=pa.string()),
            "request_id": pa.array([f"req-{k // 5}" for k in i]),
            "status": pa.array([(200 if k % 10 < 7 else (404 if k % 10 < 9 else 500)) for k in i], type=pa.int64()),
            "duration_ms": pa.array((i * 3.5) % 100.0),
            "seq": pa.array(i, type=pa.int64()),
        }
    )


@pytest.fixture()
def log_ds(log_events):
    import ray.data as rd

    return rd.from_arrow(log_events)
