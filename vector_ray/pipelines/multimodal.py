"""Multimodal columns — binary payloads with typed metadata.

Image/audio/video ride as opaque ``binary`` columns plus metadata
(width/height/sample_rate/...).  Decode / resize / frame-sample are
actor-pool map_batches stages; the decode kernels themselves are
STUBBED (no PIL/ffmpeg in this container) behind ``decoder=`` hooks —
the Ray-side plumbing (schema, small batch sizes for wide rows, actor
signature, output layout) is real and tested with the deterministic
fake decoder.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from ..functions.hashes import default_pool

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_batch(start: int, stop: int, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (seeded bytes) for plumbing tests."""
    n = stop - start
    rng = np.random.default_rng(start + 1)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:09d}" for i in range(start, stop)]),
            "kind": pa.array([kinds[i % 3] for i in range(start, stop)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n),
            "width": pa.array([64 + (i % 8) * 32 for i in range(start, stop)], type=pa.int32()),
            "height": pa.array([64 + (i % 5) * 32 for i in range(start, stop)], type=pa.int32()),
            "duration_ms": pa.array([1000 + (i % 10) * 500 for i in range(start, stop)], type=pa.int32()),
        }
    )


def fake_image_decoder(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: bytes → HxWx3.

    Replace with PIL/turbojpeg in production; same signature.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * 3
    arr = np.resize(arr, need)
    return arr.reshape(height, width, 3)


class ImageFeatures:
    """Actor-pool stage: decode → per-channel mean/std features.

    Real decoders go through the ``decoder`` hook; the default
    deterministic fake keeps the plumbing testable.  batch_size MUST
    stay small (wide binary rows): pass batch_size≈64-256 at call
    sites, never the 4096 text default.
    """

    def __init__(self, decoder: Optional[Callable] = None):
        self.decoder = decoder or fake_image_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        n = batch.num_rows
        means = np.zeros((n, 3), dtype=np.float64)
        stds = np.zeros((n, 3), dtype=np.float64)
        edge = np.zeros(n, dtype=np.float64)
        entropy = np.zeros(n, dtype=np.float64)
        for i, (p, w, h) in enumerate(zip(payloads, widths, heights)):
            img = self.decoder(p, w, h)
            flat = img.reshape(-1, 3)
            means[i] = flat.mean(axis=0)
            stds[i] = flat.std(axis=0)
            # real image math on the decoded array: mean |gradient|
            # (edge energy) and 64-bin luma histogram entropy
            luma = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            gx = np.abs(np.diff(luma, axis=1)).mean() if w > 1 else 0.0
            gy = np.abs(np.diff(luma, axis=0)).mean() if h > 1 else 0.0
            edge[i] = gx + gy
            hist, _ = np.histogram(luma, bins=64, range=(0, 256))
            pdist = hist / max(1, hist.sum())
            nz = pdist[pdist > 0]
            entropy[i] = float(-(nz * np.log2(nz)).sum())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mean_rgb": pa.array(list(means)),
                "std_rgb": pa.array(list(stds)),
                "edge_energy": pa.array(edge),
                "luma_entropy": pa.array(entropy),
            }
        )


class FrameSampler:
    """Actor-pool stage: video → every-nth-frame payload slices (STUB:
    slices the raw payload deterministically instead of demuxing)."""

    def __init__(self, every_ms: int = 500, decoder: Optional[Callable] = None):
        self.every_ms = every_ms
        if decoder is not None:
            raise NotImplementedError("real video demux not available in this container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            n_frames = max(1, dur // self.every_ms)
            step = max(1, len(payload) // n_frames)
            for f in range(n_frames):
                ids.append(mid)
                frame_idx.append(f)
                frames.append(payload[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def image_features(media_ds, batch_size: int = 128, concurrency=None, decoder=None):
    concurrency = concurrency or default_pool(divisor=8)
    ds = media_ds.map_batches(
        lambda b: b.filter(pa.compute.equal(b["kind"], "image")), batch_format="pyarrow"
    )
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media_ds, every_ms: int = 500, batch_size: int = 64, concurrency=None):
    concurrency = concurrency or default_pool(divisor=16)
    ds = media_ds.map_batches(
        lambda b: b.filter(pa.compute.equal(b["kind"], "video")), batch_format="pyarrow"
    )
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def fake_audio_decoder(payload: bytes, duration_ms: int) -> np.ndarray:
    """Deterministic stand-in for an audio decode: bytes → int16 PCM.
    Replace with soundfile/ffmpeg in production; same signature."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = max(1, duration_ms * 16)  # fake 16 samples/ms
    pcm = np.resize(arr.astype(np.int16), n)
    return (pcm - 128) * 256


class AudioFeatures:
    """Actor-pool stage: decode → RMS / zero-crossing-rate / peak /
    spectral-centroid / spectral-rolloff features per clip
    (librosa-style summary stats — the spectral features are real DSP
    via numpy rfft; only the decode itself goes through the hook)."""

    SR = 16_000  # fake decoder's sample rate (16 samples/ms)

    def __init__(self, decoder: Optional[Callable] = None):
        self.decoder = decoder or fake_audio_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        n = batch.num_rows
        rms = np.zeros(n)
        zcr = np.zeros(n)
        peak = np.zeros(n)
        centroid = np.zeros(n)
        rolloff = np.zeros(n)
        for i, (p, d) in enumerate(zip(payloads, durs)):
            pcm = self.decoder(p, d).astype(np.float64)
            rms[i] = np.sqrt(np.mean(pcm * pcm))
            zcr[i] = float(np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8)))))
            peak[i] = float(np.abs(pcm).max())
            mag = np.abs(np.fft.rfft(pcm))
            total = mag.sum()
            if total > 0:
                freqs = np.fft.rfftfreq(len(pcm), d=1.0 / self.SR)
                centroid[i] = float((freqs * mag).sum() / total)
                cum = np.cumsum(mag)
                rolloff[i] = float(freqs[np.searchsorted(cum, 0.85 * total)])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "rms": pa.array(rms),
                "zcr": pa.array(zcr),
                "peak": pa.array(peak),
                "spectral_centroid": pa.array(centroid),
                "spectral_rolloff": pa.array(rolloff),
            }
        )


class ImageResizer:
    """Actor-pool stage: decode → nearest-neighbor resize → raw RGB
    bytes + new dims.  The resize math is real (numpy index sampling);
    only the decode goes through the hook."""

    def __init__(self, out_w: int, out_h: int, decoder: Optional[Callable] = None):
        self.out_w = out_w
        self.out_h = out_h
        self.decoder = decoder or fake_image_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        out = []
        for p, w, h in zip(payloads, widths, heights):
            img = self.decoder(p, w, h)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            out.append(np.ascontiguousarray(img[yi[:, None], xi[None, :]]).tobytes())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, type=pa.binary()),
                "width": pa.array([self.out_w] * batch.num_rows, type=pa.int32()),
                "height": pa.array([self.out_h] * batch.num_rows, type=pa.int32()),
            }
        )


def audio_features(media_ds, batch_size: int = 128, concurrency=None, decoder=None):
    concurrency = concurrency or default_pool(divisor=8)
    ds = media_ds.map_batches(
        lambda b: b.filter(pa.compute.equal(b["kind"], "audio")), batch_format="pyarrow"
    )
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(media_ds, out_w: int, out_h: int, batch_size: int = 64,
                  concurrency=None, decoder=None):
    concurrency = concurrency or default_pool(divisor=8)
    ds = media_ds.map_batches(
        lambda b: b.filter(pa.compute.equal(b["kind"], "image")), batch_format="pyarrow"
    )
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
