"""Multimodal binary columns: opaque payload + typed metadata, processed
by actor-pool ``map_batches`` stages.

The engine treats image / audio / video payloads as an Arrow ``binary``
column plus typed metadata columns (``media_type, height, width,
n_frames``) — the reference's np.ndarray payloads (SURVEY.md §1.1
"Image") made columnar. Stages here implement the Ray-side plumbing
(schema, batch sizing, actor warm state, output layout) with a real
deterministic codec for raw frames; decoding *compressed* formats
(JPEG/PNG/audio) is stubbed behind an import-try because the codec
libraries are not in this environment — the stage contract (binary in,
typed columns out) is identical.

Scale notes: payload rows are MB-scale, so these stages run with small
``batch_size`` (default 16) and rely on Arrow binary columns being
zero-copy views into object-store blocks; nothing here materializes
more than one batch per actor.
"""
from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = [
    "encode_frames",
    "decode_frames",
    "decode_compressed_image",
    "encode_pcm",
    "decode_pcm",
    "ImageStats",
    "ImageResize",
    "FrameSampler",
    "AudioFeatures",
    "MEDIA_BATCH_SIZE",
]

MEDIA_BATCH_SIZE = 16  # payload rows are big; keep batch x concurrency in heap

_MAGIC = b"OCRF"  # raw-frame container: magic, n_frames, height, width (u32 BE)


def encode_frames(arr: np.ndarray) -> bytes:
    """Serialize uint8 frames to the opaque payload format.
    Accepts (h, w) for a still image or (n, h, w) for a frame stack."""
    if arr.ndim == 2:
        arr = arr[None, :, :]
    if arr.ndim != 3 or arr.dtype != np.uint8:
        raise ValueError("expected uint8 (h,w) or (n,h,w)")
    n, h, w = arr.shape
    return _MAGIC + struct.pack(">III", n, h, w) + np.ascontiguousarray(arr).tobytes()


def decode_frames(payload: bytes) -> np.ndarray:
    """Inverse of :func:`encode_frames` -> (n, h, w) uint8."""
    if len(payload) < 16 or payload[:4] != _MAGIC:
        raise ValueError("not an OCRF raw-frame payload")
    n, h, w = struct.unpack(">III", payload[4:16])
    need = n * h * w
    body = np.frombuffer(payload, dtype=np.uint8, offset=16)
    if body.size != need:
        raise ValueError(f"payload truncated: {body.size} != {need}")
    return body.reshape(n, h, w)


def decode_compressed_image(payload: bytes) -> np.ndarray:
    """STUB — compressed-image decode (JPEG/PNG). The sandbox ships no
    imaging codec; with PIL/cv2 installed this is a 3-line body. The
    surrounding stages only require 'bytes -> uint8 ndarray'."""
    try:  # pragma: no cover - not installed here
        import PIL.Image  # noqa: F401
        import io

        return np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("L"))
    except ImportError as ex:
        raise NotImplementedError(
            "compressed-image decode needs an imaging codec (PIL/cv2); "
            "use encode_frames/decode_frames raw payloads in this environment"
        ) from ex


_PCM_MAGIC = b"OCRA"  # raw-audio container: magic, n_samples, rate (u32 BE), int16 LE


def encode_pcm(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Serialize int16 mono PCM to the opaque audio payload format."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("expected int16 1-D samples")
    return (
        _PCM_MAGIC
        + struct.pack(">II", samples.size, rate)
        + samples.astype("<i2").tobytes()
    )


def decode_pcm(payload: bytes) -> tuple[np.ndarray, int]:
    """Inverse of :func:`encode_pcm` -> (samples int16, rate)."""
    if len(payload) < 12 or payload[:4] != _PCM_MAGIC:
        raise ValueError("not an OCRA raw-audio payload")
    n, rate = struct.unpack(">II", payload[4:12])
    body = np.frombuffer(payload, dtype="<i2", offset=12)
    if body.size != n:
        raise ValueError(f"payload truncated: {body.size} != {n}")
    return body, rate


class AudioFeatures:
    """Actor stage: audio payload -> typed feature columns (duration,
    RMS energy, zero-crossing rate). Same contract as ImageStats — a
    real decoder (compressed formats would slot in where decode_pcm
    sits, exactly like decode_compressed_image for images)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zcr = [], [], []
        for payload in batch.column("payload"):
            samples, rate = decode_pcm(payload.as_py())
            x = samples.astype(np.float64) / 32768.0
            dur.append(samples.size / rate)
            rms.append(float(np.sqrt(np.mean(x * x))) if x.size else 0.0)
            s = np.signbit(x)
            zc = int(np.count_nonzero(s[1:] != s[:-1]))
            zcr.append(zc / max(1, samples.size - 1))
        out = batch.drop_columns(["payload"])
        out = _set_or_append(out, "duration_sec", pa.array(np.round(dur, 6), pa.float64()))
        out = _set_or_append(out, "rms", pa.array(np.round(rms, 6), pa.float64()))
        return _set_or_append(out, "zcr", pa.array(np.round(zcr, 6), pa.float64()))


class ImageStats:
    """Actor stage: binary payload -> typed feature columns
    (height, width, ink_frac). Warm state: nothing heavy here, but the
    class shape is the model-holding contract (setup once per actor).

    ``keep_payload=True`` leaves the payload column in place so further
    payload stages (e.g. ImageResize) can CHAIN in the same streamed
    pipeline; ``prefix`` namespaces the feature columns so original and
    post-transform stats coexist on one row."""

    def __init__(self, ink_threshold: int = 128, keep_payload: bool = False,
                 prefix: str = ""):
        self.ink_threshold = ink_threshold
        self.keep_payload = keep_payload
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights, widths, inks = [], [], []
        for payload in batch.column("payload"):
            frames = decode_frames(payload.as_py())
            heights.append(frames.shape[1])
            widths.append(frames.shape[2])
            inks.append(float((frames[0] < self.ink_threshold).mean()))
        out = batch if self.keep_payload else batch.drop_columns(["payload"])
        # upstream stages (ImageResize) may already carry height/width:
        # overwrite in place instead of appending duplicates
        out = _set_or_append(out, f"{self.prefix}height", pa.array(heights, pa.int32()))
        out = _set_or_append(out, f"{self.prefix}width", pa.array(widths, pa.int32()))
        return _set_or_append(
            out, f"{self.prefix}ink_frac", pa.array(np.round(inks, 6), pa.float64())
        )


class ImageResize:
    """Actor stage: nearest-neighbour resize of every frame to
    (target_h, target_w); payload in, payload out (same container)."""

    def __init__(self, target_h: int = 64, target_w: int = 64,
                 dims_cols: bool = True):
        # dims_cols=False: don't write height/width (a chained stats
        # stage records them under its own prefix — writing here would
        # clobber the original dims already on the row)
        self.th, self.tw = target_h, target_w
        self.dims_cols = dims_cols

    def _resize(self, frames: np.ndarray) -> np.ndarray:
        n, h, w = frames.shape
        ys = np.minimum((np.arange(self.th) * h) // self.th, h - 1)
        xs = np.minimum((np.arange(self.tw) * w) // self.tw, w - 1)
        return frames[:, ys[:, None], xs[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [
            encode_frames(self._resize(decode_frames(p.as_py())))
            for p in batch.column("payload")
        ]
        idx = batch.schema.get_field_index("payload")
        out = batch.set_column(idx, "payload", pa.array(resized, pa.binary()))
        if not self.dims_cols:
            return out
        out = _set_or_append(out, "height", pa.array([self.th] * out.num_rows, pa.int32()))
        return _set_or_append(out, "width", pa.array([self.tw] * out.num_rows, pa.int32()))


class FrameSampler:
    """Actor stage for 'video' payloads: keep every k-th frame
    (deterministic), emit one row per kept frame with provenance
    (frame_idx) — the media analogue of the pdf page fan-out."""

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {"media_id": [], "frame_idx": [], "payload": []}
        for mid, payload in zip(batch.column("media_id"), batch.column("payload")):
            frames = decode_frames(payload.as_py())
            for i in range(0, frames.shape[0], self.k):
                rows["media_id"].append(mid.as_py())
                rows["frame_idx"].append(i)
                rows["payload"].append(encode_frames(frames[i]))
        return pa.table(
            {
                "media_id": pa.array(rows["media_id"], pa.int64()),
                "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
                "payload": pa.array(rows["payload"], pa.binary()),
            }
        )


def _set_or_append(t: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    i = t.schema.get_field_index(name)
    return t.set_column(i, name, arr) if i >= 0 else t.append_column(name, arr)
