"""Multimodal column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / feature-extracted / frame-sampled through
actor-pool ``map_batches`` stages.

The image/audio/video codec libraries are NOT in this container, so the
codec kernels are STUBS behind ``Codec`` (a real decoder raises
NotImplementedError; the deterministic ``fake`` codec parses the
payload header we synthesize).  Everything Ray-side is real and tested:
schemas, batch sizing for large binaries, actor signature (state loaded
once per actor in ``__init__``), and the output layout.

Payload wire format of the ``fake`` codec (deterministic synth):
  bytes 0-3   magic b"FAKE"
  bytes 4-7   width  (uint32 LE)
  bytes 8-11  height (uint32 LE)
  bytes 12-15 n_frames (uint32 LE; 1 = still image)
  bytes 16-   frame bytes (width*height per frame, row-major u8)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | video
        ("format", pa.string()),     # fake | png | jpeg | ... (stub past 'fake')
        ("nbytes", pa.int64()),
        ("payload", pa.binary()),
    ]
)

FEATURES_DIM = 64


def synth_media_from_documents(
    sf_dir: str, every_k_video: int = 5
) -> "ray.data.Dataset":
    """Deterministically derive a media table from documents.parquet:
    payload bytes are generated from the doc text (seeded by doc_id),
    every ``every_k_video``-th row is a 4-frame 'video'.

    Large-binary practice encoded here: payloads stay in ONE binary
    column; batch sizes in downstream stages are small (64) so
    batch x concurrency fits worker heaps.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        kinds, fmts, nbytes, payloads = [], [], [], []
        for i, (did, text) in enumerate(zip(ids, texts)):
            w = 8 + (did % 9)
            h = 8 + (did % 7)
            frames = 4 if (did % every_k_video) == 0 else 1
            rng = np.random.RandomState(did % (2**31 - 1))
            body = rng.randint(0, 256, size=w * h * frames, dtype=np.int64).astype(
                "u1"
            ).tobytes()
            payload = b"FAKE" + struct.pack("<III", w, h, frames) + body
            kinds.append("video" if frames > 1 else "image")
            fmts.append("fake")
            nbytes.append(len(payload))
            payloads.append(payload)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "format": pa.array(fmts, pa.string()),
                "nbytes": pa.array(nbytes, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


class Codec:
    """Per-format decoder registry, CAPABILITY-GATED at construction
    (= once per actor, in the stage's __init__): real image formats
    register iff PIL imports, real video formats iff cv2 imports; the
    deterministic ``fake`` codec is always available.  Formats without
    a registered decoder raise NotImplementedError — the *stage*
    contract (schema in/out, actor state, batch sizing) holds either
    way and is what this module locks down.
    """

    PIL_FORMATS = ("png", "jpeg", "jpg", "bmp", "gif", "webp")
    CV2_FORMATS = ("mp4", "avi", "mkv", "webm")

    def __init__(self) -> None:
        self._decoders = {"fake": self._decode_fake}
        try:  # capability gate: real image decoding via PIL
            from PIL import Image  # type: ignore

            self._pil_image = Image
            for fmt in self.PIL_FORMATS:
                self._decoders[fmt] = self._decode_pil
        except ImportError:
            self._pil_image = None
        try:  # capability gate: real video decoding via OpenCV
            import cv2  # type: ignore

            self._cv2 = cv2
            for fmt in self.CV2_FORMATS:
                self._decoders[fmt] = self._decode_cv2
        except ImportError:
            self._cv2 = None

    @property
    def formats(self) -> list[str]:
        return sorted(self._decoders)

    def decode(self, fmt: str, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        """-> (width, height, n_frames, frames u8 array [n, h, w])."""
        dec = self._decoders.get(fmt)
        if dec is None:
            raise NotImplementedError(
                f"codec {fmt!r}: no decoder library available in this runtime "
                f"(registered formats: {self.formats}); install PIL for image "
                "formats or cv2 for video formats"
            )
        return dec(payload)

    def _decode_fake(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        if payload[:4] != b"FAKE":
            raise ValueError("bad magic")
        w, h, n = struct.unpack("<III", payload[4:16])
        frames = np.frombuffer(payload, dtype=np.uint8, count=w * h * n, offset=16)
        return w, h, n, frames.reshape(n, h, w)

    def _decode_pil(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        import io

        img = self._pil_image.open(io.BytesIO(payload)).convert("L")
        a = np.asarray(img, dtype=np.uint8)
        h, w = a.shape
        return w, h, 1, a.reshape(1, h, w)

    def _decode_cv2(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        import os
        import tempfile

        # cv2.VideoCapture reads from a path; spill the payload to a
        # worker-local temp file (payloads are batch-sized, small)
        fd, path = tempfile.mkstemp(suffix=".bin")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            cap = self._cv2.VideoCapture(path)
            frames = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(
                    self._cv2.cvtColor(frame, self._cv2.COLOR_BGR2GRAY).astype(np.uint8)
                )
            cap.release()
        finally:
            os.unlink(path)
        if not frames:
            raise ValueError("no decodable frames in payload")
        arr = np.stack(frames)
        n, h, w = arr.shape
        return w, h, n, arr


class DecodeMedia:
    """A1-style actor stage: payload -> decoded shape metadata.
    (media_id, kind, width, height, n_frames)."""

    def __init__(self) -> None:
        self.codec = Codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("format").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws, hs, ns = [], [], []
        for fmt, p in zip(fmts, payloads):
            w, h, n, _ = self.codec.decode(fmt, p)
            ws.append(w)
            hs.append(h)
            ns.append(n)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames": pa.array(ns, pa.int32()),
            }
        )


class ExtractFeatures:
    """payload -> FEATURES_DIM float32 feature vector (byte histogram of
    the first frame, L2-normalized — deterministic stand-in for a model
    forward pass; a real model would load in __init__)."""

    def __init__(self) -> None:
        self.codec = Codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("format").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(fmts), FEATURES_DIM), dtype=np.float64)
        for i, (fmt, p) in enumerate(zip(fmts, payloads)):
            _, _, _, frames = self.codec.decode(fmt, p)
            hist = np.bincount(frames[0].ravel() >> 2, minlength=FEATURES_DIM)[
                :FEATURES_DIM
            ].astype(np.float64)
            norm = np.linalg.norm(hist)
            feats[i] = hist / norm if norm else hist
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "features": pa.array(
                    [row.astype(np.float32) for row in feats],
                    pa.list_(pa.float32()),
                ),
            }
        )


class SampleFrames:
    """video payload -> one row per sampled frame (every ``stride``-th):
    (media_id, frame_idx, frame_bytes).  Demonstrates the exploding
    (flat-map-shaped) stage over binary columns."""

    def __init__(self, stride: int = 2) -> None:
        self.codec = Codec()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("format").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy()
        o_id, o_idx, o_bytes = [], [], []
        for mid, fmt, p in zip(ids, fmts, payloads):
            _, _, n, frames = self.codec.decode(fmt, p)
            for fi in range(0, n, self.stride):
                o_id.append(int(mid))
                o_idx.append(fi)
                o_bytes.append(frames[fi].tobytes())
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "frame_bytes": pa.array(o_bytes, pa.binary()),
            }
        )


def media_pipeline(sf_dir: str, op: str = "decode") -> "ray.data.Dataset":
    """Wire a media op as an actor-pool stage with binary-safe batch
    sizing (small batches: payload bytes x batch_size x concurrency
    must fit the worker heap)."""
    media = synth_media_from_documents(sf_dir)
    cls = {"decode": DecodeMedia, "features": ExtractFeatures, "frames": SampleFrames}[
        op
    ]
    return media.map_batches(
        cls, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )
