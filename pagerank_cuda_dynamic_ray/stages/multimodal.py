"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
typed metadata columns alongside. The decode / feature-extract / resize
/ frame-sample operators are actor-pool ``map_batches`` stages whose Ray
plumbing (schema, batch sizing, actor signature, output layout) is real
and tested; the actual media decoding is STUBBED — the codec libraries
are not available in this environment:

* ``mode="fake"`` (default): a deterministic hash-derived stand-in so
  pipelines and tests run end-to-end with stable outputs;
* ``mode="real"``: raises NotImplementedError at the decode call site —
  the single marked seam where a codec (Pillow/ffmpeg/...) plugs in.

Batches stay in ``batch_format="pyarrow"`` throughout: binary columns
round-trip zero-copy through Arrow but degrade to object dtype in
pandas (Ray guide pitfall).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic synthetic media table (binary payload from hashes)."""
    ids = np.arange(n, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    kinds = np.array(["image", "audio", "video"])[(h % np.uint64(3)).astype(int)]
    words = payload_bytes // 8
    payloads = []
    for i in ids:
        buf = splitmix64(np.arange(words, dtype=np.uint64) + np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
        payloads.append(buf.tobytes())
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(((h >> np.uint64(8)) % np.uint64(512) + np.uint64(32)).astype(np.int32)),
            "height": pa.array(((h >> np.uint64(20)) % np.uint64(512) + np.uint64(32)).astype(np.int32)),
            "n_frames": pa.array(((h >> np.uint64(32)) % np.uint64(240) + np.uint64(1)).astype(np.int32)),
            "sample_rate": pa.array(np.full(n, 16_000, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStage:
    """Actor-pool decode/feature stage: payload -> fixed-dim feature vector.

    Small batches by design: binary payloads are large, so
    ``batch_size`` must be sized so batch x concurrency fits worker
    heap (pass e.g. batch_size=64 for multi-MB payloads).
    """

    def __init__(self, mode: str = "fake", feature_dim: int = 16):
        self.mode = mode
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real media decoding requires codec libraries not present in "
                "this environment; plug Pillow/ffmpeg in here"
            )
        feats = []
        for buf in batch["payload"].to_pylist():
            arr = np.frombuffer(buf[: self.dim * 8].ljust(self.dim * 8, b"\0"), dtype=np.uint64)
            feats.append((splitmix64(arr).astype(np.float64) / 2**64).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Deterministic frame sampling for video rows: every k-th frame index,
    payload sliced per frame (stub slicing: equal byte stripes)."""

    def __init__(self, every_k: int = 10, mode: str = "fake"):
        self.k = every_k
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("real frame extraction needs ffmpeg")
        ids, kinds, frames, payloads = [], [], [], []
        for mid, kind, nf, buf in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["n_frames"].to_pylist(), batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            stride = max(1, len(buf) // max(nf, 1))
            for f in range(0, nf, self.k):
                ids.append(mid)
                kinds.append(kind)
                frames.append(f)
                payloads.append(buf[f * stride:(f + 1) * stride])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(frames, pa.int32()),
                "frame_payload": pa.array(payloads, pa.binary()),
            }
        )


def decode_features(media: rd.Dataset, mode: str = "fake", feature_dim: int = 16,
                    batch_size: int = 64, concurrency: int = 2) -> rd.Dataset:
    return media.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"mode": mode, "feature_dim": feature_dim},
    )


def sample_frames(media: rd.Dataset, every_k: int = 10, mode: str = "fake",
                  batch_size: int = 64, concurrency: int = 2) -> rd.Dataset:
    return media.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"every_k": every_k, "mode": mode},
    )
