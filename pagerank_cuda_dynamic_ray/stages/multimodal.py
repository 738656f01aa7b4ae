"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
typed metadata columns alongside. The decode / feature-extract / resize
/ frame-sample operators are actor-pool ``map_batches`` stages whose Ray
plumbing (schema, batch sizing, actor signature, output layout) is real
and tested. Decoding comes in two tiers:

* ``mode="fake"`` (default): a deterministic hash-derived stand-in so
  pipelines and tests run end-to-end with stable outputs regardless of
  payload format;
* ``mode="real"``: REAL decoding for the uncompressed formats this
  container can handle with numpy + stdlib only —

  - images: binary PPM (``P6``) parsed and decoded to an RGB array;
  - audio: RIFF/WAV PCM16 parsed via the stdlib ``wave`` module;
  - video: a concatenation of equally-sized ``P6`` frames (a trivial
    uncompressed container), split frame-aligned;

  compressed codecs (JPEG/PNG/H.264/MP3/...) are the single marked
  seam: payloads whose magic bytes are not ``P6``/``RIFF`` raise
  ``NotImplementedError`` where Pillow/ffmpeg would plug in.

Batches stay in ``batch_format="pyarrow"`` throughout: binary columns
round-trip zero-copy through Arrow but degrade to object dtype in
pandas (Ray guide pitfall). Per-row loops here are inherent (payloads
are variable-length opaque blobs); all inner work is numpy.
"""

from __future__ import annotations

import io
import wave

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


# ---------------------------------------------------------------- codecs
# Uncompressed formats implementable with numpy + stdlib only.

def encode_ppm(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6)."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def _decode_ppm_at(buf: bytes, pos0: int = 0) -> tuple[np.ndarray, int]:
    """Decode one binary PPM (P6) frame starting at byte ``pos0``;
    returns (array, next position) so concatenated-frame video payloads
    can be walked frame by frame."""
    if buf[pos0:pos0 + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    n = len(buf)
    pos, tokens = pos0 + 2, []
    while len(tokens) < 3:
        # skip whitespace and comment lines
        while pos < n:
            c = buf[pos:pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                nl = buf.find(b"\n", pos)
                pos = n if nl < 0 else nl + 1
            else:
                break
        start = pos
        while pos < n and not buf[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, _maxval = tokens
    if n - pos < h * w * 3:
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(buf, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)
    return arr, pos + h * w * 3


def decode_ppm(buf: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) payload to an (h, w, 3) uint8 array.

    Spec-complete header handling: '#' comment lines (netpbm/GIMP/
    ImageMagick emit them) are skipped, and a truncated header raises
    ValueError instead of scanning past the buffer (an unbounded scan
    would spin an actor forever on one corrupt payload)."""
    return _decode_ppm_at(buf, 0)[0]


def iter_ppm_frames(buf: bytes):
    """Yield every (h, w, 3) frame of a concatenated-PPM video payload."""
    pos = 0
    while pos < len(buf):
        frame, pos = _decode_ppm_at(buf, pos)
        yield frame


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a mono PCM16 WAV payload."""
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV payload to (int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(buf), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        rate, nchan = wf.getframerate(), wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype="<i2")
    if nchan > 1:
        samples = samples.reshape(-1, nchan).mean(axis=1).astype(np.int16)
    return samples, rate


def synth_real_media_table(n: int, seed: int = 7, img_w: int = 32, img_h: int = 24,
                           audio_len: int = 2048, video_frames: int = 6) -> pa.Table:
    """Deterministic media table with REAL uncompressed payloads:
    PPM images, PCM16 WAV audio, concatenated-PPM video."""
    ids = np.arange(n, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    kinds = np.array(["image", "audio", "video"])[(h % np.uint64(3)).astype(int)]
    payloads, widths, heights, frames, rates = [], [], [], [], []

    def _pix(i: int, count: int) -> np.ndarray:
        words = splitmix64(np.arange(count, dtype=np.uint64) + np.uint64(seed * 97 + 13) * np.uint64(i + 1))
        return (words % np.uint64(256)).astype(np.uint8)

    for i, kind in zip(ids, kinds):
        if kind == "image":
            rgb = _pix(int(i), img_h * img_w * 3).reshape(img_h, img_w, 3)
            payloads.append(encode_ppm(rgb))
            widths.append(img_w); heights.append(img_h); frames.append(1); rates.append(0)
        elif kind == "audio":
            words = splitmix64(np.arange(audio_len, dtype=np.uint64) + np.uint64(seed * 31 + 7) * np.uint64(i + 1))
            samples = ((words % np.uint64(65536)).astype(np.int64) - 32768).astype(np.int16)
            payloads.append(encode_wav(samples, 16_000))
            widths.append(0); heights.append(0); frames.append(1); rates.append(16_000)
        else:
            fr = [encode_ppm(_pix(int(i) * 1000 + f, img_h * img_w * 3).reshape(img_h, img_w, 3))
                  for f in range(video_frames)]
            payloads.append(b"".join(fr))
            widths.append(img_w); heights.append(img_h); frames.append(video_frames); rates.append(0)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.asarray(widths, np.int32)),
            "height": pa.array(np.asarray(heights, np.int32)),
            "n_frames": pa.array(np.asarray(frames, np.int32)),
            "sample_rate": pa.array(np.asarray(rates, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


# ------------------------------------------------------------- features

def _image_features(rgb: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim image descriptor: per-channel mean/std + gray histogram."""
    f = np.zeros(dim, dtype=np.float64)
    chan = rgb.reshape(-1, 3).astype(np.float64)
    base = np.concatenate([chan.mean(axis=0) / 255.0, chan.std(axis=0) / 255.0])
    gray = chan.mean(axis=1)
    nbins = max(dim - 6, 1)
    hist, _ = np.histogram(gray, bins=nbins, range=(0.0, 255.0))
    vec = np.concatenate([base, hist / max(gray.size, 1)])
    f[: min(dim, vec.size)] = vec[:dim]
    return f


def _audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim audio descriptor: RMS/mean/std/ZCR + banded energies."""
    f = np.zeros(dim, dtype=np.float64)
    x = samples.astype(np.float64) / 32768.0
    if x.size == 0:
        return f
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if x.size > 1 else 0.0
    base = np.array([np.sqrt(np.mean(x * x)), x.mean(), x.std(), zcr])
    nband = max(dim - 4, 1)
    edge = np.linspace(0, x.size, nband + 1).astype(np.int64)
    bands = np.array([np.sqrt(np.mean(x[a:b] ** 2)) if b > a else 0.0
                      for a, b in zip(edge[:-1], edge[1:])])
    vec = np.concatenate([base, bands])
    f[: min(dim, vec.size)] = vec[:dim]
    return f


def _real_decode_one(kind: str, buf: bytes, dim: int) -> np.ndarray:
    if kind == "audio":
        if buf[:4] != b"RIFF":
            raise NotImplementedError(
                "compressed audio codec: plug an MP3/AAC decoder in here")
        samples, _rate = decode_wav(buf)
        return _audio_features(samples, dim)
    if buf[:2] != b"P6":
        raise NotImplementedError(
            "compressed image/video codec: plug Pillow/ffmpeg in here")
    return _image_features(decode_ppm(buf), dim)  # video: first frame


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
        feats = []
        if self.mode == "real":
            for kind, buf in zip(batch["kind"].to_pylist(), batch["payload"].to_pylist()):
                feats.append(_real_decode_one(kind, buf, self.dim).tolist())
        else:
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
    """Deterministic frame sampling for video rows: every k-th frame.

    ``mode="fake"``: payload sliced into equal byte stripes (stub).
    ``mode="real"``: payload is a concatenation of equally-sized P6
    frames; each sampled frame is emitted as a standalone PPM payload.
    Compressed containers raise at the marked seam.
    """

    def __init__(self, every_k: int = 10, mode: str = "fake"):
        self.k = every_k
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frames, payloads = [], [], [], []
        for mid, kind, nf, buf in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["n_frames"].to_pylist(), batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            if self.mode == "real":
                if buf[:2] != b"P6":
                    raise NotImplementedError(
                        "compressed video container: plug ffmpeg in here")
                flen = len(buf) // max(nf, 1)
                for f in range(0, nf, self.k):
                    ids.append(mid); kinds.append(kind); frames.append(f)
                    payloads.append(buf[f * flen:(f + 1) * flen])
            else:
                stride = max(1, len(buf) // max(nf, 1))
                for f in range(0, nf, self.k):
                    ids.append(mid); kinds.append(kind); frames.append(f)
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


def media_stats(media: rd.Dataset) -> rd.Dataset:
    """Exact-integer decode digest through the REAL codecs — the
    correctness anchor for the uncompressed decode path (the feature
    stages quantize to float; this op does not):

    * image: (n_units = pixels, s0/s1/s2 = per-channel pixel sums)
    * audio: (n_units = samples, s0 = Σ sample, s1 = Σ sample², s2 = 0)
    * video: every concatenated-PPM frame decoded; sums span all frames

    A header mis-parse, wrong byte offset or dropped frame changes the
    sums, so the SQL oracle (which re-derives the synthetic payload's
    pixel/sample stream arithmetically, never parsing bytes) pins the
    decoders bit-for-bit. Row-local actor stage, no shuffle."""

    class StatsStage:
        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["media_id"].to_numpy()
            kinds = t["kind"].to_pylist()
            bufs = t["payload"].to_pylist()
            n_units = np.zeros(len(ids), dtype=np.int64)
            s = np.zeros((len(ids), 3), dtype=np.int64)
            for r, (kind, buf) in enumerate(zip(kinds, bufs)):
                if kind == "audio":
                    samples, _rate = decode_wav(buf)
                    x = samples.astype(np.int64)
                    n_units[r] = x.size
                    s[r, 0] = x.sum()
                    s[r, 1] = (x * x).sum()
                else:
                    # single image: decode_ppm (tolerates trailing bytes
                    # after the raster, e.g. a netpbm trailing newline);
                    # video: walk every concatenated frame
                    frames = ([decode_ppm(buf)] if kind == "image"
                              else iter_ppm_frames(buf))
                    for frame in frames:
                        flat = frame.reshape(-1, 3).astype(np.int64)
                        n_units[r] += flat.shape[0]
                        s[r] += flat.sum(axis=0)
            return pa.table({
                "media_id": pa.array(ids),
                "kind": pa.array(kinds, pa.string()),
                "n_units": pa.array(n_units),
                "s0": pa.array(s[:, 0]),
                "s1": pa.array(s[:, 1]),
                "s2": pa.array(s[:, 2]),
            })

    return media.map_batches(StatsStage, batch_format="pyarrow",
                             batch_size=64, concurrency=2)


class ResizeStage:
    """2x block-mean downsample for PPM image payloads (the thumbnail /
    preprocessing-resize stage): decode -> (h//2, w//2) integer block
    means (floor) -> re-encode PPM. Actor stage; kinds other than
    "image" pass through untouched so the stage composes mid-pipeline."""

    def __init__(self, factor: int = 2):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor

    def __call__(self, t: pa.Table) -> pa.Table:
        f = self.factor
        kinds = t["kind"].to_pylist()
        bufs = t["payload"].to_pylist()
        widths = t["width"].to_numpy().copy()
        heights = t["height"].to_numpy().copy()
        out = []
        for r, (kind, buf) in enumerate(zip(kinds, bufs)):
            if kind != "image" or f == 1:
                out.append(buf)
                continue
            rgb = decode_ppm(buf)
            h, w, _ = rgb.shape
            hh, ww = h // f, w // f
            block = rgb[: hh * f, : ww * f].reshape(hh, f, ww, f, 3)
            small = (block.astype(np.int64).sum(axis=(1, 3)) // (f * f)).astype(np.uint8)
            out.append(encode_ppm(small))
            widths[r], heights[r] = ww, hh
        cols = {name: t[name] for name in t.column_names}
        cols["payload"] = pa.array(out, pa.binary())
        cols["width"] = pa.array(widths.astype(np.int32), pa.int32())
        cols["height"] = pa.array(heights.astype(np.int32), pa.int32())
        return pa.table(cols)


def resize_images(media: rd.Dataset, factor: int = 2,
                  batch_size: int = 64, concurrency: int = 2) -> rd.Dataset:
    return media.map_batches(
        ResizeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs={"factor": factor},
    )


def audio_energy_windows(media: rd.Dataset, window: int = 256) -> rd.Dataset:
    """Windowed audio energy through the real WAV decoder: one row per
    (clip, window) with the exact-integer sample-square sum — the
    silence-detection / VAD precursor. Non-audio rows drop; a trailing
    partial window is kept (n_samples says how full). Row-local."""

    def energies(t: pa.Table) -> pa.Table:
        ids_out, widx, ns, eng = [], [], [], []
        for mid, kind, buf in zip(t["media_id"].to_numpy(),
                                  t["kind"].to_pylist(), t["payload"].to_pylist()):
            if kind != "audio":
                continue
            samples, _rate = decode_wav(buf)
            x = samples.astype(np.int64)
            nw = -(-x.size // window) if x.size else 0
            for wi in range(nw):
                seg = x[wi * window:(wi + 1) * window]
                ids_out.append(mid)
                widx.append(wi)
                ns.append(seg.size)
                eng.append(int((seg * seg).sum()))
        return pa.table({
            "media_id": pa.array(np.asarray(ids_out, np.int64)),
            "window_idx": pa.array(np.asarray(widx, np.int64)),
            "n_samples": pa.array(np.asarray(ns, np.int64)),
            "energy": pa.array(np.asarray(eng, np.int64)),
        })

    return media.map_batches(energies, batch_format="pyarrow",
                             batch_size=64)


def frame_diffs(media: rd.Dataset) -> rd.Dataset:
    """Adjacent-frame absolute-difference sums for video payloads — the
    scene-cut / motion-energy signal: for frames f-1, f the exact int64
    Σ |pixel_f − pixel_{f-1}| over all positions and channels. Every
    frame of the concatenated-PPM container is decoded (real codec
    path); non-video rows drop. Row-local, no shuffle."""

    def diffs(t: pa.Table) -> pa.Table:
        ids_out, fidx, dsum = [], [], []
        for mid, kind, buf in zip(t["media_id"].to_numpy(),
                                  t["kind"].to_pylist(), t["payload"].to_pylist()):
            if kind != "video":
                continue
            prev = None
            for f, frame in enumerate(iter_ppm_frames(buf)):
                cur = frame.astype(np.int64)
                if prev is not None:
                    ids_out.append(mid)
                    fidx.append(f)
                    dsum.append(int(np.abs(cur - prev).sum()))
                prev = cur
        return pa.table({
            "media_id": pa.array(np.asarray(ids_out, np.int64)),
            "frame_idx": pa.array(np.asarray(fidx, np.int64)),
            "diff_sum": pa.array(np.asarray(dsum, np.int64)),
        })

    return media.map_batches(diffs, batch_format="pyarrow", batch_size=64)
