"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
structs. The decode/feature kernels run as Arrow-batched
``mapInPandas`` (the correct Spark shape for CPU-heavy per-row work:
vectorized batch in, batch out, scan-parallel, no shuffle). The
actual codec calls dispatch through ``decode_features`` in THREE
tiers: (1) when Pillow/soundfile are importable the full codec runs;
(2) otherwise a stdlib-only decoder handles uncompressed formats —
binary PPM/PGM images and RIFF WAV audio — so a REAL decode executes
even in containers without codec libraries (this tier is what CI
exercises un-skipped); (3) undecodable payloads fall back to the
deterministic ``_decode_stub`` that keeps the pipeline total. All
tiers honor one 32-float shape/dtype contract.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, "
    "sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, content_sha long, "
    "feat array<float>"
)


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic fake 'decoded features'. Real deployments replace
    this with PIL.Image.open / soundfile.read / pyav frame sampling.

    Raises NotImplementedError for media types we don't model.
    """
    if media_type not in ("image", "audio"):
        raise NotImplementedError(f"decode for media_type={media_type}")
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def _pil():
    """Guarded PIL import, resolved lazily on each worker (the
    container this repo is developed in has no codec libraries; a real
    deployment that pip-installs Pillow gets the real decoder with no
    code change)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _soundfile():
    try:
        import soundfile
        return soundfile
    except ImportError:
        return None


def _decode_ppm(payload: bytes):
    """Stdlib-only decoder for binary PPM (P6) / PGM (P5): returns a
    2-D grayscale float32 array in [0, 1], or None if the payload is
    not a well-formed binary netpbm image. This is the middle decode
    tier — a REAL pixel decode with zero dependencies, so CI in
    codec-free containers still executes a genuine decode path."""
    try:
        if not payload or payload[:2] not in (b"P5", b"P6"):
            return None
        pos = 2
        fields = []
        while len(fields) < 3:
            # skip whitespace and '#' comment lines between tokens
            while pos < len(payload) and payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":
                nl = payload.index(b"\n", pos)
                pos = nl + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace byte after maxval
        w, h, maxval = fields
        if w <= 0 or h <= 0 or not (0 < maxval < 65536):
            return None
        ch = 3 if payload[:2] == b"P6" else 1
        bpv = 2 if maxval > 255 else 1
        need = w * h * ch * bpv
        raw = payload[pos:pos + need]
        if len(raw) != need:
            return None
        dt = ">u2" if bpv == 2 else np.uint8
        arr = np.frombuffer(raw, dtype=dt).astype(np.float32) / maxval
        arr = arr.reshape(h, w, ch)
        return arr.mean(axis=2) if ch == 3 else arr[:, :, 0]
    except Exception:
        return None


def _decode_wav(payload: bytes):
    """Stdlib ``wave`` decoder for RIFF WAV: returns the mono-folded
    float32 waveform in [-1, 1], or None for non-WAV payloads or
    sample widths the stdlib can't express."""
    try:
        import wave
        from io import BytesIO

        with wave.open(BytesIO(payload)) as wf:
            sw = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
        if sw == 2:
            arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
        elif sw == 1:
            arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
                   - 128.0) / 128.0
        elif sw == 4:
            arr = np.frombuffer(frames, dtype="<i4").astype(
                np.float32) / 2147483648.0
        else:
            return None
        return arr
    except Exception:
        return None


def _nn_resize(gray: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor 2-D resample (the stdlib tier's resize kernel:
    index arithmetic only, no codec)."""
    h, w = gray.shape
    ri = np.arange(target_h) * h // target_h
    ci = np.arange(target_w) * w // target_w
    return gray[ri][:, ci]


def _audio_hist(wave: np.ndarray) -> np.ndarray:
    """Shared audio feature: 32-bin amplitude histogram over [-1, 1],
    normalized — identical whether the waveform came from soundfile
    or the stdlib wave tier."""
    wave = np.asarray(wave, dtype=np.float32).ravel()
    hist, _ = np.histogram(wave, bins=32, range=(-1.0, 1.0))
    total = max(float(hist.sum()), 1.0)
    return (hist / total).astype(np.float32)


def decode_features(payload: bytes, media_type: str,
                    Image=None, sf=None) -> np.ndarray:
    """Three-tier decode. Image: grayscale 8x4 thumbnail -> 32-dim
    [0,1] feature (tier 1: PIL any format; tier 2: stdlib binary
    PPM/PGM parse + nearest-neighbor resample). Audio: waveform ->
    32-bin amplitude histogram (tier 1: soundfile; tier 2: stdlib
    ``wave`` for RIFF WAV). Tier 3 for undecodable payloads is
    ``_decode_stub``. ALL tiers emit 32 floats — one shape/dtype
    contract regardless of which decoder ran, so a batch mixing real
    decodes and fallbacks stays rectangular for downstream fixed-dim
    consumers.

    ``Image``/``sf`` let batch callers resolve the libraries ONCE per
    batch instead of re-attempting the import per row (a failed import
    is not cached by Python, so a per-row miss re-runs the full
    sys.path search)."""
    if media_type == "image":
        if Image is None:
            Image = _pil()
        if Image is not None:
            try:
                from io import BytesIO

                img = Image.open(BytesIO(payload)).convert("L")
                img = img.resize((8, 4))
                return (np.asarray(img, dtype=np.float32) / 255.0).ravel()
            except Exception:
                pass
        gray = _decode_ppm(payload)
        if gray is not None:
            return _nn_resize(gray, 8, 4).astype(np.float32).ravel()
    elif media_type == "audio":
        if sf is None:
            sf = _soundfile()
        if sf is not None:
            try:
                from io import BytesIO

                wave, _sr = sf.read(BytesIO(payload), dtype="float32")
                return _audio_hist(wave)
            except Exception:
                pass
        wave = _decode_wav(payload)
        if wave is not None:
            return _audio_hist(wave)
    return _decode_stub(payload, media_type)


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each pandas batch holds ``batch_hint``-ish rows; the
    loop is per-batch vectorizable. Partitioning of the input df is
    preserved (map-only — no shuffle)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image, sf = _pil(), _soundfile()  # resolve once per task
        for pdf in batches:
            feats = [
                decode_features(m, t, Image=Image, sf=sf).tolist()
                for m, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(m or b"") for m in pdf["media"]],
                    "content_sha": [
                        int.from_bytes(
                            hashlib.sha256(m or b"").digest()[:4], "big"
                        )
                        for m in pdf["media"]
                    ],
                    "feat": feats,
                }
            )

    # guide §4: an opaque function over the full row silently ships
    # (and reads from storage) every column — select exactly what the
    # extractor touches before crossing the Arrow boundary
    return df.select("doc_id", "media_type", "media").mapInPandas(
        _extract, schema=FEATURE_SCHEMA)


def synthetic_media_df(spark, docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Derive a deterministic binary media column from the documents
    table (test harness for the plumbing; payload = utf8 bytes)."""
    return docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(16000).alias("sample_rate"),
    )


RESIZED_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, "
    "sample_rate int"
)

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame binary, media_type string, "
    "width int, height int"
)


def _resize_stub(payload: bytes, w: int, h: int,
                 target_w: int, target_h: int) -> bytes:
    """Deterministic fake resize: real deployments decode with PIL,
    resize, re-encode. The fake keeps a deterministic function of
    (payload, target) so the plumbing is testable: payload bytes are
    tiled/truncated to the target 'pixel count'."""
    n = max(target_w * target_h, 1)
    src = payload or b"\x00"
    reps = n // len(src) + 1
    return (src * reps)[:n]


def resize_images(df: DataFrame, target_w: int = 32, target_h: int = 32,
                  batch_hint: int = 1024) -> DataFrame:
    """mapInPandas image resize over binary media columns — map-only,
    Arrow-batched, schema-preserving (width/height updated). Swap
    ``_resize_stub`` for PIL in a real deployment; everything else
    (batching, schema, partitioning) is the production shape."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()

        def one(m, w, h):
            if Image is not None:
                # real decoder when Pillow exists: grayscale so the
                # 1-byte-per-pixel size contract matches the stub's
                try:
                    from io import BytesIO

                    img = Image.open(BytesIO(m)).convert("L")
                    return img.resize((target_w, target_h)).tobytes()
                except Exception:
                    pass
            # stdlib tier: real pixel resample for binary PPM/PGM,
            # same 1-byte-per-pixel grayscale output contract
            gray = _decode_ppm(m)
            if gray is not None:
                return (
                    _nn_resize(gray, target_w, target_h) * 255.0
                ).astype(np.uint8).tobytes()
            return _resize_stub(m, w, h, target_w, target_h)

        for pdf in batches:
            out = pdf.copy()
            resized = []
            for m, t, w, h in zip(pdf["media"], pdf["media_type"],
                                  pdf["width"], pdf["height"]):
                if t != "image":
                    raise NotImplementedError(
                        f"resize for media_type={t}")
                resized.append(one(m, w, h))
            out["media"] = resized
            out["width"] = target_w
            out["height"] = target_h
            yield out[["doc_id", "media", "media_type", "width", "height",
                       "sample_rate"]]

    return df.select(
        "doc_id", "media", "media_type", "width", "height",
        "sample_rate").mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  batch_hint: int = 1024) -> DataFrame:
    """mapInPandas frame sampling: one input row fans out to
    ``n_frames`` frame rows (the output batch is LARGER than the
    input batch — mapInPandas handles 1:N naturally, unlike a scalar
    pandas_udf). The decode is a deterministic stub (equal byte-range
    slices stand in for pyav keyframe extraction); the row fan-out,
    schema, and partition-preserving shape are real."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": [],
                    "media_type": [], "width": [], "height": []}
            for did, m, t, w, h in zip(pdf["doc_id"], pdf["media"],
                                       pdf["media_type"], pdf["width"],
                                       pdf["height"]):
                src = m or b"\x00"
                step = max(len(src) // n_frames, 1)
                for i in range(n_frames):
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(src[i * step:(i + 1) * step])
                    rows["media_type"].append(t)
                    rows["width"].append(w)
                    rows["height"].append(h)
            yield pd.DataFrame(rows)

    return df.select(
        "doc_id", "media", "media_type", "width", "height").mapInPandas(
        _frames, schema=FRAME_SCHEMA)
