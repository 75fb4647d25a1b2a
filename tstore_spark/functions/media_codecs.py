"""Real media codecs with zero third-party dependencies.

Round 2 left the media decode step stubbed ("the pixels are not real").
This module closes that for the two formats the Python stdlib can genuinely
decode end-to-end:

- **PNG** (via ``zlib`` + the public PNG spec): chunk parse, IDAT inflate,
  scanline unfilter (all five filter types, numpy-vectorized where the
  recurrence allows) -> ``uint8 (h, w, channels)`` pixels. Encoder writes
  spec-compliant PNGs (filter 0 + zlib + CRC32 chunks) any external viewer
  opens.
- **WAV** (via ``wave`` + numpy): PCM samples + rate, both directions.

Plus real numpy transforms over the decoded data: nearest-neighbor resize,
image/audio feature vectors (moments, band energies via rfft). PIL/ffmpeg,
when installed, slot in through :func:`tstore_spark.operators.multimodal`'s
``decoder=`` hooks with the same signatures; :func:`best_image_decoder`
import-guards that choice.

Everything here is deterministic (pure functions of the input bytes), so the
Spark pipelines built on top stay bit-reproducible across parallelism.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------- PNG decode
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """Decode an 8-bit-depth PNG (gray / gray+alpha / RGB / RGBA, not
    interlaced) to ``uint8 (h, w, channels)``. Raises ValueError on anything
    that is not such a PNG — callers route other formats to other decoders."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(blob):
        (length,), ctype = struct.unpack(">I", blob[pos:pos + 4]), blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace:
        raise ValueError(f"unsupported PNG (depth={depth} color={color} interlace={interlace})")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, line = int(filters[y]), lines[y]
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: out[i] = line[i] + out[i-ch] — per-channel cumsum
            cur = line.reshape(w, ch).cumsum(axis=0).reshape(stride) & 0xFF
        elif f == 3:  # Average: left-recurrence, sequential per pixel
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth: left-recurrence, sequential per pixel
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                cur[i] = (line[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y], prev = cur, cur
    return out.astype(np.uint8).reshape(h, w, ch)


# ---------------------------------------------------------------- PNG encode
def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode ``uint8 (h, w)`` or ``(h, w, {1,2,3,4})`` as a spec-compliant
    PNG (filter 0, one IDAT). Deterministic: fixed zlib level 6."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- WAV
def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to (``int16 (n, channels)`` samples, sample_rate)."""
    with wave.open(io.BytesIO(blob), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got width {wf.getsampwidth()}")
        n, ch, rate = wf.getnframes(), wf.getnchannels(), wf.getframerate()
        samples = np.frombuffer(wf.readframes(n), dtype="<i2").reshape(n, ch)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode ``int16 (n,)`` or ``(n, channels)`` PCM samples as WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------- transforms
def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of ``(h, w, ch)`` to ``(height, width, ch)``
    — pure integer index math, the standard pixel-center mapping."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys[:, None], xs[None, :]]


def image_features(arr: np.ndarray, feature_dim: int = 8) -> np.ndarray:
    """Real per-image features from decoded pixels: dims + intensity moments
    + extremes + edge energy, padded/truncated to ``feature_dim``."""
    px = arr.astype(np.float64)
    flat = px.reshape(-1)
    gx = np.abs(np.diff(px.mean(axis=2), axis=1)).mean() if px.shape[1] > 1 else 0.0
    feats = np.array(
        [
            float(arr.shape[0]),
            float(arr.shape[1]),
            float(arr.shape[2]),
            float(flat.mean()),
            float(flat.std()),
            float(flat.min()),
            float(flat.max()),
            float(gx),
        ]
    )
    return _fit(feats, feature_dim)


def audio_features(samples: np.ndarray, rate: int, feature_dim: int = 8) -> np.ndarray:
    """Real per-clip features from decoded PCM: duration, RMS, zero-crossing
    rate, and low/mid/high band energies from an rfft."""
    mono = samples.astype(np.float64).mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono)) if n else np.zeros(1)
    thirds = max(1, len(spec) // 3)
    bands = [float(spec[i * thirds:(i + 1) * thirds].sum()) for i in range(3)]
    feats = np.array([float(n), float(rate), n / rate if rate else 0.0, rms, zcr, *bands])
    return _fit(feats, feature_dim)


def _fit(feats: np.ndarray, feature_dim: int) -> np.ndarray:
    if len(feats) >= feature_dim:
        return feats[:feature_dim]
    return np.concatenate([feats, np.zeros(feature_dim - len(feats))])


# -------------------------------------------------- decoder selection (hook)
def png_feature_decoder(feature_dim: int = 8):
    """``bytes -> np.ndarray(feature_dim,)`` over REAL decoded PNG pixels —
    plugs straight into ``multimodal.decode_and_featurize(decoder=...)``."""
    return lambda blob: image_features(decode_png(blob), feature_dim)


def wav_feature_decoder(feature_dim: int = 8):
    """``bytes -> np.ndarray(feature_dim,)`` over REAL decoded PCM samples."""
    return lambda blob: audio_features(*decode_wav(blob), feature_dim=feature_dim)


def png_resizer(blob: bytes, width: int, height: int) -> bytes:
    """``(bytes, w, h) -> bytes`` real PNG resize: decode -> nearest-neighbor
    resample -> re-encode. Plugs into ``multimodal.resize_images(resizer=...)``."""
    return encode_png(resize_nearest(decode_png(blob), width, height))


def best_image_decoder(feature_dim: int = 8):
    """Import-guarded decoder choice: PIL when installed (any format it
    reads), else the stdlib PNG path. Returns (decoder, impl_name)."""
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image

        def pil_decode(blob: bytes) -> np.ndarray:
            arr = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
            return image_features(arr, feature_dim)

        return pil_decode, "pillow"
    except ImportError:
        return png_feature_decoder(feature_dim), "stdlib-png"
