"""Vendored pure-Python media codecs: WAV (stdlib ``wave``) and binary
PPM (P6) — enough to run the multimodal decode path for real in codec-free
containers (this one ships no PIL/librosa/pyav).

These are honest decoders for two honest formats, not stand-ins: a WAV
payload yields the PCM samples, a P6 payload yields the (h, w, 3) pixel
array.  ``multimodal.try_decode`` uses them as the fallback tier after
the full-fat libraries, so the ``decoded:<lib>`` branch executes — and is
tested end-to-end — everywhere.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV → mono float64 samples in [-1, 1] (8/16/32-bit widths;
    multi-channel averaged).  Raises ``wave.Error``/``ValueError`` on
    non-WAV bytes."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n, ch, width = w.getnframes(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(n)
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    return x.reshape(-1, ch).mean(axis=1) if ch > 1 else x


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono float samples in [-1, 1] → 16-bit PCM WAV bytes (test-fixture
    encoder for :func:`decode_wav`)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8 array.  Raises
    ``ValueError`` on anything that is not a P6 stream."""
    f = io.BytesIO(payload)
    if f.read(2) != b"P6":
        raise ValueError("not a P6 PPM stream")

    def _token() -> bytes:
        tok = b""
        while True:
            c = f.read(1)
            if not c:
                raise ValueError("truncated PPM header")
            if c in b" \t\r\n":
                if tok:
                    return tok
                continue
            if c == b"#":  # comment to end of line
                while f.read(1) not in (b"\n", b""):
                    pass
                continue
            tok += c

    w, h, maxval = int(_token()), int(_token()), int(_token())
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM maxval: {maxval}")
    data = f.read(w * h * 3)
    if len(data) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → P6 bytes (test-fixture encoder)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM is 3-channel")
    return b"P6\n" + f"{w} {h}\n255\n".encode() + a.tobytes()


