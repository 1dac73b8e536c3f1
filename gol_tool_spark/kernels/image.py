"""Image payload kernels: deterministic codec, PSNR, 64-bit perceptual hash.

The BASELINE input table carries (bytes:binary, w, h, fmt, caption, phash);
per-row invariants after any pipeline are decoded-pixel PSNR>=40dB (lossy)
and caption byte-equality.  The sandbox has no image libraries, so the
codecs are deterministic stand-ins with the real Spark-side plumbing:

    fmt="raw"  : bytes = H*W*3 uint8 RGB, row-major          (lossless)
    fmt="png"  : zlib-compressed raw stream (stdlib only)    (lossless)
    fmt="jpg"  : quantize-to-16-levels then zlib             (lossy, PSNR~34-44dB)

A real deployment swaps `decode`/`encode` for libvips/Pillow inside the same
mapInPandas batches — the schema, batching and invariants don't change.
"""

from __future__ import annotations

import zlib

import numpy as np

_QUANT = 16  # jpg stand-in quantization step


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 -> payload bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "png":
        return zlib.compress(pixels.tobytes(), 6)
    if fmt == "jpg":
        q = (pixels.astype(np.int32) // _QUANT * _QUANT + _QUANT // 2).astype(np.uint8)
        return zlib.compress(q.tobytes(), 6)
    raise NotImplementedError(f"fmt={fmt!r}: real codecs need an image lib")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload bytes -> (h, w, 3) uint8."""
    if fmt == "raw":
        buf = np.frombuffer(data, np.uint8)
    elif fmt in ("png", "jpg"):
        buf = np.frombuffer(zlib.decompress(data), np.uint8)
    else:
        raise NotImplementedError(f"fmt={fmt!r}: real codecs need an image lib")
    return buf.reshape(h, w, 3)


def generate_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-image pixels: seeded smooth-ish noise."""
    rng = np.random.default_rng((int(seed) * 0x9E3779B97F4A7C15 + 1) % (1 << 63))
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # cheap smoothing so phash has structure (pure noise hashes to ~random)
    sm = base.astype(np.int32)
    sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1) + np.roll(sm, -1, 0)) // 4
    return sm.astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale -> 8x8 block means -> sign bits.
    (Perceptual-hash stand-in; stable under the lossy stand-in codec.)"""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # block-mean resize to 8x8 (pad to multiples of 8 by edge clamp)
    ry = np.linspace(0, h, 9).astype(int)
    rx = np.linspace(0, w, 9).astype(int)
    cells = np.empty((8, 8), np.float64)
    for i in range(8):
        for j in range(8):
            cells[i, j] = g[ry[i]:max(ry[i + 1], ry[i] + 1), rx[j]:max(rx[j + 1], rx[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    out = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.int64(out))  # signed int64 for parquet/Spark LongType


def hamming64(a: int, b: int) -> int:
    return int(bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1"))
