"""Image payload kernels: real PNG codec, PSNR, 64-bit perceptual hash.

The BASELINE input table carries (bytes:binary, w, h, fmt, caption, phash);
per-row invariants after any pipeline are decoded-pixel PSNR>=40dB (lossy)
and caption byte-equality.  Formats:

    fmt="raw"  : bytes = H*W*3 uint8 RGB, row-major               (lossless)
    fmt="png"  : REAL PNG — signature/IHDR/IDAT/IEND chunks, CRCs,
                 8-bit RGB, scanline filters (pure numpy + stdlib
                 zlib; interoperable with any PNG reader)          (lossless)
    fmt="jpg"  : REAL frequency-domain lossy codec — 8x8 blockwise
                 orthonormal DCT-II, JPEG-style quantization table
                 (high frequencies quantized coarser than low), zlib
                 entropy stage; PSNR ~40-46dB on the fixture images.
                 Legacy quantize+zlib payloads (pre-round-5 stores)
                 still decode (magic-sniffed).                     (lossy)

    fmt="jpeg" : REAL ITU T.81 baseline JPEG bitstream (kernels/
                 jpegfile.py — JFIF markers, Annex K quant + Huffman
                 tables, byte stuffing; interoperable with any JPEG
                 reader).  PIL, when installed, is used as an
                 accelerator for the same fmt — the bitstreams are
                 interchangeable.  Encode default quality=97 keeps the
                 noise-like fixture images over the >=40dB bar.  (lossy)

Real JPEG payloads arriving under fmt="jpg" (real-world ingest) are
magic-sniffed (SOI) and decode through the same bitstream decoder.
Only WebP and the PIL-PNG variant remain behind the plug-in seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import jpegfile as _jf

JPEG_QUALITY = 97  # default for fmt="jpeg" encodes (>=40dB on fixtures)

_QUANT = 16  # legacy jpg stand-in quantization step (decode-only now)

# ------------------------- DCT lossy codec (fmt="jpg") -----------------------
# 8x8 blockwise type-II DCT with an orthonormal basis (energy-preserving,
# exactly invertible in float64), JPEG-style quantization — the standard
# luminance table (ITU T.81 Annex K.1) scaled down so the fixture images
# land in the PSNR 40-46dB band — then a zlib entropy stage.  All pixel
# math is vectorized numpy over (N*ch*blocks, 8, 8) stacks.

_DCT_MAGIC = b"DCT1"   # v1: natural coefficient order (decode-only now)
_DCT_MAGIC2 = b"DCT2"  # v2: zigzag order + DC delta coding (current)

# JPEG zigzag scan order for an 8x8 block (flat indices): low frequencies
# first, so quantized high-frequency zeros run together and the zlib
# stage actually compresses — plus DC delta coding along the block
# sequence (JPEG's DC prediction), both exactly invertible
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)


def _is_dct(data: bytes) -> bool:
    return data[:4] in (_DCT_MAGIC, _DCT_MAGIC2)

# orthonormal 8-point DCT-II matrix: M[k, n] = c(k) cos((2n+1) k pi / 16)
_DCT_M = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16.0)
_DCT_M[0] *= np.sqrt(0.5)
_DCT_M *= 0.5  # rows now orthonormal: M @ M.T == I

# ITU T.81 Annex K.1 luminance table, scaled 0.1 (floor 1): real JPEG's
# frequency weighting at a light quality setting — PSNR ~42dB on the
# fixture images (comfortably over the north rule's >=40dB lossy bar).
# NOTE the fixtures are smoothed noise, the WORST case for transform
# coding, so compressed size ~= raw there; natural images compress.
_JPEG_K1 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float64,
)
_DCT_Q = np.maximum(np.round(_JPEG_K1 * 0.1), 1.0)


def _dct_pad(pixels: np.ndarray) -> np.ndarray:
    """Edge-replicate a (..., h, w, 3) stack to 8-multiple h/w."""
    h, w = pixels.shape[-3], pixels.shape[-2]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        pad = [(0, 0)] * (pixels.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        pixels = np.pad(pixels, pad, mode="edge")
    return pixels


def _dct_blockize(stack: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) [H, W multiples of 8] -> (N, 3, H/8, W/8, 8, 8)."""
    n, hh, ww, _ = stack.shape
    return (
        stack.transpose(0, 3, 1, 2)
        .reshape(n, 3, hh // 8, 8, ww // 8, 8)
        .swapaxes(3, 4)
    )


def _dct_unblockize(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    """(N, 3, H/8, W/8, 8, 8) -> (N, h, w, 3), cropping the pad."""
    n = blocks.shape[0]
    hh, ww = blocks.shape[2] * 8, blocks.shape[3] * 8
    stack = blocks.swapaxes(3, 4).reshape(n, 3, hh, ww).transpose(0, 2, 3, 1)
    return stack[:, :h, :w, :]


def _dct_quantize_stack(pixels: np.ndarray) -> np.ndarray:
    """(N, h, w, 3) uint8 -> quantized DCT coefficients
    (N, 3, H/8, W/8, 8, 8) int16.  The ONLY lossy step is the round()."""
    blocks = _dct_blockize(_dct_pad(pixels).astype(np.float64) - 128.0)
    # 2D DCT = M @ B @ M.T, batched over every leading axis; matmul
    # broadcasts (8,8) @ (..., 8, 8) with no einsum path-search overhead
    coef = _DCT_M @ blocks @ _DCT_M.T
    return np.round(coef / _DCT_Q).astype(np.int16)


def _dct_reconstruct_stack(q: np.ndarray, h: int, w: int) -> np.ndarray:
    """Quantized coefficients (N, 3, H/8, W/8, 8, 8) int16 -> (N, h, w, 3)
    uint8 — dequantize, inverse DCT, recenter, crop the pad."""
    coef = q.astype(np.float64) * _DCT_Q
    blocks = _DCT_M.T @ coef @ _DCT_M
    out = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
    return _dct_unblockize(out, h, w)


def dct_model_batch(pixels: np.ndarray) -> np.ndarray:
    """Vectorized decode(encode(px, 'jpg')) for a (N, h, w, 3) stack —
    the quant/dequant round trip without the (bijective) zlib stage."""
    h, w = pixels.shape[1], pixels.shape[2]
    return _dct_reconstruct_stack(_dct_quantize_stack(pixels), h, w)


def _dct_entropy_pack(q: np.ndarray) -> np.ndarray:
    """(3, nby, nbx, 8, 8) int16 -> zigzag-ordered, DC-delta-coded flat
    (3, nblocks, 64) int16.  Exactly invertible (int16 wraparound is
    two's-complement on both sides)."""
    flat = q.reshape(3, -1, 64)[:, :, _ZIGZAG].copy()
    flat[:, 1:, 0] -= flat[:, :-1, 0].copy()  # DC prediction along blocks
    return flat


def _dct_entropy_unpack(flat: np.ndarray, nby: int, nbx: int) -> np.ndarray:
    flat = flat.copy()
    flat[:, :, 0] = np.cumsum(flat[:, :, 0].astype(np.int64), axis=1).astype(
        np.int16
    )
    return flat[:, :, _UNZIGZAG].reshape(3, nby, nbx, 8, 8)


def _dct_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> DCT2 payload: magic + h + w +
    zlib(zigzag/DC-delta int16 LE)."""
    h, w = pixels.shape[:2]
    q = _dct_quantize_stack(pixels[None])[0]
    body = zlib.compress(_dct_entropy_pack(q).astype("<i2").tobytes(), 6)
    return _DCT_MAGIC2 + struct.pack(">II", h, w) + body


def _dct_coeffs(data: bytes) -> tuple[np.ndarray, int, int]:
    h, w = struct.unpack(">II", data[4:12])
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    raw = np.frombuffer(zlib.decompress(data[12:]), "<i2")
    if data[:4] == _DCT_MAGIC2:
        q = _dct_entropy_unpack(raw.reshape(3, -1, 64).copy(), nby, nbx)
    else:  # DCT1: natural order, no DC prediction
        q = raw.reshape(3, nby, nbx, 8, 8)
    return q, h, w


def _dct_decode(data: bytes) -> np.ndarray:
    q, h, w = _dct_coeffs(data)
    return _dct_reconstruct_stack(q[None], h, w)[0]


def _dct_decode_many(payloads: list[bytes]) -> np.ndarray:
    """Equal-shape DCT payloads (v1/v2 mixed ok) -> (N, h, w, 3): per-payload inflate
    (independent byte streams), then ONE batched-matmul IDCT over the stack."""
    parsed = [_dct_coeffs(p) for p in payloads]
    h, w = parsed[0][1], parsed[0][2]
    return _dct_reconstruct_stack(np.stack([q for q, _, _ in parsed]), h, w)

# Plug-in seam: when an image library is present it accelerates fmt
# 'jpeg' and provides 'png-real'/'webp' inside the SAME batch API — the
# Spark-side plumbing (schema, batching, invariants) doesn't change.
# fmt='jpeg' is ALWAYS available: without PIL it runs the pure-numpy
# T.81 bitstream codec (kernels/jpegfile.py); only 'png-real'/'webp'
# still raise the clearly-marked NotImplementedError without a library.
try:  # pragma: no cover - not installed in this sandbox
    from PIL import Image as _PIL_Image  # type: ignore

    HAVE_REAL_CODEC = True
except ImportError:
    _PIL_Image = None
    HAVE_REAL_CODEC = False

_REAL_FMTS = ("jpeg", "png-real", "webp")
_PIL_ONLY_FMTS = ("png-real", "webp")


def _real_encode(pixels: np.ndarray, fmt: str) -> bytes:  # pragma: no cover
    import io

    buf = io.BytesIO()
    _PIL_Image.fromarray(pixels).save(
        buf, format={"jpeg": "JPEG", "png-real": "PNG", "webp": "WEBP"}[fmt]
    )
    return buf.getvalue()


def _real_decode(data: bytes) -> np.ndarray:  # pragma: no cover
    import io

    return np.asarray(_PIL_Image.open(io.BytesIO(data)).convert("RGB"))


# ------------------------------ real PNG codec ------------------------------
# Pure numpy + stdlib zlib, interoperable with any PNG reader/writer.
# Encoder: 8-bit RGB (color type 2), filter 0 scanlines, single IDAT.
# Decoder: 8-bit RGB/RGBA, all five scanline filters, multi-IDAT, CRC-checked.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + _png_chunk(b"IEND", b"")
    )


def _png_parse(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """PNG bytes -> (filtered scanlines (h, 1+w*ch) uint8, h, w, ch)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, []
    n = len(data)
    while pos + 12 <= n:
        ln = int.from_bytes(data[pos : pos + 4], "big")
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG stream missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth} color={color} interlace={interlace}): "
            "only 8-bit RGB/RGBA, non-interlaced"
        )
    ch = 3 if color == 2 else 4
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (1 + w * ch):
        raise ValueError("PNG IDAT length does not match dimensions")
    return raw.reshape(h, 1 + w * ch), h, w, ch


def _png_unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (h, w, ch) uint8.  The all-None
    case (what _png_encode emits) is a single vectorized strip; filtered
    rows reconstruct per-row (Sub via per-lane cumsum; Average/Paeth have
    an inherent left-to-right dependency)."""
    ftypes = raw[:, 0]
    flt = raw[:, 1:]
    if not ftypes.any():
        return flt.reshape(h, w, ch).copy()
    out = np.empty((h, w * ch), np.uint8)
    prior = np.zeros(w * ch, np.int32)
    for i in range(h):
        f = int(ftypes[i])
        row = flt[i].astype(np.int32)
        if f == 0:
            rec = row
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            rec = (row.reshape(w, ch).cumsum(axis=0) % 256).reshape(-1)
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f == 3:  # Average
            rec = np.empty(w * ch, np.int32)
            for x in range(w * ch):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (row[x] + (left + prior[x]) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.empty(w * ch, np.int32)
            for x in range(w * ch):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[i] = rec
        prior = rec
    return out.reshape(h, w, ch)


def _png_decode(data: bytes) -> np.ndarray:
    raw, h, w, ch = _png_parse(data)
    px = _png_unfilter(raw, h, w, ch)
    return px[:, :, :3] if ch == 4 else px


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 -> payload bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "png":
        return _png_encode(pixels)
    if fmt == "jpg":
        return _dct_encode(pixels)
    if fmt == "jpeg":
        if HAVE_REAL_CODEC:
            return _real_encode(pixels, fmt)
        return _jf.jpeg_encode(pixels, quality=JPEG_QUALITY)
    if fmt in _PIL_ONLY_FMTS:
        if HAVE_REAL_CODEC:
            return _real_encode(pixels, fmt)
        raise NotImplementedError(
            f"fmt={fmt!r} needs a real image library (PIL/libvips) — not in this sandbox"
        )
    raise NotImplementedError(f"fmt={fmt!r}: unknown format")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload bytes -> (h, w, 3) uint8."""
    if fmt == "raw":
        buf = np.frombuffer(data, np.uint8)
    elif fmt == "png":
        if data[:8] == _PNG_SIG:
            return _png_decode(data)
        # legacy stand-in stream (stores written before the real codec):
        # bare zlib of the raw pixel block
        buf = np.frombuffer(zlib.decompress(data), np.uint8)
    elif fmt == "jpg":
        if _is_dct(data):
            return _dct_decode(data)
        if data[:2] == b"\xff\xd8":
            # real-world ingest: an actual JPEG bitstream stored as 'jpg'
            return _jf.jpeg_decode(data)
        # legacy stand-in stream (stores written before the DCT codec):
        # bare zlib of the 16-level-quantized pixel block
        buf = np.frombuffer(zlib.decompress(data), np.uint8)
    elif fmt == "jpeg":
        if HAVE_REAL_CODEC:
            return _real_decode(data)
        return _jf.jpeg_decode(data)
    elif fmt in _PIL_ONLY_FMTS:
        if HAVE_REAL_CODEC:
            return _real_decode(data)
        raise NotImplementedError(
            f"fmt={fmt!r} needs a real image library (PIL/libvips) — not in this sandbox"
        )
    else:
        raise NotImplementedError(f"fmt={fmt!r}: unknown format")
    return buf.reshape(h, w, 3)


def generate_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-image pixels: seeded smooth-ish noise."""
    rng = np.random.default_rng((int(seed) * 0x9E3779B97F4A7C15 + 1) % (1 << 63))
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # cheap smoothing so phash has structure (pure noise hashes to ~random)
    sm = base.astype(np.int32)
    sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1) + np.roll(sm, -1, 0)) // 4
    return sm.astype(np.uint8)


def quantize(pixels: np.ndarray) -> np.ndarray:
    """The LEGACY jpg stand-in's lossy transform — kept for decoding
    pre-round-5 payloads and their tests; the live fmt='jpg' path is the
    DCT codec (dct_model_batch is its vectorized round-trip model)."""
    return (pixels.astype(np.int32) // _QUANT * _QUANT + _QUANT // 2).astype(np.uint8)


# ------------------------- batch (stacked) kernels -------------------------
# Equal-shaped images stack into one (N, h, w, 3) array and every pixel op
# runs as a single numpy expression across the batch (VERDICT r1 item 7) —
# zlib stays per-row (byte streams differ per image), everything else is
# one vectorized pass.  The scalar functions delegate to batch-of-1, so
# fixtures and operators can never drift apart.


def decode_batch(payloads: list[bytes], w: int, h: int, fmt: str) -> np.ndarray:
    """Equal-shape payloads -> one (N, h, w, 3) uint8 stack (single copy)."""
    if fmt == "raw":
        buf = np.frombuffer(b"".join(payloads), np.uint8)
    elif fmt == "png":
        if not payloads:
            return np.empty((0, h, w, 3), np.uint8)
        if all(p[:8] != _PNG_SIG for p in payloads):
            # legacy stand-in streams: bare zlib of the raw pixel block
            buf = np.frombuffer(
                b"".join(zlib.decompress(p) for p in payloads), np.uint8
            )
            return buf.reshape(len(payloads), h, w, 3)
        if any(p[:8] != _PNG_SIG for p in payloads):
            # mixed vintages (store partially re-encoded by the real
            # codec): decode per payload by its own signature
            return np.stack([decode(p, w, h, fmt) for p in payloads])
        # real PNGs: per-payload inflate (independent streams), then ONE
        # vectorized filter-byte strip when no scanline is filtered (the
        # common case — our encoder always writes filter None)
        raws = [_png_parse(p) for p in payloads]
        if all(c == 3 and hh == h and ww == w for _, hh, ww, c in raws) and not any(
            r[:, 0].any() for r, *_ in raws
        ):
            stack = np.stack([r for r, *_ in raws])  # (N, h, 1+w*3)
            return stack[:, :, 1:].reshape(len(payloads), h, w, 3).copy()
        return np.stack([_png_unfilter(r, hh, ww, c)[:, :, :3] for r, hh, ww, c in raws])
    elif fmt == "jpg":
        if not payloads:
            return np.empty((0, h, w, 3), np.uint8)
        if all(_is_dct(p) for p in payloads):
            return _dct_decode_many(payloads)
        if any(_is_dct(p) or p[:2] == b"\xff\xd8" for p in payloads):
            # mixed vintages / real JPEG bitstream ingest: decode per
            # payload by its own signature
            return np.stack([decode(p, w, h, fmt) for p in payloads])
        # legacy stand-in streams: bare zlib of the quantized pixel block
        buf = np.frombuffer(b"".join(zlib.decompress(p) for p in payloads), np.uint8)
    elif fmt in _REAL_FMTS:
        # real codecs decode per payload (independent byte streams), the
        # pixel stack downstream is still one array
        return np.stack([decode(p, w, h, fmt) for p in payloads])
    else:
        raise NotImplementedError(f"fmt={fmt!r}: unknown format")
    return buf.reshape(len(payloads), h, w, 3)


def roundtrip_batch(pixels: np.ndarray, fmt: str) -> np.ndarray:
    """decode(encode(px, fmt)) for a whole (N, h, w, 3) stack.  zlib is
    bijective, so the round trip equals identity for lossless formats and
    the quantize transform for the jpg stand-in — computed vectorized; one
    sampled row per call still runs the real byte-level encode/decode pair
    to catch codec regressions."""
    if len(pixels) and fmt in ("raw", "png", "jpg"):
        s = pixels[0]
        real = decode(encode(s, fmt), s.shape[1], s.shape[0], fmt)
        expect = s if fmt in ("raw", "png") else dct_model_batch(s[None])[0]
        if not np.array_equal(real, expect):  # pragma: no cover - codec bug
            raise AssertionError("codec round-trip diverged from vectorized model")
    if fmt in ("raw", "png"):
        return pixels
    if fmt == "jpg":
        return dct_model_batch(pixels)
    if fmt in _REAL_FMTS:
        # no vectorized model for a real lossy codec: round-trip per image
        return np.stack(
            [decode(encode(px, fmt), px.shape[1], px.shape[0], fmt) for px in pixels]
        )
    raise NotImplementedError(f"fmt={fmt!r}: unknown format")


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-image PSNR (dB) over (N, h, w, 3) stacks; inf where identical."""
    mse = np.mean(
        (a.astype(np.float64) - b.astype(np.float64)) ** 2, axis=(1, 2, 3)
    )
    with np.errstate(divide="ignore"):
        return np.where(mse == 0, np.inf, 10.0 * np.log10(255.0 * 255.0 / np.maximum(mse, 1e-300)))


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """64-bit average hash per image over a (N, h, w, 3) stack: grayscale
    -> 8x8 block means (add.reduceat segments) -> sign bits.  Requires
    h, w >= 8 (smaller images take the scalar path)."""
    g = pixels.astype(np.float64).mean(axis=3)
    n, h, w = g.shape
    if h < 8 or w < 8:
        return np.array([_phash64_small(g[i]) for i in range(n)], np.int64)
    ry = np.linspace(0, h, 9).astype(int)
    rx = np.linspace(0, w, 9).astype(int)
    sums = np.add.reduceat(np.add.reduceat(g, ry[:-1], axis=1), rx[:-1], axis=2)
    counts = np.diff(ry)[:, None] * np.diff(rx)[None, :]
    cells = sums / counts
    bits = (cells > cells.mean(axis=(1, 2), keepdims=True)).reshape(n, 64)
    powers = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return (bits.astype(np.uint64) * powers).sum(axis=1).astype(np.int64)


def _phash64_small(g: np.ndarray) -> int:
    h, w = g.shape
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
    return int(np.int64(out))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    return float(psnr_batch(a[None], b[None])[0])


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash: grayscale -> 8x8 block means -> sign bits.
    (Perceptual-hash stand-in; stable under the lossy stand-in codec.)
    Delegates to the batch kernel (batch of 1) so scalar and stacked paths
    can never diverge."""
    return int(phash64_batch(pixels[None])[0])


def hamming64(a: int, b: int) -> int:
    return int(bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1"))
