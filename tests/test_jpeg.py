"""Baseline-JPEG codec pins (VERDICT r15 item 5).

The core contract: decode(encode(pixels)) must equal an INDEPENDENT
numpy replay of the lossy pipeline (color transform, subsampling,
block DCT, Annex-K quantization, dequant, IDCT, upsample, color
inverse) that shares only the published tables and rounding
conventions with the codec — so a bug anywhere in the entropy coder,
zigzag, table plumbing, or IDCT shows up as a pixel mismatch instead
of silently self-cancelling through a shared helper.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from cpx_etl_spark.functions.jpeg import (
    QUANT_CHROMA,
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
)

# independent DCT matrix: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_M = np.array(
    [
        [
            (1 / math.sqrt(2) if u == 0 else 1.0)
            / 2
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _md5_pixels(tag: str, n: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{tag}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def _pad_replicate(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    out = np.empty((ph, pw), dtype=np.float64)
    ys = np.minimum(np.arange(ph), h - 1)
    xs = np.minimum(np.arange(pw), w - 1)
    out[:, :] = plane[np.ix_(ys, xs)]
    return out


def _replay_plane(plane: np.ndarray, q: list[int]) -> np.ndarray:
    """Forward DCT -> quantize (half away from zero) -> dequant ->
    IDCT -> +128 shift with clamp, per 8x8 block; returns the decoded
    plane at padded size."""
    qm = np.array(q, dtype=np.float64).reshape(8, 8)
    padded = _pad_replicate(plane, 8)
    ph, pw = padded.shape
    out = np.empty_like(padded)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            s = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            f = _M @ s @ _M.T
            r = f / qm
            qc = np.where(r >= 0, np.floor(r + 0.5 - 1e-9), np.ceil(r - 0.5 + 1e-9))
            d = qc * qm
            p = _M.T @ d @ _M
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                np.floor(p + 128.5 - 1e-9), 0, 255
            )
    return out


def _round_clamp(v: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(v + 0.5 - 1e-9), 0, 255)


def test_jpeg_gray_decode_matches_independent_replay():
    for w, h in ((8, 8), (16, 16), (13, 11), (7, 3), (1, 1), (32, 9)):
        px = _md5_pixels(f"g{w}x{h}", w * h)
        plane = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(
            np.float64
        )
        want = _replay_plane(plane, QUANT_LUMA)[:h, :w]
        ww, hh, ch, got = decode_jpeg(encode_jpeg(px, w, h, 1))
        assert (ww, hh, ch) == (w, h, 1)
        got_a = np.frombuffer(got, dtype=np.uint8).reshape(h, w)
        assert np.array_equal(got_a, want.astype(np.uint8)), (
            f"gray {w}x{h}: decode != independent replay "
            f"(max |diff| {np.abs(got_a - want).max()})"
        )


def _replay_color(px: bytes, w: int, h: int, sub: str) -> np.ndarray:
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(
        np.float64
    )
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = _round_clamp(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _round_clamp(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = _round_clamp(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    if sub == "420":
        def box(p: np.ndarray) -> np.ndarray:
            pp = _pad_replicate(p, 2)
            return np.floor(
                (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2]
                 + pp[1::2, 1::2]) / 4
            )

        cb, cr = box(cb), box(cr)
    yd = _replay_plane(y, QUANT_LUMA)
    cbd = _replay_plane(cb, QUANT_CHROMA)
    crd = _replay_plane(cr, QUANT_CHROMA)
    # upsample by replication to (h, w)
    ys = np.arange(h)
    xs = np.arange(w)
    yd = yd[:h, :w]
    if sub == "420":
        cbd = cbd[np.ix_(ys // 2, xs // 2)]
        crd = crd[np.ix_(ys // 2, xs // 2)]
    else:
        cbd, crd = cbd[:h, :w], crd[:h, :w]
    rr = _round_clamp(yd + 1.402 * (crd - 128))
    gg = _round_clamp(yd - 0.344136 * (cbd - 128) - 0.714136 * (crd - 128))
    bb = _round_clamp(yd + 1.772 * (cbd - 128))
    return np.stack([rr, gg, bb], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_jpeg_color_decode_matches_independent_replay(sub):
    for w, h in ((8, 8), (24, 17), (16, 16), (5, 5)):
        px = _md5_pixels(f"c{sub}{w}x{h}", w * h * 3)
        want = _replay_color(px, w, h, sub)
        ww, hh, ch, got = decode_jpeg(encode_jpeg(px, w, h, 3, subsample=sub))
        assert (ww, hh, ch) == (w, h, 3)
        got_a = np.frombuffer(got, dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(got_a, want), (
            f"color {sub} {w}x{h}: decode != independent replay "
            f"(max |diff| {np.abs(got_a.astype(int) - want.astype(int)).max()})"
        )


def test_jpeg_flat_color_near_lossless():
    """A flat field is pure DC — the codec must reproduce it within
    quantization-of-DC error (<= 2 levels after color transform)."""
    flat = bytes([200, 30, 90]) * (16 * 16)
    for sub in ("444", "420"):
        _, _, _, out = decode_jpeg(encode_jpeg(flat, 16, 16, 3, subsample=sub))
        assert max(abs(a - c) for a, c in zip(flat, out)) <= 3


def test_jpeg_unsupported_and_corrupt_fail_loud():
    """decode_image's ValueError contract extends to JPEG: corrupt
    streams with valid magic, progressive SOF2, and truncation all
    raise ValueError — never struct/IndexError/infinite loops."""
    from cpx_etl_spark.operators.multimodal import decode_image

    px = _md5_pixels("fl", 16 * 16)
    good = encode_jpeg(px, 16, 16, 1)
    # flip SOF0 -> SOF2 (progressive): find the FFC0 marker
    i = good.index(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2:]
    corrupt = [
        good[:20],             # cut inside the header segments
        good[:-10],            # truncated entropy stream / no EOI
        good[:2],              # SOI only
        prog,                  # progressive process
        b"\xff\xd8\xff\xe0" + b"\x00\x04" + b"ab",  # header-only stream
    ]
    for bad in corrupt:
        with pytest.raises(ValueError):
            decode_image(bad)
    # the wrap must not eat the happy path
    fmt, w, h, ch, out = decode_image(good)
    assert (fmt, w, h, ch) == ("jpeg", 16, 16, 1) and len(out) == 256


def test_dhash_and_tiles_accept_jpeg_containers(spark):
    """The pipeline acceptance pin: dHash and tiling run end-to-end on
    JPEG payloads behind decode_containers=True, and the dHash equals
    the one computed from decode_image's own pixels (same thumbnail
    arithmetic as the PNG/BMP acceptance)."""
    from pyspark.sql import functions as F

    from cpx_etl_spark.operators.multimodal import (
        decode_image,
        dhash_56,
        gray_pixels,
        image_tiles,
        sample_grid,
    )

    payloads = {}
    for i in range(6):
        w, h = 8 + 3 * i, 6 + 2 * i
        chs = 1 if i % 2 else 3
        px = _md5_pixels(f"sp{i}", w * h * chs)
        payloads[i] = encode_jpeg(
            px, w, h, chs, subsample="420" if (chs == 3 and i % 3 == 0) else "444"
        )

    df = spark.createDataFrame(
        [(i, b) for i, b in payloads.items()], "doc_id bigint, payload binary"
    )
    got = {r["doc_id"]: r["phash"] for r in
           dhash_56(df, decode_containers=True).collect()}

    def ref_hash(b: bytes) -> int:
        _f, w, hgt, ch, pxs = decode_image(b)
        thumb = sample_grid(gray_pixels(w, hgt, ch, pxs), w, hgt, 9, 7)
        hv = 0
        for r in range(7):
            for c in range(8):
                if thumb[9 * r + c] > thumb[9 * r + c + 1]:
                    hv |= 1 << (r * 8 + c)
        return hv

    for i, b in payloads.items():
        assert got[i] == ref_hash(b)
        assert 0 <= got[i] < (1 << 56)

    tiles = image_tiles(df, decode_containers=True)
    assert tiles.filter(F.col("doc_id") == 0).count() > 0


def test_jpeg_single_component_scan_is_noninterleaved():
    """T.81 A.2 (code-review r16): a 1-component scan is
    NON-interleaved — blocks walk the component's own raster grid
    regardless of the SOF sampling factors. A grayscale stream whose
    SOF declares 2x2 sampling (valid; factors only matter against
    other components) must decode identically to the 1x1 encoding of
    the same blocks, at MCU-multiple and non-multiple dims alike."""
    for w, h in ((32, 16), (24, 16), (13, 11)):
        px = _md5_pixels(f"ni{w}x{h}", w * h)
        good = encode_jpeg(px, w, h, 1)
        _, _, _, want = decode_jpeg(good)
        seg = bytearray(good)
        i = good.index(b"\xff\xc0")
        assert seg[i + 11] == 0x11  # component 1 hv byte
        seg[i + 11] = 0x22
        ww, hh, ch, got = decode_jpeg(bytes(seg))
        assert (ww, hh, ch) == (w, h, 1) and got == want


def test_jpeg_huge_claimed_dims_fail_loud_not_oom():
    """Code-review r16: SOF-claimed dimensions drive plane allocation,
    so a tiny crafted payload claiming 65000x65000 must raise
    ValueError via the payload-proportional block bound (every block
    costs >= 2 entropy bits) — never a multi-GB bytearray or
    MemoryError escaping the ValueError contract."""
    import struct

    import pytest as _pytest

    px = _md5_pixels("hd", 16 * 16)
    for chans in (1, 3):
        good = encode_jpeg(px * (3 if chans == 3 else 1), 16, 16, chans)
        seg = bytearray(good)
        i = good.index(b"\xff\xc0")
        seg[i + 5:i + 9] = struct.pack(">HH", 65000, 65000)
        with _pytest.raises(ValueError, match="implausible"):
            decode_jpeg(bytes(seg))
