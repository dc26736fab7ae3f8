"""Shared planted-family fixture builders for harness gates and bench.

The WAV re-encode family and the PNG tile-crop family were copy-pasted
between their driver gates and their bench sections (four WAV copies,
two tile copies by round 9) — drift between a gate's construction and
its bench twin would silently desynchronize what they measure (r09
advice). This module is the ONE copy of each construction; both sides
build their fixtures through it.

Everything here follows the pickle house rule: each builder is a
FACTORY whose product (a plain ``text -> [payload, ...]`` closure)
captures its codec helpers BY VALUE, so a ``mapInPandas`` closure that
captures the product ships self-contained to Spark workers that don't
have this repo on ``sys.path``. The factories themselves run on the
driver only.
"""

from __future__ import annotations


def audio_fixture_primitives():
    """Return ``(lattice, pcm8_wav)``: the md5-stream byte lattice and
    the raw PCM8 RIFF writer every audio family is synthesized from.

    ``lattice(seed, n)`` expands a seed into ``n`` deterministic bytes;
    the audio families use them as 8-BIT-LATTICE samples
    ``(u - 128) << 8`` so the 16->8-bit re-encode is LOSSLESS by
    arithmetic. ``pcm8_wav`` writes an 8-bit unsigned PCM RIFF (the
    package codec only ENCODES PCM16, so the 8-bit member needs its own
    writer), word-aligning the data chunk per the RIFF spec."""
    import hashlib
    import struct

    def lattice(seed: bytes, n: int = 8000) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < n:
            out += hashlib.md5(
                seed + bytes([i & 0xFF, (i >> 8) & 0xFF])
            ).digest()
            i += 1
        return bytes(out[:n])

    def pcm8_wav(rate: int, u8: bytes) -> bytes:
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
        out = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        out += b"data" + len(u8).to_bytes(4, "little") + u8
        if len(u8) & 1:
            out += b"\x00"  # RIFF chunks are word-aligned
        return b"RIFF" + len(out).to_bytes(4, "little") + out

    return lattice, pcm8_wav


def wav_family_members():
    """The 3-member WAV RE-ENCODE family: ``members(text) ->
    [mono PCM16, stereo channel-dup PCM16, 8-bit-lattice PCM8]``.

    All three decode to the SAME sample stream (the downmix is an exact
    mean; 8-bit decodes to ``(u-128) << 8``), so their fingerprints are
    equal BY ARITHMETIC — the construction behind the audio_near_dups
    and streaming_media_dedup_ingest gates and the bench audio tier."""
    import hashlib

    from .multimodal.audio import _stdlib_wav_codec

    _, _, _wav_enc, _ = _stdlib_wav_codec()
    lattice, pcm8_wav = audio_fixture_primitives()

    def members(text: str) -> list[bytes]:
        u8 = lattice(hashlib.md5(text.encode("utf-8")).digest())
        x = [(v - 128) << 8 for v in u8]
        return [
            _wav_enc(8000, [x]),
            _wav_enc(8000, [x, x]),
            pcm8_wav(8000, u8),
        ]

    return members


def wav_rate_family_members():
    """The 3-member CROSS-RATE family: ``members(text) -> [8 kHz base,
    2x sample-replicated 16 kHz, 3x replicated 24 kHz]``.

    Nearest ``k*r -> r`` downsampling picks every k-th sample, inverting
    the replication bit-for-bit, so all three normalize to the SAME
    stream — the audio_norm_near_dups gate's construction."""
    import hashlib

    from .multimodal.audio import _stdlib_wav_codec

    _, _, _wav_enc, _ = _stdlib_wav_codec()
    lattice, _ = audio_fixture_primitives()

    def members(text: str) -> list[bytes]:
        u8 = lattice(hashlib.md5(text.encode("utf-8")).digest())
        x = [(v - 128) << 8 for v in u8]
        return [
            _wav_enc(8000, [x]),
            _wav_enc(16000, [[v for v in x for _ in range(2)]]),
            _wav_enc(24000, [[v for v in x for _ in range(3)]]),
        ]

    return members


def wav_trim_family_members(window_samples: int = 2000):
    """The 3-member TRIM family: ``members(text) -> [full 8000-sample
    clip, trim dropping the FIRST window, stereo channel-dup of the
    trim]`` (all mono-equivalent PCM16 at 8 kHz).

    The trim removes exactly one ``window_samples`` block, so every
    surviving window of the trimmed clip is byte-identical to a window
    of the original (``trimmed[i*W:(i+1)*W] == original[(i+1)*W:
    (i+2)*W]``) — window-subfingerprint set overlap is 1.0 on the
    trim's side BY ARITHMETIC, while the whole-clip fingerprint's
    segment boundaries all shift and its signature diverges. The
    audio_window_trim_near_dups gate's construction."""
    import hashlib

    from .multimodal.audio import _stdlib_wav_codec

    _, _, _wav_enc, _ = _stdlib_wav_codec()
    lattice, _ = audio_fixture_primitives()
    W = window_samples

    def members(text: str) -> list[bytes]:
        u8 = lattice(hashlib.md5(text.encode("utf-8")).digest())
        x = [(v - 128) << 8 for v in u8]
        trim = x[W:]
        return [
            _wav_enc(8000, [x]),
            _wav_enc(8000, [trim]),
            _wav_enc(8000, [trim, trim]),
        ]

    return members


def wav_cdc_trim_family_members(
    n_samples: int = 16000, trim_front: int = 1234, trim_back: int = 777
):
    """The 3-member ARBITRARY-TRIM family for the CDC tier:
    ``members(text) -> [full n_samples clip, trim dropping
    trim_front/trim_back samples off the edges, stereo channel-dup of
    the trim]`` (PCM16 at 8 kHz on the md5 lattice).

    The trim offsets are deliberately NOT multiples of the fixed-window
    tier's 2000-sample grid — every fixed window of the trim straddles
    two windows of the original, so window-subfingerprint overlap is
    ~0 (the case audio_window_trim_near_dups pins as honest
    degradation) — while content-defined segmentation re-synchronizes
    after at most one segment per edited edge, so CDC segment overlap
    stays high (measured worst 0.83 over 120 seeds at the kernel
    defaults). The audio_cdc_trim_near_dups gate's construction."""
    import hashlib

    from .multimodal.audio import _stdlib_wav_codec

    _, _, _wav_enc, _ = _stdlib_wav_codec()
    lattice, _ = audio_fixture_primitives()

    def members(text: str) -> list[bytes]:
        u8 = lattice(
            hashlib.md5(text.encode("utf-8")).digest(), n_samples
        )
        x = [(v - 128) << 8 for v in u8]
        trim = x[trim_front : n_samples - trim_back]
        return [
            _wav_enc(8000, [x]),
            _wav_enc(8000, [trim]),
            _wav_enc(8000, [trim, trim]),
        ]

    return members


def image_fixture_primitives():
    """Return ``(noise_pix, crop)``: the md5-stream grayscale noise
    plane and the rectangular crop helper the tile families build on."""
    import hashlib

    def noise_pix(seed: bytes, w: int, h: int) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < w * h:
            out += hashlib.md5(seed + i.to_bytes(2, "big")).digest()
            i += 1
        return bytes(out[: w * h])

    def crop(
        pix: bytes, w: int, x0: int, y0: int, cw: int, ch: int
    ) -> bytes:
        return b"".join(
            pix[(y0 + y) * w + x0 : (y0 + y) * w + x0 + cw]
            for y in range(ch)
        )

    return noise_pix, crop


def image_encoding_variants():
    """``variant(pix, k) -> bytes``: four byte-DIFFERENT encodings of
    one 32x32 luma plane that decode IDENTICALLY (gray PNG /
    gray-palette GIF / REVERSED-palette GIF with inverted indices and
    inverted palette / RGB PNG with R=G=B) — dHash-equal by arithmetic,
    the multimodal_corpus_prep construction (NOT an upscale: the 9-wide
    dHash grid does not divide 64, so integer upscales are not
    hash-exact for dHash)."""
    from .multimodal.binary import _stdlib_png_codec
    from .multimodal.gif import _stdlib_gif_codec

    _, _, _png_enc, _ = _stdlib_png_codec()
    _, _, _gif_enc = _stdlib_gif_codec()
    gray_pal = [(i, i, i) for i in range(256)]
    rev_pal = [(255 - i, 255 - i, 255 - i) for i in range(256)]

    def variant(pix: bytes, k: int) -> bytes:
        k = k % 4
        if k == 0:
            return _png_enc(32, 32, 1, pix)
        if k == 1:
            return _gif_enc(32, 32, pix, gray_pal)
        if k == 2:
            return _gif_enc(32, 32, bytes(255 - v for v in pix), rev_pal)
        return _png_enc(32, 32, 3, b"".join(bytes((v, v, v)) for v in pix))

    return variant


def wav_encoding_variants():
    """``variant(u8, k) -> bytes``: four byte-DIFFERENT encodings of one
    8-bit-lattice sample stream whose FINGERPRINTS are equal by
    arithmetic — mono PCM16, stereo channel-dup (exact-mean downmix),
    PCM8 (lossless on the lattice), and HALF-GAIN PCM16 ((u-128)<<7:
    scaling by a power of two is exact in IEEE float, so every band
    energy scales by exactly 1/4 and the double-difference signs are
    unchanged — the gain invariance pinned in tests/test_audio.py)."""
    from .multimodal.audio import _stdlib_wav_codec

    _, _, _wav_enc, _ = _stdlib_wav_codec()
    _, pcm8_wav = audio_fixture_primitives()

    def variant(u8: bytes, k: int) -> bytes:
        k = k % 4
        if k == 2:
            return pcm8_wav(8000, u8)
        if k == 3:
            return _wav_enc(8000, [[(v - 128) << 7 for v in u8]])
        x = [(v - 128) << 8 for v in u8]
        return _wav_enc(8000, [x] if k == 0 else [x, x])

    return variant


def mjpeg_video_variants():
    """``variant(seed, k) -> bytes``: two MJPEG/AVI containers over the
    SAME deterministic 72x64 noise frames — member 0 carries 5 frames,
    member 1 the first 4 (a frame-SAMPLE variant, not a re-encode: the
    JPEG encoder is deterministic, so shared frames are byte-identical
    and dHash-equal by arithmetic; frame-set overlap = 4/min(5,4) = 1)."""
    import hashlib

    from .multimodal.jpeg import _stdlib_jpeg_codec
    from .multimodal.video import _stdlib_avi_codec

    _, _, _jpeg_enc = _stdlib_jpeg_codec()
    _, _, _avi_enc = _stdlib_avi_codec()

    def noise(seed: bytes, n: int) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < n:
            out += hashlib.md5(seed + i.to_bytes(2, "big")).digest()
            i += 1
        return bytes(out[:n])

    def variant(seed: bytes, k: int) -> bytes:
        frames = [
            _jpeg_enc(72, 64, 1, noise(seed + bytes([fi]), 72 * 64),
                      quality=90)
            for fi in range(5 if k % 2 == 0 else 4)
        ]
        return _avi_enc(frames, fps=10, width=72, height=64)

    return variant


def dhash_family_members():
    """The 3-member dHash IMAGE family: ``members(text) -> [72x64
    block-grid gray PNG, baseline JPEG q90 of the same pixels, GIF of
    the 2x nearest upscale]`` — byte-different, pixel-similar (the
    r06 image_phash_near_dups construction, hoisted for the merged
    multi-variant gate). Horizontally adjacent 8-px blocks sit >= 32
    luma apart so every dHash gradient sign survives JPEG q90 noise."""
    import hashlib

    from .multimodal.binary import _stdlib_png_codec
    from .multimodal.gif import _stdlib_gif_codec
    from .multimodal.jpeg import _stdlib_jpeg_codec

    _, _, _png_enc, _ = _stdlib_png_codec()
    _, _, _jpeg_enc = _stdlib_jpeg_codec()
    _, _, _gif_enc = _stdlib_gif_codec()
    gray_pal = [(i, i, i) for i in range(256)]
    levels = [16, 48, 80, 112, 144, 176, 208, 240]
    gw, gh, blk = 9, 8, 8

    def base_pixels(seed: bytes) -> bytes:
        vals = []
        for r in range(gh):
            row = []
            for c in range(gw):
                hv = hashlib.md5(seed + bytes([r, c])).digest()[0]
                v = levels[hv % 8]
                if c > 0 and v == row[-1]:
                    v = levels[(hv % 8 + 1) % 8]
                row.append(v)
            vals.append(row)
        pix = bytearray()
        for r in range(gh):
            rowbytes = bytearray()
            for c in range(gw):
                rowbytes += bytes([vals[r][c]]) * blk
            pix += bytes(rowbytes) * blk
        return bytes(pix)

    def upscale2(pix: bytes, w: int, h: int) -> bytes:
        out = bytearray()
        for y in range(h):
            d = bytearray()
            for v in pix[y * w : (y + 1) * w]:
                d += bytes([v, v])
            out += d + d
        return bytes(out)

    def members(text: str) -> list[bytes]:
        seed = hashlib.md5(text.encode("utf-8")).digest()
        pix = base_pixels(seed)
        w, h = gw * blk, gh * blk
        return [
            _png_enc(w, h, 1, pix),
            _jpeg_enc(w, h, 1, pix, quality=90),
            _gif_enc(2 * w, 2 * h, upscale2(pix, w, h), gray_pal),
        ]

    return members


def dct_family_members():
    """The 3-member DCT-pHash IMAGE family: ``members(text) -> [32x32
    gray PNG, GIF palette re-encode of the identical pixels, PNG of
    the 2x nearest upscale]`` — all three hash IDENTICALLY under the
    32x32-grid DCT pHash by arithmetic (a k-times-integer upscale of a
    grid-sized image area-averages back to the same raster). Hoisted
    from the r07 image_phash_dct_near_dups gate for the merged
    multi-variant gate."""
    import hashlib

    from .multimodal.binary import _stdlib_png_codec
    from .multimodal.gif import _stdlib_gif_codec

    _, _, _png_enc, _ = _stdlib_png_codec()
    _, _, _gif_enc = _stdlib_gif_codec()
    gray_pal = [(i, i, i) for i in range(256)]

    def base32(seed: bytes) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < 32 * 32:
            out += hashlib.md5(seed + bytes([i])).digest()
            i += 1
        return bytes(out[: 32 * 32])

    def up2(pix: bytes, w: int, h: int) -> bytes:
        o = bytearray()
        for y in range(h):
            d = bytearray()
            for v in pix[y * w : (y + 1) * w]:
                d += bytes([v, v])
            o += d + d
        return bytes(o)

    def members(text: str) -> list[bytes]:
        pix = base32(hashlib.md5(text.encode("utf-8")).digest())
        return [
            _png_enc(32, 32, 1, pix),
            _gif_enc(32, 32, pix, gray_pal),
            _png_enc(64, 64, 1, up2(pix, 32, 32)),
        ]

    return members


def tile_crop_family_members(crop_x: int = 32, crop_y: int = 32):
    """The 3-member TILE-CROP family: ``members(text) -> [128x128 gray
    PNG, PNG of its 96x96 interior crop at (crop_x, crop_y), GIF
    re-encode of the same crop]``.

    With the default (32, 32) offset the crop is TILE-ALIGNED for the
    32-px tile grid, so its surviving tiles are byte-identical to the
    original's interior tiles (the image_tile_crop_near_dups gate);
    (16, 16) makes it HALF-tile-aligned — off the base grid but exactly
    on the tile/2 offset phase, the two-phase gate's construction;
    (17, 23) is off BOTH phases in both axes — the case the phase-grid
    tier pins as honest degradation and the row-CDC tier
    (image_cdc_crop_near_dups gate) recovers at any offset."""
    import hashlib

    from .multimodal.binary import _stdlib_png_codec
    from .multimodal.gif import _stdlib_gif_codec

    _, _, _png_enc, _ = _stdlib_png_codec()
    _, _, _gif_enc = _stdlib_gif_codec()
    noise_pix, crop = image_fixture_primitives()
    gray_pal = [(i, i, i) for i in range(256)]
    cx, cy = crop_x, crop_y

    def members(text: str) -> list[bytes]:
        pix = noise_pix(
            hashlib.md5(text.encode("utf-8")).digest(), 128, 128
        )
        cr = crop(pix, 128, cx, cy, 96, 96)
        return [
            _png_enc(128, 128, 1, pix),
            _png_enc(96, 96, 1, cr),
            _gif_enc(96, 96, cr, gray_pal),
        ]

    return members


def mirror_family_members():
    """The 3-member MIRROR-REPOST family: ``members(text) -> [32x32
    gray PNG, PNG of its left-right mirror, GIF palette re-encode of
    the mirror]``.

    A horizontal mirror is the common social-media repost transform;
    members (b) and (c) decode to the IDENTICAL flipped luma plane, so
    they hash equal under ANY kernel, while (a) matches them only
    through the mirror-canonical signature (min of hash and
    flipped-hash — exact collapse BY ARITHMETIC). The
    image_mirror_canonical_near_dups gate's construction; its 'plain'
    variant row pins the 1-pair-per-family gap the option closes."""
    import hashlib

    from .multimodal.binary import _stdlib_png_codec
    from .multimodal.gif import _stdlib_gif_codec

    _, _, _png_enc, _ = _stdlib_png_codec()
    _, _, _gif_enc = _stdlib_gif_codec()
    noise_pix, _ = image_fixture_primitives()
    gray_pal = [(i, i, i) for i in range(256)]

    def members(text: str) -> list[bytes]:
        pix = noise_pix(
            hashlib.md5(text.encode("utf-8")).digest(), 32, 32
        )
        mir = b"".join(
            pix[y * 32 : (y + 1) * 32][::-1] for y in range(32)
        )
        return [
            _png_enc(32, 32, 1, pix),
            _png_enc(32, 32, 1, mir),
            _gif_enc(32, 32, mir, gray_pal),
        ]

    return members


def wav_cdc_gain_family_members(
    n_samples: int = 16000, trim_front: int = 1234, trim_back: int = 777
):
    """The 3-member GAIN x ARBITRARY-TRIM family for the sign-anchored
    CDC tier: ``members(text) -> [full clip, GAIN-DOUBLED arbitrary
    trim, stereo channel-dup of the gain-trim]`` (PCM16 at 8 kHz on
    the md5 lattice, synthesized at <<6 scale so the x2 gain stays
    inside int16 exactly).

    The trim offsets are off the fixed-window grid AND the copy is
    gain-scaled — the one cell of the robustness matrix r11 left open:
    amplitude-anchored CDC loses every anchor to the gain (its gate
    pins exactly that as honest degradation on these members), while
    sign-anchored CDC chooses identical boundaries (positive gain
    preserves every sample's sign) and the band-energy-sign
    fingerprint is gain-invariant by arithmetic, so shared segments
    land EXACT. Measured worst within-family overlap 0.90 across 40
    lattice seeds; cross-family 0.0. The audio_cdc_gain_near_dups
    gate's construction."""
    import hashlib

    from .multimodal.audio import _stdlib_wav_codec

    _, _, _wav_enc, _ = _stdlib_wav_codec()
    lattice, _ = audio_fixture_primitives()

    def members(text: str) -> list[bytes]:
        u8 = lattice(
            hashlib.md5(text.encode("utf-8")).digest(), n_samples
        )
        x = [(v - 128) << 6 for v in u8]
        gain_trim = [
            2 * v for v in x[trim_front : n_samples - trim_back]
        ]
        return [
            _wav_enc(8000, [x]),
            _wav_enc(8000, [gain_trim]),
            _wav_enc(8000, [gain_trim, gain_trim]),
        ]

    return members


def mjpeg_cdc_crop_family_members(
    crop_x: int = 8, crop_y: int = 24, n_frames: int = 3
):
    """The 2-member CROPPED-VIDEO family for the per-frame row-CDC tier:
    ``members(text) -> [96x64 3-frame MJPEG/AVI, the SAME footage
    cropped to 80x32 at (crop_x, crop_y)]``.

    The default (8, 24) offset is OFF both 32-px tile phases in BOTH
    axes (the tile lattice's honest-degradation case, same construction
    as the image tier's (17, 23)) but ON the JPEG 8-px MCU grid — the
    only crops of a LOSSY-frame video that CAN be pixel-exact: JPEG
    processes 8x8 blocks independently, so every frame here is built
    from per-block q90 ROUNDTRIP FIXED POINTS (md5-noise blocks
    iterated through encode∘decode until stable, salt-retried on the
    rare cycle) — the full frame then decodes to exactly its own
    pixels, and any MCU-aligned crop of those pixels re-encodes
    byte-exactly. Measured across 12 seeds at these dims: worst
    within-family row-CDC overlap 0.78, cross-family 0.0 (threshold
    0.5 sits far from both). Truly off-MCU crops of lossy video are
    quantization-divergent by construction — pinned OUT OF SCOPE in
    :func:`..multimodal.phash.video_cdc_crop_near_dup_pairs`."""
    import hashlib

    from .multimodal.jpeg import _stdlib_jpeg_codec
    from .multimodal.video import _stdlib_avi_codec

    _, _jpeg_dec, _jpeg_enc = _stdlib_jpeg_codec()
    _, _, _avi_enc = _stdlib_avi_codec()
    gw, gh = 12, 8  # 8x8 blocks -> 96x64 frames
    cw, ch = 80, 32

    def fixed_block(seed: bytes) -> bytes:
        for salt in range(16):
            b = b"".join(
                hashlib.md5(seed + bytes([salt, j])).digest()
                for j in range(4)
            )
            for _ in range(8):
                _, _, _, q = _jpeg_dec(_jpeg_enc(8, 8, 1, b, quality=90))
                if q == b:
                    return b
                b = q
        raise RuntimeError("no q90 fixed point within salt budget")

    def frame_pixels(seed: bytes) -> bytes:
        blocks = [
            [fixed_block(seed + bytes([r, c])) for c in range(gw)]
            for r in range(gh)
        ]
        pix = bytearray()
        for r in range(gh):
            for y in range(8):
                for c in range(gw):
                    pix += blocks[r][c][y * 8 : (y + 1) * 8]
        return bytes(pix)

    def crop(pix: bytes, w: int) -> bytes:
        return b"".join(
            pix[(crop_y + y) * w + crop_x : (crop_y + y) * w + crop_x + cw]
            for y in range(ch)
        )

    def members(text: str) -> list[bytes]:
        seed = hashlib.md5(text.encode("utf-8")).digest()
        full, cropped = [], []
        for fi in range(n_frames):
            pix = frame_pixels(seed + bytes([fi]))
            full.append(_jpeg_enc(gw * 8, gh * 8, 1, pix, quality=90))
            cropped.append(
                _jpeg_enc(cw, ch, 1, crop(pix, gw * 8), quality=90)
            )
        return [
            _avi_enc(full, fps=10, width=gw * 8, height=gh * 8),
            _avi_enc(cropped, fps=10, width=cw, height=ch),
        ]

    return members
