"""Stdlib GIF codec (multimodal/gif.py) + its wiring through the real
image paths: LZW round-trip, interlace, transparency, quarantine."""

from __future__ import annotations

import pytest

from airflow_etl_finance_market_spark.multimodal.gif import (
    _stdlib_gif_codec,
)

_PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


def _quad_gif(enc, w=6, h=4):
    idx = bytes((x + y) % 4 for y in range(h) for x in range(w))
    return enc(w, h, idx, _PAL4), idx


class TestStdlibGifCodec:
    def _codec(self):
        return _stdlib_gif_codec()

    def test_lzw_roundtrip_exact(self):
        """GIF is palette-lossless: encode -> decode must reproduce every
        pixel's palette color exactly (the degenerate clear-per-literal
        LZW stream is still a spec-valid stream the standard decoder
        algorithm must accept)."""
        size, dec, enc = self._codec()
        b, idx = _quad_gif(enc)
        assert size(b) == (6, 4)
        w, h, ch, pix = dec(b)
        assert (w, h, ch) == (6, 4, 3)
        assert pix == b"".join(bytes(_PAL4[v]) for v in idx)

    def test_256_color_palette(self):
        _, dec, enc = self._codec()
        pal = [(i, i, i) for i in range(256)]
        idx = bytes(range(256))
        _, _, _, pix = dec(enc(16, 16, idx, pal))
        assert pix == b"".join(bytes((v, v, v)) for v in idx)

    def test_interlaced_rows_reordered(self):
        """Hand-interlace a 9-row image (permute rows into pass order and
        set the interlace flag): the decoder must hand back the rows in
        display order — a property a sequential-only reader fails."""
        _, dec, enc = self._codec()
        w, h = 3, 9
        idx = bytes(r % 4 for r in range(h) for _ in range(w))
        b = bytearray(enc(w, h, idx, _PAL4))
        # rewrite the image data: rows permuted into interlace pass order
        passes = [r for first, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                  for r in range(first, h, step)]
        perm = bytes(v for r in passes for v in idx[r * w : (r + 1) * w])
        b2 = bytearray(enc(w, h, perm, _PAL4))
        # set the interlace bit in the image descriptor's flag byte
        desc = bytes(b2).index(b"\x2c")
        b2[desc + 9] |= 0x40
        _, _, _, pix = dec(bytes(b2))
        assert pix == b"".join(bytes(_PAL4[v]) for v in idx)

    def test_transparency_yields_rgba(self):
        """A GIF89a GCE with a transparency index must surface as a 4th
        channel with alpha 0 exactly on that index."""
        _, dec, enc = self._codec()
        b = bytearray(enc(2, 2, bytes([0, 1, 2, 3]), _PAL4))
        # splice a GCE (transparent index 2) before the image descriptor
        desc = bytes(b).index(b"\x2c")
        gce = b"\x21\xf9\x04\x01\x00\x00\x02\x00"
        b2 = bytes(b[:desc]) + gce + bytes(b[desc:])
        b2 = b2.replace(b"GIF87a", b"GIF89a", 1)
        w, h, ch, pix = dec(b2)
        assert ch == 4
        alphas = [pix[i * 4 + 3] for i in range(4)]
        assert alphas == [255, 255, 0, 255]

    def test_truncation_refuses(self):
        _, dec, enc = self._codec()
        b, _ = _quad_gif(enc, w=16, h=16)
        with pytest.raises(ValueError):
            dec(b[: len(b) // 2])

    def test_background_fill_uses_global_table_not_local(self):
        """A sub-rect frame with BOTH a global and a local color table:
        the logical-screen background index (header byte 11) refers to
        the GLOBAL table per GIF89a §18 — r06 advice caught the fill
        reading the frame's LOCAL table instead. GCT[1] is green,
        LCT[1] is blue; the uncovered area must come out green."""
        _, dec, enc = self._codec()
        gct_pal = [(10, 10, 10), (0, 255, 0), (20, 20, 20), (30, 30, 30)]
        lct_pal = [(255, 0, 0), (0, 0, 255), (99, 99, 99), (77, 77, 77)]
        # encode a 2x2 frame against the LCT palette, then lift its LZW
        # blocks into a hand-built 4x4-screen GIF carrying both tables
        small = enc(2, 2, bytes([0, 1, 2, 3]), lct_pal)
        desc = small.index(b"\x2c")
        lzw = small[desc + 10 :]  # min_code + sub-blocks + trailer
        b = bytearray(b"GIF87a")
        b += (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
        b += bytes([0x81, 1, 0])  # GCT present (4 colors), bg index 1
        for c in gct_pal:
            b += bytes(c)
        b += b"\x2c" + b"\x00" * 4  # frame at (0, 0)
        b += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        b += bytes([0x81])  # LCT present, 4 colors
        for c in lct_pal:
            b += bytes(c)
        b += lzw
        w, h, ch, pix = dec(bytes(b))
        assert (w, h, ch) == (4, 4, 3)
        px = [tuple(pix[i * 3 : i * 3 + 3]) for i in range(16)]
        # frame pixels (top-left 2x2) resolve through the LOCAL table
        assert px[0] == lct_pal[0] and px[1] == lct_pal[1]
        assert px[4] == lct_pal[2] and px[5] == lct_pal[3]
        # every uncovered pixel takes the GLOBAL table's bg color
        uncovered = [px[i] for i in range(16) if i not in (0, 1, 4, 5)]
        assert uncovered == [(0, 255, 0)] * 12


class TestGifOnSpark:
    def test_decode_image_and_features_sniff(self, spark):
        from airflow_etl_finance_market_spark.multimodal.binary import (
            decode_image,
            extract_binary_features,
        )

        _, _, enc = _stdlib_gif_codec()
        b, _ = _quad_gif(enc, w=11, h=7)
        assert decode_image(b) == (11, 7)
        media = spark.createDataFrame(
            [(1, bytearray(b)), (2, bytearray(b"GIF8 truncated"))],
            "doc_id long, payload binary",
        )
        feats = {
            r.doc_id: (r.width, r.height, r.mime)
            for r in extract_binary_features(
                media, use_fake_codec=False
            ).collect()
        }
        assert feats[1] == (11, 7, "image/gif")
        # the mangled payload sniffs as gif by prefix but must QUARANTINE
        # to NULL dims (bad version bytes / truncated header refuse)
        assert feats[2] == (None, None, "image/gif")

    def test_real_resize_gif_in_png_out(self, spark):
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
            resize_images,
        )

        _, _, enc = _stdlib_gif_codec()
        # 2x2 quadrant colors, upscaled 8x8: nearest must tile quadrants
        b = enc(2, 2, bytes([0, 1, 2, 3]), _PAL4)
        media = spark.createDataFrame(
            [(1, bytearray(b))], "doc_id long, payload binary"
        )
        rows = resize_images(
            media, target_w=8, target_h=8, use_fake_codec=False
        ).collect()
        assert len(rows) == 1
        png_decode = _stdlib_png_codec()[1]
        w, h, ch, pix = png_decode(bytes(rows[0].payload))
        assert (w, h, ch) == (8, 8, 3)

        def px(x, y):
            i = (y * 8 + x) * 3
            return tuple(pix[i : i + 3])

        assert px(0, 0) == _PAL4[0] and px(7, 0) == _PAL4[1]
        assert px(0, 7) == _PAL4[2] and px(7, 7) == _PAL4[3]

    def test_pillow_interop_when_installed(self):
        import importlib.util

        if importlib.util.find_spec("PIL") is None:
            pytest.skip("Pillow not installed")
        import io

        from PIL import Image

        size, dec, enc = _stdlib_gif_codec()
        b, idx = _quad_gif(enc, w=10, h=6)
        im = Image.open(io.BytesIO(b))
        assert im.size == (10, 6)
        theirs = im.convert("RGB").tobytes()
        assert theirs == dec(b)[3]
        # and our decoder reads Pillow's (real-LZW) output exactly
        buf = io.BytesIO()
        im.save(buf, "GIF")
        w, h, ch, mine = dec(buf.getvalue())
        assert (w, h) == (10, 6) and mine[: len(theirs)] == theirs


def _real_lzw_compress(indices: bytes, min_code: int) -> bytes:
    """Spec-faithful GIF LZW compressor (dictionary growth, width bumps
    at 2^width, 12-bit cap with CLEAR) — an independent implementation
    to validate the decoder's width/dictionary timing against streams a
    REAL encoder emits (our fixture encoder never grows the width)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = n_bits = 0
    width = min_code + 1

    def put(code: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    put(clear)
    buf = b""
    for byte in indices:
        cand = buf + bytes([byte])
        if cand in table:
            buf = cand
            continue
        put(table[buf])
        table[cand] = next_code
        next_code += 1
        # width grows when the NEXT code to assign no longer fits
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        buf = bytes([byte])
    if buf:
        put(table[buf])
    put(end)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_decoder_reads_real_lzw_streams():
    """Splice a properly-compressed LZW stream (dictionary growth, width
    bumps, KwKwK patterns, dictionary reset near 4096) into the encoder's
    container: the decoder must reproduce the exact indices. This is the
    independent-stream check the Pillow-gated test provides only when
    Pillow is installed."""
    size, dec, enc = _stdlib_gif_codec()
    pal = [(i * 16 % 256, i, 255 - i) for i in range(16)]
    # repetitive data drives real dictionary growth and the KwKwK case;
    # enough volume to push past several width bumps
    idx = bytes((x // 3 + y) % 16 for y in range(64) for x in range(64))
    container = bytearray(enc(64, 64, idx, pal))
    desc = bytes(container).index(b"\x2c")
    min_code = container[desc + 10]
    stream = _real_lzw_compress(idx, min_code)
    blocks = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    new = (
        bytes(container[: desc + 11]) + bytes(blocks) + b"\x00\x3b"
    )
    assert len(new) < len(bytes(container))  # real LZW actually compresses
    w, h, ch, pix = dec(new)
    assert (w, h, ch) == (64, 64, 3)
    assert pix == b"".join(bytes(pal[v]) for v in idx)


def test_every_truncation_point_raises_valueerror():
    """Exhaustive truncation sweep (round-6 review): decoding ANY prefix
    of a real GIF — plain and GCE-bearing — must raise ValueError (the
    documented contract callers catch), never IndexError or fabricated
    output."""
    size, dec, enc = _stdlib_gif_codec()
    pal = [(i, i, i) for i in range(8)]
    b = enc(9, 7, bytes((x % 8) for x in range(63)), pal)
    desc = b.index(b"\x2c")
    b89 = (
        b[:desc] + b"\x21\xf9\x04\x01\x00\x00\x02\x00" + b[desc:]
    ).replace(b"GIF87a", b"GIF89a", 1)
    for payload in (b, b89):
        want = dec(payload)
        for cut in range(len(payload)):
            try:
                got = dec(payload[:cut])
            except ValueError:
                continue
            # the only legal success: the frame was already complete
            # (e.g. only the trailer is missing) AND pixels are exact —
            # never fabricated/partial output, never a non-ValueError
            assert got == want, f"partial decode fabricated output at cut {cut}"
