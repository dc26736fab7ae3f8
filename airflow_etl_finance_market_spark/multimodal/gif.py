"""Pure-stdlib GIF decoder (LZW) — the third REAL image format.

After PNG and baseline JPEG, GIF is the remaining image format a web
crawl contains in volume, and it too needs only the stdlib: the hard
part is variable-width LSB-first LZW, ~60 lines. Same honesty pattern
as the sibling codecs:

- **Decode**: GIF87a/GIF89a, global and local color tables, interlaced
  and sequential row order, FIRST frame of an animation (the frame a
  thumbnail/feature pipeline wants), transparency index surfaced as a
  4th RGBA channel when a GCE declares one. Extensions are skipped by
  the sub-block walk, so real-world files parse.
- **Encode** (fixtures only): GIF87a writer using the classic
  clear-code-per-pixel LZW degenerate form — every pixel emitted as a
  literal code with a CLEAR before it, so code width never grows. Twice
  the bytes of real LZW and spec-valid; any compliant decoder (ours,
  Pillow) reads it, which is the validity-over-efficiency trade the
  JPEG fixture encoder documents.
- Truncated streams RAISE (the sub-block walk refuses to fabricate
  missing data), so the frame-level Spark paths QUARANTINE them —
  never a task failure.

Factory-nested (:func:`_stdlib_gif_codec`) so cloudpickle ships the
codec BY VALUE into mapInPandas closures, like every codec here.
"""

from __future__ import annotations

#: GIF magic prefix (87a / 89a share it) — the sniff for the stdlib path.
GIF_MAGIC = b"GIF8"

#: Interlace pass layout: (first row, step) per pass.
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _stdlib_gif_codec():
    """Build the self-contained GIF codec namespace.

    Returns ``(gif_size, gif_decode, gif_encode)``:

    - ``gif_size(b) -> (w, h)`` — logical screen descriptor;
    - ``gif_decode(b) -> (w, h, channels, pixels)`` — first frame;
      channels 3 (RGB) or 4 (RGBA when a transparency index applies);
    - ``gif_encode(w, h, indices, palette) -> bytes`` — GIF87a, one
      frame, ``palette`` a list of (r, g, b).
    """

    def _require_gif(b: bytes, need: int = 13):
        """Magic + a COMPLETE header: int.from_bytes on a short slice
        silently yields garbage dims, so a payload truncated mid-header
        must refuse like any other truncation (round-6 review)."""
        if b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
            raise ValueError("not a GIF payload")
        if len(b) < need:
            raise ValueError("truncated GIF header")

    def gif_size(b: bytes) -> tuple[int, int]:
        _require_gif(b, need=10)
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )

    def _color_table(b: bytes, pos: int, n: int):
        end = pos + 3 * n
        if end > len(b):
            raise ValueError("truncated color table")
        return [tuple(b[i : i + 3]) for i in range(pos, end, 3)], end

    def _subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
        """Concatenate data sub-blocks starting at ``pos``; refuses a
        stream cut off before the 0-length terminator."""
        out = bytearray()
        while True:
            if pos >= len(b):
                raise ValueError("truncated sub-block stream")
            n = b[pos]
            pos += 1
            if n == 0:
                return bytes(out), pos
            if pos + n > len(b):
                raise ValueError("truncated sub-block")
            out += b[pos : pos + n]
            pos += n

    def _lzw_decode(data: bytes, min_code: int, expect: int) -> bytes:
        clear = 1 << min_code
        end = clear + 1
        width = min_code + 1
        dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
        out = bytearray()
        acc = n_bits = 0
        prev: bytes | None = None
        for byte in data:
            acc |= byte << n_bits  # LSB-first packing
            n_bits += 8
            while n_bits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                n_bits -= width
                if code == clear:
                    dictionary = dictionary[: clear + 2]
                    width = min_code + 1
                    prev = None
                    continue
                if code == end:
                    return bytes(out[:expect])
                if prev is None:
                    if code >= len(dictionary):
                        raise ValueError("corrupt LZW code")
                    entry = dictionary[code]
                elif code < len(dictionary):
                    entry = dictionary[code]
                    dictionary.append(prev + entry[:1])
                elif code == len(dictionary):
                    entry = prev + prev[:1]  # the KwKwK case
                    dictionary.append(entry)
                else:
                    raise ValueError("corrupt LZW code")
                out += entry
                prev = entry
                if len(dictionary) >= (1 << width) and width < 12:
                    width += 1
                if len(out) >= expect:
                    return bytes(out[:expect])
        if len(out) < expect:
            raise ValueError("LZW stream ended short of the frame")
        return bytes(out[:expect])

    def gif_decode(b: bytes) -> tuple[int, int, int, bytes]:
        _require_gif(b)
        sw = int.from_bytes(b[6:8], "little")
        sh = int.from_bytes(b[8:10], "little")
        # allocation guard (r07 review): 16-bit dims allow 4.3G-pixel
        # claims from a 13-byte header — refuse before canvas allocation
        if sw * sh > (1 << 24):
            raise ValueError("image too large for the stdlib GIF decoder")
        flags = b[10]
        pos = 13
        gct = None
        if flags & 0x80:
            gct, pos = _color_table(b, pos, 2 << (flags & 0x07))
        transparent = None
        while pos < len(b):
            block = b[pos]
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                if pos + 2 > len(b):
                    raise ValueError("truncated extension introducer")
                label = b[pos + 1]
                if label == 0xF9 and pos + 7 <= len(b) and b[pos + 2] >= 4:
                    packed = b[pos + 3]  # GCE
                    if packed & 0x01:
                        transparent = b[pos + 6]
                _, pos = _subblocks(b, pos + 2)
                continue
            if block != 0x2C:  # image descriptor
                raise ValueError(f"unexpected GIF block 0x{block:02x}")
            if pos + 11 > len(b):
                raise ValueError("truncated image descriptor")
            ix = int.from_bytes(b[pos + 1 : pos + 3], "little")
            iy = int.from_bytes(b[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(b[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(b[pos + 7 : pos + 9], "little")
            iflags = b[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                table, pos = _color_table(b, pos, 2 << (iflags & 0x07))
            if table is None:
                raise ValueError("no color table")
            if pos >= len(b):  # cut right after a local color table
                raise ValueError("truncated before LZW data")
            min_code = b[pos]
            data, pos = _subblocks(b, pos + 1)
            idx = _lzw_decode(data, min_code, iw * ih)
            if iflags & 0x40:  # interlaced: reorder rows
                rows = [idx[r * iw : (r + 1) * iw] for r in range(ih)]
                ordered: list[bytes | None] = [None] * ih
                src = 0
                for first, step in _INTERLACE:
                    for r in range(first, ih, step):
                        ordered[r] = rows[src]
                        src += 1
                idx = b"".join(ordered)  # type: ignore[arg-type]
            ch = 4 if transparent is not None else 3
            black = (0, 0, 0)
            lut = [
                bytes(table[v]) if v < len(table) else bytes(black)
                for v in range(256)
            ]
            if ch == 3 and (ix, iy, iw, ih) == (0, 0, sw, sh):
                # dominant case (full-frame, opaque): one palette-LUT
                # join instead of a per-pixel Python loop + allocation
                return sw, sh, 3, b"".join(lut[v] for v in idx)
            # composite onto the logical screen: uncovered area takes the
            # header's BACKGROUND color index (b[11]) — zero-filling gave
            # black borders regardless of palette (round-6 review). The
            # background index refers to the GLOBAL color table per the
            # spec (GIF89a §18); looking it up in a frame's LOCAL table
            # painted the wrong color when both tables exist (r06 advice).
            bg = gct[b[11]] if gct is not None and b[11] < len(gct) else black
            if ch == 3:
                out = bytearray(bytes(bg) * (sw * sh))
            else:
                out = bytearray((bytes(bg) + b"\xff") * (sw * sh))
            for y in range(min(ih, sh - iy)):
                base = idx[y * iw : y * iw + min(iw, sw - ix)]
                o0 = ((iy + y) * sw + ix) * ch
                for x, v in enumerate(base):
                    o = o0 + x * ch
                    out[o : o + 3] = lut[v]
                    if ch == 4:
                        out[o + 3] = 0 if v == transparent else 255
            return sw, sh, ch, bytes(out)
        raise ValueError("no image descriptor before trailer")

    def gif_encode(
        w: int,
        h: int,
        indices: bytes,
        palette: list[tuple[int, int, int]],
    ) -> bytes:
        if len(indices) != w * h:
            raise ValueError("index buffer size mismatch")
        n = len(palette)
        if n > 256:
            raise ValueError("GIF palettes hold at most 256 colors")
        bits = max(2, (max(n - 1, 1)).bit_length())
        size = 1 << bits
        if any(v >= size for v in indices):
            raise ValueError("index out of palette range")
        out = bytearray(b"GIF87a")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present, 2^bits
        for i in range(size):
            out += bytes(palette[i]) if i < n else b"\x00\x00\x00"
        out += b"\x2c" + b"\x00" * 4
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += b"\x00"  # no LCT, sequential
        min_code = bits
        clear = 1 << min_code
        width = min_code + 1
        # degenerate LZW: CLEAR before every literal so width never grows
        acc = n_bits = 0
        stream = bytearray()

        def put(code: int):
            nonlocal acc, n_bits
            acc |= code << n_bits
            n_bits += width
            while n_bits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                n_bits -= 8

        put(clear)
        for v in indices:
            put(v)
            put(clear)
        put(clear + 1)  # end
        if n_bits:
            stream.append(acc & 0xFF)
        out += bytes([min_code])
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00\x3b"
        return bytes(out)

    return gif_size, gif_decode, gif_encode
