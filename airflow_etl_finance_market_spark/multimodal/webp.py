"""Pure-stdlib WebP codec (lossless VP8L) — the fourth REAL image format.

Closes the r06 verdict's WebP seam the same way GIF/JPEG closed theirs:
a media crawl contains WebP, the container has no Pillow, so the same
factory-nested self-contained pattern provides a REAL decode path — a
complete VP8L lossless decoder per the public "WebP Lossless Bitstream
Specification": LSB-first bit reading, simple and normal prefix codes
(19-symbol code-length code, repeat symbols 16/17/18, the max_symbol
early-out), optional color cache, meta prefix groups (the huffman
image), LZ77 backward references with the 120-entry 2-D distance map,
and all four transforms inverted in reverse read order (predictor
modes 0-13 including Select and the clamped add/subtract pair, color
transform with signed 3.5 fixed-point deltas, subtract-green, and
color-indexing with sub-byte pixel bundling).

Scope and honesty boundary:

- **Decode**: VP8L (lossless) streams, including inside a VP8X
  extended container. Lossy VP8 payloads parse for SIZE (the frame
  header needs no entropy decode) but raise NotImplementedError on
  pixel decode — the boolean arithmetic decoder + loop filter is a
  genuinely different codec; at the frame level those payloads
  QUARANTINE per the module posture in ``binary.py``. Truncated
  streams REFUSE (ValueError), never fabricate pixels.
- **Encode**: valid literals-only VP8L (no transforms, no LZ77, no
  color cache, one prefix group) with per-channel canonical Huffman
  codes built from the image histogram (depth-limited, with a
  balanced complete-code fallback) and transmitted via the normal
  code-length-code path + max_symbol. Any spec-compliant decoder
  reads the codes from the stream; coding efficiency is not the
  point — fixtures and re-encode plumbing are.

Everything is nested inside :func:`_stdlib_webp_codec` so cloudpickle
ships the whole codec BY VALUE into mapInPandas closures (Spark's
Python workers unpickle without this repo on sys.path). Pure Python —
fine for tests and small media tiers; a Pillow deployment takes the C
path through the same call-time seam in ``binary.py``.
"""

from __future__ import annotations

#: RIFF magic; a WebP payload is RIFF + size + 'WEBP'.
WEBP_RIFF_MAGIC = b"RIFF"

#: Code-length-code symbol transmission order (spec 5.2.2).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: 2-D distance map for LZ77 distance codes 1..120 (spec 4.2.2): each
#: byte packs (y << 4) | (8 - x); dist = y * width + x, min 1.
_DIST_MAP = bytes([
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
])


def _stdlib_webp_codec():
    """Build the self-contained WebP (VP8L) codec namespace.

    Returns ``(webp_size, webp_decode, webp_encode)``:

    - ``webp_size(b) -> (w, h)`` — VP8L header / VP8X canvas / lossy
      VP8 frame header (size needs no entropy decode on any of them);
    - ``webp_decode(b) -> (w, h, channels, pixels)`` — channels 3
      (RGB) or 4 (RGBA when any alpha < 255), row-major bytes;
    - ``webp_encode(w, h, channels, pixels) -> bytes`` — channels
      1 (gray), 3, or 4; lossless pixel VALUES, with the decoder's
      channel-collapse rule: decode returns 4 channels only when some
      alpha < 255, so all-opaque RGBA input round-trips as RGB (and
      gray as RGB with r=g=b) rather than shape-identically.
    """
    import heapq

    clc_order = list(_CLC_ORDER)
    dist_map = bytes(_DIST_MAP)

    # -- container ----------------------------------------------------------
    def _find_chunk(b: bytes):
        """Return (fourcc, payload) of the first VP8L/VP8 chunk, walking
        through VP8X if present. Truncated chunks REFUSE."""
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
            raise ValueError("not a WebP payload")
        riff_len = int.from_bytes(b[4:8], "little")
        end = min(8 + riff_len, len(b))
        pos = 12
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            ln = int.from_bytes(b[pos + 4 : pos + 8], "little")
            payload = b[pos + 8 : pos + 8 + ln]
            if len(payload) != ln:
                raise ValueError("truncated WebP chunk")
            if fourcc in (b"VP8L", b"VP8 ", b"VP8X"):
                if fourcc == b"VP8X":
                    # canvas dims live here; pixel chunk follows
                    pos += 8 + ln + (ln & 1)
                    continue
                return fourcc, payload
            pos += 8 + ln + (ln & 1)  # chunks are even-padded
        raise ValueError("no VP8L/VP8 chunk found")

    def webp_size(b: bytes) -> tuple[int, int]:
        if len(b) >= 30 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            if b[12:16] == b"VP8X" and len(b) >= 30:
                w = int.from_bytes(b[24:27], "little") + 1
                h = int.from_bytes(b[27:30], "little") + 1
                return w, h
        fourcc, p = _find_chunk(b)
        if fourcc == b"VP8L":
            if len(p) < 5 or p[0] != 0x2F:
                raise ValueError("bad VP8L header")
            v = int.from_bytes(p[1:5], "little")
            return (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1
        # lossy VP8: key-frame start code then 14-bit dims
        if len(p) < 10 or p[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 frame header")
        w = int.from_bytes(p[6:8], "little") & 0x3FFF
        h = int.from_bytes(p[8:10], "little") & 0x3FFF
        return w, h

    # -- bit I/O (LSB-first, per spec) --------------------------------------
    class _BitReader:
        def __init__(self, b: bytes):
            self.b, self.pos, self.bit = b, 0, 0

        def read(self, n: int) -> int:
            v = 0
            b, pos, bit = self.b, self.pos, self.bit
            for i in range(n):
                if pos >= len(b):
                    raise ValueError("truncated VP8L bitstream")
                v |= ((b[pos] >> bit) & 1) << i
                bit += 1
                if bit == 8:
                    bit = 0
                    pos += 1
            self.pos, self.bit = pos, bit
            return v

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc, self.n = 0, 0

        def write(self, v: int, n: int) -> None:  # LSB-first
            self.acc |= (v & ((1 << n) - 1)) << self.n
            self.n += n
            while self.n >= 8:
                self.out.append(self.acc & 0xFF)
                self.acc >>= 8
                self.n -= 8

        def write_code(self, code: int, ln: int) -> None:
            # prefix-code bits go MSB-of-code first (tree root first)
            for i in range(ln - 1, -1, -1):
                self.write((code >> i) & 1, 1)

        def flush(self) -> None:
            if self.n:
                self.out.append(self.acc & 0xFF)
                self.acc, self.n = 0, 0

    # -- prefix codes --------------------------------------------------------
    def _canonical(lengths: list[int]):
        """Canonical prefix-code decode table from per-symbol lengths:
        {"single": sym} for a 0-bit code, else {"table": {(len, code):
        sym}} with codes assigned in (length, symbol) order."""
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            return {"single": nz[0][1]}
        # Kraft check: an over- or under-subscribed code means a corrupt
        # stream — fail loudly rather than decode garbage pixels
        if sum(1 << (15 - ln) for ln, _ in nz) != 1 << 15:
            raise ValueError("invalid (incomplete) prefix code")
        table = {}
        code = 0
        nz.sort()
        prev_len = nz[0][0]
        for ln, s in nz:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = s
            code += 1
        return {"table": table}

    def _read_sym(br, code) -> int:
        single = code.get("single")
        if single is not None:
            return single
        t = code["table"]
        c = 0
        for ln in range(1, 16):
            c = (c << 1) | br.read(1)
            s = t.get((ln, c))
            if s is not None:
                return s
        raise ValueError("invalid VP8L prefix code")

    def _read_code(br, alphabet_size: int):
        """One prefix code: simple (1-2 explicit symbols) or normal
        (lengths via the 19-symbol code-length code)."""
        if br.read(1):  # simple
            num_symbols = br.read(1) + 1
            sym0 = br.read(8) if br.read(1) else br.read(1)
            if sym0 >= alphabet_size:
                raise ValueError("prefix symbol out of range")
            if num_symbols == 1:
                return {"single": sym0}
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("prefix symbol out of range")
            # explicit order: first listed symbol takes code 0
            return {"table": {(1, 0): sym0, (1, 1): sym1}}
        num_clc = 4 + br.read(4)
        clc_len = [0] * 19
        for i in range(num_clc):
            clc_len[clc_order[i]] = br.read(3)
        clc = _canonical(clc_len)
        if br.read(1):
            length_nbits = 2 + 2 * br.read(3)
            max_symbol = 2 + br.read(length_nbits)
        else:
            max_symbol = alphabet_size
        lengths = [0] * alphabet_size
        prev = 8
        i = 0
        while i < alphabet_size:
            if max_symbol == 0:
                break
            max_symbol -= 1
            s = _read_sym(br, clc)
            if s < 16:
                lengths[i] = s
                i += 1
                if s:
                    prev = s
            elif s == 16:
                rep = 3 + br.read(2)
                for _ in range(rep):
                    if i < alphabet_size:
                        lengths[i] = prev
                        i += 1
            elif s == 17:
                i += 3 + br.read(3)
            else:
                i += 11 + br.read(7)
        return _canonical(lengths)

    def _lz77_value(br, code: int) -> int:
        if code < 4:
            return code + 1
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        return offset + br.read(extra) + 1

    # -- entropy-coded image (shared by main + sub-images) -------------------
    def _decode_pixels(br, w: int, h: int, level0: bool) -> list[int]:
        """ARGB ints (a<<24|r<<16|g<<8|b), row-major, length w*h."""
        cache_bits = br.read(4) if br.read(1) else 0
        if cache_bits > 11:
            raise ValueError("bad color-cache size")
        cache_size = (1 << cache_bits) if cache_bits else 0
        meta = None
        mw = meta_bits = 0
        group_count = 1
        if level0 and br.read(1):
            meta_bits = br.read(3) + 2
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            meta_img = _decode_pixels(br, mw, mh, False)
            meta = [(p >> 8) & 0xFFFF for p in meta_img]
            group_count = max(meta) + 1
        sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
        groups = [[_read_code(br, s) for s in sizes] for _ in range(group_count)]
        cache = [0] * cache_size
        out = [0] * (w * h)
        pos = 0
        n = w * h
        g = groups[0]
        while pos < n:
            if meta is not None:
                y, x = divmod(pos, w)
                g = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
            s = _read_sym(br, g[0])
            if s < 256:
                r = _read_sym(br, g[1])
                bch = _read_sym(br, g[2])
                a = _read_sym(br, g[3])
                px = (a << 24) | (r << 16) | (s << 8) | bch
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            elif s < 256 + 24:
                length = _lz77_value(br, s - 256)
                dist_code = _lz77_value(br, _read_sym(br, g[4]))
                if dist_code > 120:
                    dist = dist_code - 120
                else:
                    v = dist_map[dist_code - 1]
                    dist = (v >> 4) * w + (8 - (v & 0xF))
                    if dist < 1:
                        dist = 1
                if dist > pos or pos + length > n:
                    raise ValueError("bad VP8L backward reference")
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    pos += 1
                    if cache_bits:
                        cache[
                            ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                        ] = px
            else:
                if not cache_bits:
                    raise ValueError("cache reference without color cache")
                out[pos] = cache[s - 256 - 24]
                pos += 1
        return out

    # -- inverse transforms ---------------------------------------------------
    def _avg2(a: int, b: int) -> int:
        return (
            ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
            | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
            | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
            | ((((a & 0xFF) + (b & 0xFF)) >> 1))
        )

    def _add_px(p: int, q: int) -> int:  # per-channel add mod 256
        return (
            (((p >> 24) + (q >> 24)) & 0xFF) << 24
            | ((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF)) & 0xFF) << 16
            | ((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF)) & 0xFF) << 8
            | (((p & 0xFF) + (q & 0xFF)) & 0xFF)
        )

    def _select(left: int, top: int, topleft: int) -> int:
        # |pred - L| = |T - TL| and |pred - T| = |L - TL| per channel
        p_l = sum(
            abs(((top >> s) & 0xFF) - ((topleft >> s) & 0xFF))
            for s in (24, 16, 8, 0)
        )
        p_t = sum(
            abs(((left >> s) & 0xFF) - ((topleft >> s) & 0xFF))
            for s in (24, 16, 8, 0)
        )
        return left if p_l < p_t else top

    def _clamp_add_full(l_: int, t: int, tl: int) -> int:
        px = 0
        for s in (24, 16, 8, 0):
            v = ((l_ >> s) & 0xFF) + ((t >> s) & 0xFF) - ((tl >> s) & 0xFF)
            px |= (0 if v < 0 else (255 if v > 255 else v)) << s
        return px

    def _clamp_add_half(l_: int, t: int, tl: int) -> int:
        avg = _avg2(l_, t)
        px = 0
        for s in (24, 16, 8, 0):
            a = (avg >> s) & 0xFF
            v = a + int((a - ((tl >> s) & 0xFF)) / 2)  # trunc toward 0
            px |= (0 if v < 0 else (255 if v > 255 else v)) << s
        return px

    def _inv_predictor(img: list[int], w: int, h: int, bits: int, sub: list[int]):
        tw = -(-w // (1 << bits))
        for pos in range(w * h):
            y, x = divmod(pos, w)
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = img[pos - 1]
            elif x == 0:
                pred = img[pos - w]
            else:
                mode = (sub[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                l_ = img[pos - 1]
                t = img[pos - w]
                tl = img[pos - w - 1]
                tr = img[pos - w + 1]  # x == w-1 wraps to row start (spec)
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l_
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l_, tr), t)
                elif mode == 6:
                    pred = _avg2(l_, tl)
                elif mode == 7:
                    pred = _avg2(l_, t)
                elif mode == 8:
                    pred = _avg2(tl, t)
                elif mode == 9:
                    pred = _avg2(t, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(l_, tl), _avg2(t, tr))
                elif mode == 11:
                    pred = _select(l_, t, tl)
                elif mode == 12:
                    pred = _clamp_add_full(l_, t, tl)
                elif mode == 13:
                    pred = _clamp_add_half(l_, t, tl)
                else:
                    raise ValueError("bad predictor mode")
            img[pos] = _add_px(img[pos], pred)

    def _inv_color(img: list[int], w: int, h: int, bits: int, sub: list[int]):
        tw = -(-w // (1 << bits))

        def s8(v: int) -> int:
            return v - 256 if v >= 128 else v

        for pos in range(w * h):
            y, x = divmod(pos, w)
            cte = sub[(y >> bits) * tw + (x >> bits)]
            g2r = s8(cte & 0xFF)
            g2b = s8((cte >> 8) & 0xFF)
            r2b = s8((cte >> 16) & 0xFF)
            px = img[pos]
            g = s8((px >> 8) & 0xFF)
            r = ((px >> 16) & 0xFF) + ((g2r * g) >> 5)
            r &= 0xFF
            b = (px & 0xFF) + ((g2b * g) >> 5) + ((r2b * s8(r)) >> 5)
            img[pos] = (px & 0xFF00FF00) | (r << 16) | (b & 0xFF)

    def webp_decode(b: bytes) -> tuple[int, int, int, bytes]:
        fourcc, p = _find_chunk(b)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 decoding (boolean arithmetic coder) is not "
                "supported by the stdlib codec"
            )
        if len(p) < 5 or p[0] != 0x2F:
            raise ValueError("bad VP8L header")
        br = _BitReader(p)
        if br.read(8) != 0x2F:
            raise ValueError("bad VP8L signature")
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha hint
        if br.read(3) != 0:
            raise ValueError("unsupported VP8L version")
        # allocation guard (r07 review): header dims are unvalidated;
        # refuse before building w*h Python-int pixel lists
        if w * h > (1 << 24):
            raise ValueError("image too large for the stdlib VP8L decoder")
        # transforms capture the dims current at their read point;
        # color-indexing shrinks the entropy width for everything after
        transforms = []
        cur_w = w
        while br.read(1):
            t = br.read(2)
            if any(tt[0] == t for tt in transforms):
                raise ValueError("duplicate VP8L transform")
            if t in (0, 1):  # predictor / color
                size_bits = br.read(3) + 2
                bw = -(-cur_w // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub = _decode_pixels(br, bw, bh, False)
                transforms.append((t, size_bits, sub, cur_w))
            elif t == 2:  # subtract green
                transforms.append((2, 0, None, cur_w))
            else:  # color indexing
                pal_size = br.read(8) + 1
                pal_deltas = _decode_pixels(br, pal_size, 1, False)
                pal = []
                prev = 0
                for d in pal_deltas:
                    prev = _add_px(prev, d)
                    pal.append(prev)
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal, cur_w))
                cur_w = -(-cur_w // (1 << width_bits))
        img = _decode_pixels(br, cur_w, h, True)
        for t, bits, data, t_w in reversed(transforms):
            if t == 3:
                if bits:
                    # unbundle sub-byte indices from the green channel
                    per = 1 << bits
                    ibits = 8 >> bits
                    mask = (1 << ibits) - 1
                    packed_w = -(-t_w // per)
                    wide = [0] * (t_w * h)
                    for y in range(h):
                        for x in range(t_w):
                            gp = (img[y * packed_w + x // per] >> 8) & 0xFF
                            wide[y * t_w + x] = (gp >> (ibits * (x % per))) & mask
                    idx = wide
                else:
                    idx = [(px >> 8) & 0xFF for px in img]
                pal = data
                img = [
                    pal[i] if i < len(pal) else 0 for i in idx
                ]
                cur_w = t_w
            elif t == 2:
                for pos in range(len(img)):
                    px = img[pos]
                    g = (px >> 8) & 0xFF
                    r = (((px >> 16) & 0xFF) + g) & 0xFF
                    bl = ((px & 0xFF) + g) & 0xFF
                    img[pos] = (px & 0xFF00FF00) | (r << 16) | bl
            elif t == 1:
                _inv_color(img, t_w, h, bits, data)
            else:
                _inv_predictor(img, t_w, h, bits, data)
        has_alpha = any((px >> 24) != 0xFF for px in img)
        ch = 4 if has_alpha else 3
        out = bytearray(w * h * ch)
        for pos, px in enumerate(img):
            o = pos * ch
            out[o] = (px >> 16) & 0xFF
            out[o + 1] = (px >> 8) & 0xFF
            out[o + 2] = px & 0xFF
            if ch == 4:
                out[o + 3] = (px >> 24) & 0xFF
        return w, h, ch, bytes(out)

    # -- encoder --------------------------------------------------------------
    def _huffman_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
        """Depth-limited canonical Huffman lengths for the used symbols;
        falls back to a balanced COMPLETE code if Huffman exceeds the
        limit (Kraft sum must be exactly 1 — VP8L decoders may reject
        incomplete codes)."""
        syms = sorted(freqs)
        if len(syms) == 1:
            return {syms[0]: 0}
        if len(syms) == 2:
            return {s: 1 for s in syms}
        heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
        heapq.heapify(heap)
        depth = dict.fromkeys(syms, 0)
        tie = len(heap)
        while len(heap) > 1:
            fa, _, sa = heapq.heappop(heap)
            fb, _, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, tie, sa + sb))
            tie += 1
        if max(depth.values()) <= limit:
            return depth
        # balanced complete code: k symbols at L-1, rest at L
        n = len(syms)
        big = max(1, (n - 1).bit_length())
        k = (1 << big) - n
        return {
            s: (big - 1 if i < k else big) for i, s in enumerate(syms)
        }

    def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
        """symbol -> (code, len), canonical (length, symbol) order."""
        out = {}
        code = 0
        prev = 0
        for ln, s in sorted((ln, s) for s, ln in lengths.items() if ln > 0):
            code <<= ln - prev
            prev = ln
            out[s] = (code, ln)
            code += 1
        return out

    def _write_code(bw, lengths: dict[int, int], alphabet_size: int) -> None:
        """Transmit one prefix code: simple form for <=2 symbols, else the
        normal code-length-code path with max_symbol."""
        syms = sorted(lengths)
        if len(syms) <= 2 and max(syms) <= 255:
            bw.write(1, 1)  # simple
            bw.write(len(syms) - 1, 1)
            if syms[0] > 1:
                bw.write(1, 1)
                bw.write(syms[0], 8)
            else:
                bw.write(0, 1)
                bw.write(syms[0], 1)
            if len(syms) == 2:
                bw.write(syms[1], 8)
            return
        bw.write(0, 1)  # normal
        max_sym = max(syms) + 1
        lens = [lengths.get(s, 0) for s in range(max_sym)]
        # code-length code over the used length values (balanced complete)
        clc_freq: dict[int, int] = {}
        for ln in lens:
            clc_freq[ln] = clc_freq.get(ln, 0) + 1
        clc_lengths = _huffman_lengths(clc_freq, 7)
        # fix degenerate single-value case: a 0-length CLC code cannot be
        # expressed (3-bit lengths, all-zero means unused) — pad with a
        # dummy second symbol so both get length 1
        if len(clc_lengths) == 1:
            only = next(iter(clc_lengths))
            dummy = 0 if only != 0 else 1
            clc_lengths = {only: 1, dummy: 1}
        bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19
        for sym in clc_order:
            bw.write(clc_lengths.get(sym, 0), 3)
        clc_codes = _canonical_codes(clc_lengths)
        # max_symbol: length_nbits = 2 + 2*ReadBits(3)
        nbits = 2
        while (1 << nbits) < max_sym - 2 + 1:
            nbits += 2
        if max_sym >= 2 and nbits <= 16:
            bw.write(1, 1)
            bw.write((nbits - 2) // 2, 3)
            bw.write(max_sym - 2, nbits)
            n_transmit = max_sym
        else:
            bw.write(0, 1)
            n_transmit = alphabet_size
        for i in range(n_transmit):
            ln = lens[i] if i < len(lens) else 0
            code, cl = clc_codes[ln]
            bw.write_code(code, cl)

    def webp_encode(w: int, h: int, channels: int, pixels: bytes) -> bytes:
        if channels not in (1, 3, 4):
            raise ValueError("webp_encode supports 1, 3, or 4 channels")
        if len(pixels) != w * h * channels:
            raise ValueError("pixel buffer size mismatch")
        if not (1 <= w <= 16384 and 1 <= h <= 16384):
            raise ValueError("dimensions out of VP8L range")
        argb = []
        for i in range(w * h):
            o = i * channels
            if channels == 1:
                r = g = bl = pixels[o]
                a = 255
            else:
                r, g, bl = pixels[o], pixels[o + 1], pixels[o + 2]
                a = pixels[o + 3] if channels == 4 else 255
            argb.append((a << 24) | (r << 16) | (g << 8) | bl)
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(1 if channels == 4 else 0, 1)
        bw.write(0, 3)  # version
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta prefix codes
        hists = [
            {},  # green (alphabet 280)
            {},  # red
            {},  # blue
            {},  # alpha
        ]
        for px in argb:
            for hi, sh in ((0, 8), (1, 16), (2, 0), (3, 24)):
                v = (px >> sh) & 0xFF
                hists[hi][v] = hists[hi].get(v, 0) + 1
        codes = []
        for hi, alpha_size in ((0, 256 + 24), (1, 256), (2, 256), (3, 256)):
            lengths = _huffman_lengths(hists[hi], 15)
            _write_code(bw, lengths, alpha_size)
            codes.append(_canonical_codes(lengths))
        # distance code: unused single-symbol (0 bits per read)
        _write_code(bw, {0: 0}, 40)
        for px in argb:
            for ci, sh in ((0, 8), (1, 16), (2, 0), (3, 24)):
                # a single-symbol (0-length) code emits no bits at all
                entry = codes[ci].get((px >> sh) & 0xFF)
                if entry is not None:
                    bw.write_code(*entry)
        bw.flush()
        payload = bytes(bw.out)
        padded = payload + (b"\x00" if len(payload) & 1 else b"")
        chunk = b"VP8L" + len(payload).to_bytes(4, "little") + padded
        riff_len = 4 + len(chunk)
        return b"RIFF" + riff_len.to_bytes(4, "little") + b"WEBP" + chunk

    return webp_size, webp_decode, webp_encode
