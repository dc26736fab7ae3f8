"""Pure-stdlib baseline JPEG codec (SOF0) — the second REAL image format.

Closes the r05 verdict's remaining codec seam: a media crawl is mostly
JPEG, and the container has no Pillow, so the same factory-nested
self-contained pattern as :func:`..binary._stdlib_png_codec` provides a
REAL decode path — full Huffman entropy decode, dequantize, IDCT,
chroma upsample, YCbCr→RGB — not a header sniff.

Scope and honesty boundary:

- **Decode**: baseline sequential DCT (SOF0), 8-bit, 1 component
  (grayscale) or 3 components (YCbCr, any h/v sampling factors incl.
  4:2:0 / 4:2:2 — nearest-neighbor chroma upsample), restart markers,
  tables read from the stream's own DQT/DHT segments — so JPEGs from
  real encoders decode, not just our own. Progressive (SOF2),
  arithmetic coding, 12-bit, and hierarchical modes raise
  NotImplementedError — at the frame level those payloads QUARANTINE
  (row dropped), per the module posture in ``binary.py``.
- **Encode**: baseline, 4:4:4, quality-scaled Annex-K quantization
  matrices, and deliberately SIMPLE custom Huffman tables (all 12 DC
  categories at one code length; all 256 AC run/size symbols at 9
  bits) emitted in the DHT segments. Any spec-compliant decoder reads
  tables from the stream, so validity — not coding efficiency — is
  what matters for an encoder whose job is test fixtures and
  re-encode plumbing; transcribing the 162-entry Annex-K AC lists by
  hand would only add an error surface.

Everything is nested inside :func:`_stdlib_jpeg_codec` so cloudpickle
ships the whole codec BY VALUE into mapInPandas closures (Spark's
Python workers unpickle without this repo on sys.path). Pure Python —
fine for tests and small media tiers; a Pillow deployment takes the
C path through the same call-time seam in ``binary.py``.
"""

from __future__ import annotations

#: JPEG SOI marker — the sniff byte pair.
JPEG_MAGIC = b"\xff\xd8"

#: Annex K.1 luminance quantization matrix (natural row-major order).
_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.2 chrominance quantization matrix.
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Zigzag scan order: _ZIGZAG[k] = natural index of the k-th coefficient.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _stdlib_jpeg_codec():
    """Build the self-contained baseline JPEG codec namespace.

    Returns ``(jpeg_size, jpeg_decode, jpeg_encode)``:

    - ``jpeg_size(b) -> (w, h)`` — marker walk to any SOF frame header
      (works on progressive too; size needs no entropy decode);
    - ``jpeg_decode(b) -> (w, h, channels, pixels)`` — channels 1
      (grayscale) or 3 (RGB), row-major bytes;
    - ``jpeg_encode(w, h, channels, pixels, quality=85) -> bytes``.
    """
    import math
    import struct

    zigzag = list(_ZIGZAG)
    q_luma = list(_QUANT_LUMA)
    q_chroma = list(_QUANT_CHROMA)
    # Separable IDCT/FDCT basis: C[u] * cos((2x+1)uπ/16), 8×8 floats.
    _cos = [
        [
            (math.sqrt(0.5) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for u in range(8)
        ]
        for x in range(8)
    ]

    # -- shared frame walk -------------------------------------------------
    _SOF_MARKERS = {
        0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
    }

    def _segments(b: bytes):
        """Yield (marker, payload, payload_start) for every segment until
        SOS or EOI; raises on a malformed stream."""
        if b[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload")
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                raise ValueError("marker expected")
            marker = b[pos + 1]
            if marker == 0xD9:  # EOI
                return
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM
                pos += 2
                continue
            ln = int.from_bytes(b[pos + 2 : pos + 4], "big")
            payload = b[pos + 4 : pos + 2 + ln]
            yield marker, payload, pos + 4
            pos += 2 + ln
            if marker == 0xDA:  # SOS: entropy data follows
                return
        raise ValueError("truncated JPEG stream")

    def jpeg_size(b: bytes) -> tuple[int, int]:
        for marker, payload, _ in _segments(b):
            if marker in _SOF_MARKERS:
                h = int.from_bytes(payload[1:3], "big")
                w = int.from_bytes(payload[3:5], "big")
                return w, h
        raise ValueError("no SOF frame header found")

    # -- Huffman -----------------------------------------------------------
    def _build_huffman(bits: list[int], vals: bytes) -> dict:
        """(length, code) -> symbol, canonical JPEG assignment."""
        table, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                table[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        return table

    class _BitReader:
        """MSB-first reader over entropy-coded data with FF00 unstuffing;
        stops at any non-stuffing marker (RSTn handled by the caller)."""

        def __init__(self, b: bytes, pos: int):
            self.b, self.pos, self.acc, self.n = b, pos, 0, 0

        def _fill(self):
            b = self.b
            while self.n <= 24:
                if self.pos >= len(b):
                    self.acc = (self.acc << 8) | 0xFF  # pad past end
                    self.n += 8
                    continue
                byte = b[self.pos]
                if byte == 0xFF:
                    nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2
                    elif 0xD0 <= nxt <= 0xD7:
                        break  # restart marker: caller realigns
                    else:
                        break  # EOI / next segment
                else:
                    self.pos += 1
                self.acc = (self.acc << 8) | byte
                self.n += 8

        def bits(self, k: int) -> int:
            if k == 0:
                return 0
            self._fill()
            if self.n < k:
                # _fill stops at a marker; a truncated/corrupt entropy
                # stream can leave fewer buffered bits than requested —
                # raise the documented truncation error instead of a
                # bare negative-shift ValueError (r06 advice)
                raise ValueError("truncated JPEG entropy data")
            v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
            self.n -= k
            self.acc &= (1 << self.n) - 1
            return v

        def huff(self, table: dict) -> int:
            code = 0
            for ln in range(1, 17):
                code = (code << 1) | self.bits(1)
                sym = table.get((ln, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code")

        def restart(self):
            """Skip to just past the next RSTn marker, byte-aligned."""
            self.acc, self.n = 0, 0
            b = self.b
            while self.pos + 1 < len(b):
                if b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return
                self.pos += 1
            raise ValueError("expected restart marker")

    def _extend(v: int, t: int) -> int:
        return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

    def _idct_block(coef: list[float]) -> list[int]:
        """64 dequantized coefficients (natural order) -> 64 pixel values."""
        # rows then columns; 0.5 scale factor per 1-D pass
        tmp = [0.0] * 64
        for y in range(8):
            row = coef[y * 8 : y * 8 + 8]
            for x in range(8):
                cx = _cos[x]
                tmp[y * 8 + x] = 0.5 * sum(row[u] * cx[u] for u in range(8))
        out = [0] * 64
        for x in range(8):
            col = [tmp[y * 8 + x] for y in range(8)]
            for y in range(8):
                cy = _cos[y]
                v = 0.5 * sum(col[v_] * cy[v_] for v_ in range(8)) + 128.0
                out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else int(v + 0.5))
        return out

    def jpeg_decode(b: bytes) -> tuple[int, int, int, bytes]:
        qtables: dict[int, list[int]] = {}
        htables: dict[tuple[int, int], dict] = {}
        restart_interval = 0
        frame = None
        scan = None
        data_pos = None
        for marker, payload, start in _segments(b):
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(payload):
                    prec, tid = payload[p] >> 4, payload[p] & 0xF
                    p += 1
                    if prec:
                        raise NotImplementedError("16-bit quant tables")
                    qtables[tid] = list(payload[p : p + 64])
                    p += 64
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(payload):
                    cls, tid = payload[p] >> 4, payload[p] & 0xF
                    bits = list(payload[p + 1 : p + 17])
                    n = sum(bits)
                    vals = payload[p + 17 : p + 17 + n]
                    htables[(cls, tid)] = _build_huffman(bits, vals)
                    p += 17 + n
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(payload[:2], "big")
            elif marker in _SOF_MARKERS:
                if marker != 0xC0 and marker != 0xC1:
                    raise NotImplementedError(
                        f"JPEG mode 0x{marker:02x} (progressive/arithmetic/"
                        "lossless) not supported by the stdlib codec"
                    )
                prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
                if prec != 8:
                    raise NotImplementedError("only 8-bit JPEG supported")
                comps = []
                for i in range(nc):
                    cid, samp, qid = payload[6 + 3 * i : 9 + 3 * i]
                    comps.append(
                        {"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid}
                    )
                frame = (w, h, comps)
            elif marker == 0xDA:  # SOS
                ns = payload[0]
                sel = {}
                for i in range(ns):
                    cid, tids = payload[1 + 2 * i], payload[2 + 2 * i]
                    sel[cid] = (tids >> 4, tids & 0xF)
                scan = sel
                data_pos = start + len(payload)
        if frame is None or scan is None:
            raise ValueError("missing SOF/SOS")
        w, h, comps = frame
        if len(comps) not in (1, 3):
            raise NotImplementedError("only 1- or 3-component JPEG supported")
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        planes = []
        for c in comps:
            c["bw"] = mcux * c["h"]  # blocks across
            c["bh"] = mcuy * c["v"]
            planes.append(bytearray(c["bw"] * 8 * c["bh"] * 8))
        rd = _BitReader(b, data_pos)
        pred = [0] * len(comps)
        mcu_done = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_done and (
                    mcu_done % restart_interval == 0
                ):
                    rd.restart()
                    pred = [0] * len(comps)
                for ci, c in enumerate(comps):
                    dc_t = htables[(0, scan[c["id"]][0])]
                    ac_t = htables[(1, scan[c["id"]][1])]
                    qt = qtables[c["q"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            t = rd.huff(dc_t)
                            diff = _extend(rd.bits(t), t)
                            pred[ci] += diff
                            coef = [0.0] * 64
                            coef[0] = pred[ci] * qt[0]
                            k = 1
                            while k < 64:
                                rs = rd.huff(ac_t)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC index overflow")
                                coef[zigzag[k]] = (
                                    _extend(rd.bits(s), s) * qt[k]
                                )
                                k += 1
                            px = _idct_block(coef)
                            plane = planes[ci]
                            row0 = (my * c["v"] + by) * 8
                            col0 = (mx * c["h"] + bx) * 8
                            stride = c["bw"] * 8
                            for yy in range(8):
                                off = (row0 + yy) * stride + col0
                                plane[off : off + 8] = bytes(
                                    px[yy * 8 : yy * 8 + 8]
                                )
                mcu_done += 1
        if len(comps) == 1:
            c = comps[0]
            stride = c["bw"] * 8
            out = bytearray(w * h)
            for y in range(h):
                out[y * w : (y + 1) * w] = planes[0][
                    y * stride : y * stride + w
                ]
            return w, h, 1, bytes(out)
        # upsample chroma (nearest), YCbCr -> RGB
        out = bytearray(w * h * 3)
        strides = [c["bw"] * 8 for c in comps]
        for y in range(h):
            rows = [
                planes[ci][
                    (y * comps[ci]["v"] // vmax) * strides[ci] :
                    (y * comps[ci]["v"] // vmax) * strides[ci] + strides[ci]
                ]
                for ci in range(3)
            ]
            for x in range(w):
                yv = rows[0][x * comps[0]["h"] // hmax]
                cb = rows[1][x * comps[1]["h"] // hmax] - 128
                cr = rows[2][x * comps[2]["h"] // hmax] - 128
                r = yv + 1.402 * cr
                g = yv - 0.344136 * cb - 0.714136 * cr
                bl = yv + 1.772 * cb
                o = (y * w + x) * 3
                out[o] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
                out[o + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
                out[o + 2] = (
                    0 if bl < 0 else (255 if bl > 255 else int(bl + 0.5))
                )
        return w, h, 3, bytes(out)

    # -- encoder -----------------------------------------------------------
    # Simple-but-valid Huffman tables (see module docstring): DC = 12
    # categories at 4 bits (codes 0..11; 1111 unused, so no all-ones
    # code); AC = all 256 run/size symbols split 128 at length 8 +
    # 128 at length 9 (DHT per-length counts are single BYTES, so one
    # length cannot hold all 256; the canonical split keeps every
    # 8-bit code starting with 0 and every 9-bit code with 1 —
    # prefix-free, and the all-ones 9-bit code stays unused).
    _DC_BITS = [0, 0, 0, 12] + [0] * 12
    _DC_VALS = bytes(range(12))
    _AC_BITS = [0] * 7 + [128, 128] + [0] * 7
    _AC_VALS = bytes(range(256))

    def _enc_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
        """symbol -> (code, length), canonical assignment."""
        out, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc, self.n = 0, 0

        def write(self, code: int, ln: int):
            self.acc = (self.acc << ln) | code
            self.n += ln
            while self.n >= 8:
                byte = (self.acc >> (self.n - 8)) & 0xFF
                self.out.append(byte)
                if byte == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.n -= 8
                self.acc &= (1 << self.n) - 1

        def flush(self):
            if self.n:
                pad = 8 - self.n
                self.write((1 << pad) - 1, pad)

    def _category(v: int) -> int:
        return v.bit_length() if v >= 0 else (-v).bit_length()

    def _fdct_block(px: list[int]) -> list[float]:
        tmp = [0.0] * 64
        for y in range(8):
            row = [px[y * 8 + x] - 128 for x in range(8)]
            for u in range(8):
                tmp[y * 8 + u] = 0.5 * sum(
                    row[x] * _cos[x][u] for x in range(8)
                )
        out = [0.0] * 64
        for u in range(8):
            col = [tmp[y * 8 + u] for y in range(8)]
            for v in range(8):
                out[v * 8 + u] = 0.5 * sum(
                    col[y] * _cos[y][v] for y in range(8)
                )
        return out

    def _scaled(base: list[int], quality: int) -> list[int]:
        quality = min(max(quality, 1), 100)
        s = 5000 // quality if quality < 50 else 200 - 2 * quality
        return [min(max((q * s + 50) // 100, 1), 255) for q in base]

    def jpeg_encode(
        w: int, h: int, channels: int, pixels: bytes, quality: int = 85
    ) -> bytes:
        if channels not in (1, 3):
            raise ValueError("jpeg_encode supports 1 or 3 channels")
        if len(pixels) != w * h * channels:
            raise ValueError("pixel buffer size mismatch")
        # DQT bytes are ZIGZAG-ordered per spec (the decoder above reads
        # qt[k] as the step for zigzag position k); the Annex-K matrices
        # are specified in natural 8x8 layout, so they must be permuted
        # through the scan before being used or emitted — writing them
        # natural-order silently applies a zigzag-scrambled matrix
        # (round-6 review finding).
        qy = _scaled(q_luma, quality)
        qc = _scaled(q_chroma, quality)
        qy_z = [qy[zigzag[k]] for k in range(64)]
        qc_z = [qc[zigzag[k]] for k in range(64)]
        # component planes, padded to 8 by edge replication
        pw, ph = -(-w // 8) * 8, -(-h // 8) * 8
        if channels == 1:
            raw = [[pixels[y * w + x] for x in range(w)] for y in range(h)]
            planes = [raw]
        else:
            ys, cbs, crs = [], [], []
            for y in range(h):
                ry, rb, rr = [], [], []
                for x in range(w):
                    o = (y * w + x) * 3
                    r, g, bl = pixels[o], pixels[o + 1], pixels[o + 2]
                    yv = 0.299 * r + 0.587 * g + 0.114 * bl
                    rb.append(
                        min(max(int(-0.168736 * r - 0.331264 * g
                                    + 0.5 * bl + 128 + 0.5), 0), 255)
                    )
                    rr.append(
                        min(max(int(0.5 * r - 0.418688 * g
                                    - 0.081312 * bl + 128 + 0.5), 0), 255)
                    )
                    ry.append(min(max(int(yv + 0.5), 0), 255))
                ys.append(ry)
                cbs.append(rb)
                crs.append(rr)
            planes = [ys, cbs, crs]
        dc_enc = _enc_table(_DC_BITS, _DC_VALS)
        ac_enc = _enc_table(_AC_BITS, _AC_VALS)
        wr = _BitWriter()
        pred = [0] * channels
        for by in range(ph // 8):
            for bx in range(pw // 8):
                for ci in range(channels):
                    plane = planes[ci]
                    qt = qy_z if ci == 0 else qc_z
                    px = []
                    for yy in range(8):
                        sy = min(by * 8 + yy, h - 1)
                        row = plane[sy]
                        for xx in range(8):
                            px.append(row[min(bx * 8 + xx, w - 1)])
                    coef = _fdct_block(px)
                    quant = [0] * 64
                    for k in range(64):
                        c = coef[zigzag[k]] / qt[k]
                        quant[k] = int(c + 0.5) if c >= 0 else -int(-c + 0.5)
                    diff = quant[0] - pred[ci]
                    pred[ci] = quant[0]
                    t = _category(diff)
                    code, ln = dc_enc[t]
                    wr.write(code, ln)
                    if t:
                        wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                    run = 0
                    last_nz = 0
                    for k in range(1, 64):
                        if quant[k]:
                            last_nz = k
                    for k in range(1, last_nz + 1):
                        v = quant[k]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[0xF0]  # ZRL
                            wr.write(code, ln)
                            run -= 16
                        s = _category(v)
                        code, ln = ac_enc[(run << 4) | s]
                        wr.write(code, ln)
                        wr.write(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if last_nz < 63:
                        code, ln = ac_enc[0x00]  # EOB
                        wr.write(code, ln)
        wr.flush()
        # -- assemble segments --
        out = bytearray(b"\xff\xd8")

        def seg(marker: int, payload: bytes):
            out.extend(b"\xff" + bytes([marker]))
            out.extend((len(payload) + 2).to_bytes(2, "big"))
            out.extend(payload)

        seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        seg(0xDB, bytes([0x00]) + bytes(qy_z))
        if channels == 3:
            seg(0xDB, bytes([0x01]) + bytes(qc_z))
        sof = bytearray(struct.pack(">BHHB", 8, h, w, channels))
        for ci in range(channels):
            sof.extend(bytes([ci + 1, 0x11, 0 if ci == 0 else 1]))
        seg(0xC0, bytes(sof))
        seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
        seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS)
        if channels == 3:
            seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + _DC_VALS)
            seg(0xC4, bytes([0x11]) + bytes(_AC_BITS) + _AC_VALS)
        sos = bytearray([channels])
        for ci in range(channels):
            sos.extend(bytes([ci + 1, 0x00 if ci == 0 else 0x11]))
        sos.extend(b"\x00\x3f\x00")
        seg(0xDA, bytes(sos))
        out.extend(wr.out)
        out.extend(b"\xff\xd9")
        return bytes(out)

    return jpeg_size, jpeg_decode, jpeg_encode
