"""Pure-stdlib JPEG codec (baseline SOF0 + progressive SOF2).

Closes the r05 verdict's remaining codec seam: a media crawl is mostly
JPEG, and the container has no Pillow, so the same factory-nested
self-contained pattern as :func:`..binary._stdlib_png_codec` provides a
REAL decode path — full Huffman entropy decode, dequantize, IDCT,
chroma upsample, YCbCr→RGB — not a header sniff.

Scope and honesty boundary:

- **Decode**: baseline sequential DCT (SOF0/SOF1) AND progressive DCT
  (SOF2 — the r06 verdict's largest named codec seam; a large share of
  web JPEGs are progressive), 8-bit, 1 component (grayscale) or 3
  components (YCbCr, any h/v sampling factors incl. 4:2:0 / 4:2:2 —
  nearest-neighbor chroma upsample), restart markers, tables read from
  the stream's own DQT/DHT segments — so JPEGs from real encoders
  decode, not just our own. Both modes share ONE multi-scan
  coefficient-domain decoder: every scan (baseline's single mixed
  DC+AC scan, or progressive's DC-first / DC-refine / AC-spectral /
  AC-refine scans with Ss/Se/Ah/Al headers and EOB-run coding)
  accumulates integer coefficients per block; dequantize + IDCT runs
  once at the end. Arithmetic coding, 12-bit, lossless, and
  hierarchical modes still raise NotImplementedError — at the frame
  level those payloads QUARANTINE (row dropped), per the module
  posture in ``binary.py``.
- **Encode**: baseline or progressive (``progressive=True`` — a
  successive-approximation scan script: one interleaved DC-first scan
  at Al=1, one AC spectral-selection scan per component at Al=1 with
  EOB-run accumulation, one AC refinement scan per component with
  buffered correction bits, one raw-bit DC refinement scan — 4 scans
  grayscale / 8 color), 4:4:4, quality-scaled Annex-K quantization
  matrices, and deliberately SIMPLE custom Huffman tables (all 12 DC
  categories at one code length; all 256 AC run/size symbols at 9
  bits — which also covers every EOBn symbol) emitted in the DHT
  segments. Any spec-compliant decoder reads tables from the stream,
  so validity — not coding efficiency — is what matters for an
  encoder whose job is test fixtures and re-encode plumbing;
  transcribing the 162-entry Annex-K AC lists by hand would only add
  an error surface. Both encoder modes quantize ONCE and emit the
  same coefficients, so progressive and baseline decodes of the same
  pixels must be bit-identical — the round-trip tests pin that.

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
    - ``jpeg_encode(w, h, channels, pixels, quality=85,
      progressive=False) -> bytes`` — baseline SOF0, or a progressive
      SOF2 successive-approximation scan script when ``progressive``.
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
        # Multi-scan coefficient-domain decoder: every scan (baseline's
        # single mixed DC+AC scan, or progressive's DC/AC first/refine
        # scans) accumulates integer coefficients per block in ZIGZAG
        # index order; dequantize + IDCT runs once after the last scan.
        if b[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload")
        qtables: dict[int, list[int]] = {}
        htables: dict[tuple[int, int], dict] = {}
        restart_interval = 0
        comps = None
        progressive = False
        w = h = hmax = vmax = mcux = mcuy = 0
        n_scans = 0

        def _decode_scan(rd, scomps, ss, se, ah, al):
            """One entropy-coded scan into the per-block coef arrays.

            ``scomps`` is [(comp, dc_tid, ac_tid)] in scan order. For a
            non-interleaved scan (ns=1) the unit is one block over the
            component's OWN ceil(cw/8) x ceil(ch/8) grid (T.81 A.2.2 —
            smaller than the MCU-padded storage grid; padding blocks
            stay zero); interleaved scans walk full MCUs.
            """
            eobrun = 0
            pred = [0] * len(scomps)
            if len(scomps) == 1:
                c0 = scomps[0][0]
                cw = -(-(w * c0["h"]) // hmax)
                ch2 = -(-(h * c0["v"]) // vmax)
                nbx = -(-cw // 8)
                nunits = nbx * (-(-ch2 // 8))
            else:
                nbx = 0
                nunits = mcux * mcuy

            def _blocks(u):
                if len(scomps) == 1:
                    by, bx = divmod(u, nbx)
                    c = scomps[0][0]
                    yield 0, scomps[0], c["coef"][by * c["bw"] + bx]
                    return
                my, mx = divmod(u, mcux)
                for ci, sc in enumerate(scomps):
                    c = sc[0]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            yield ci, sc, c["coef"][
                                (my * c["v"] + by) * c["bw"]
                                + mx * c["h"] + bx
                            ]

            for u in range(nunits):
                if restart_interval and u and u % restart_interval == 0:
                    rd.restart()
                    pred = [0] * len(scomps)
                    eobrun = 0
                for ci, (c, dc_tid, ac_tid), coef in _blocks(u):
                    if not progressive:
                        # baseline mixed scan: DC diff then AC runs
                        t = rd.huff(htables[(0, dc_tid)])
                        pred[ci] += _extend(rd.bits(t), t)
                        coef[0] = pred[ci]
                        ac_t = htables[(1, ac_tid)]
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
                            coef[k] = _extend(rd.bits(s), s)
                            k += 1
                    elif ss == 0:
                        # progressive DC scan (first or refinement)
                        if ah == 0:
                            t = rd.huff(htables[(0, dc_tid)])
                            pred[ci] += _extend(rd.bits(t), t)
                            coef[0] = pred[ci] << al
                        else:
                            # Python | on negative ints is two's
                            # complement, so refining a negative DC
                            # approximation lands exactly
                            coef[0] |= rd.bits(1) << al
                    elif ah == 0:
                        # progressive AC first (spectral selection)
                        if eobrun:
                            eobrun -= 1
                            continue
                        ac_t = htables[(1, ac_tid)]
                        k = ss
                        while k <= se:
                            rs = rd.huff(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                eobrun = (1 << r) - 1  # EOBn
                                if r:
                                    eobrun += rd.bits(r)
                                break
                            k += r
                            if k > se:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(rd.bits(s), s) << al
                            k += 1
                    else:
                        # progressive AC refinement: one bit of
                        # precision per band coefficient; nonzero-history
                        # coefficients get a correction bit, new ones a
                        # (run, +-1<<al) pair; EOBn skips whole blocks
                        # but still carries the correction bits for the
                        # nonzero coefficients it glides over
                        p1 = 1 << al
                        k = ss
                        if eobrun == 0:
                            ac_t = htables[(1, ac_tid)]
                            while k <= se:
                                rs = rd.huff(ac_t)
                                r, s = rs >> 4, rs & 0xF
                                val = 0
                                if s == 0:
                                    if r != 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += rd.bits(r)
                                        break  # tail handled below
                                    # r == 15: ZRL over 16 zero-history
                                else:
                                    if s != 1:
                                        raise ValueError(
                                            "bad AC refinement symbol"
                                        )
                                    val = p1 if rd.bits(1) else -p1
                                while k <= se:
                                    if coef[k]:
                                        if rd.bits(1) and not (
                                            coef[k] & p1
                                        ):
                                            coef[k] += (
                                                p1 if coef[k] > 0 else -p1
                                            )
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                    k += 1
                                if val and k <= se:
                                    coef[k] = val
                                k += 1
                        if eobrun:
                            while k <= se:
                                if coef[k]:
                                    if rd.bits(1) and not (coef[k] & p1):
                                        coef[k] += p1 if coef[k] > 0 else -p1
                                k += 1
                            eobrun -= 1
            return rd

        pos = 2
        saw_eoi = False
        while pos + 1 < len(b):
            if b[pos] != 0xFF:
                raise ValueError("marker expected")
            marker = b[pos + 1]
            if marker == 0xD9:  # EOI
                saw_eoi = True
                break
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM
                pos += 2
                continue
            if pos + 4 > len(b):
                raise ValueError("truncated JPEG stream")
            ln = int.from_bytes(b[pos + 2 : pos + 4], "big")
            payload = b[pos + 4 : pos + 2 + ln]
            if len(payload) != ln - 2:
                raise ValueError("truncated JPEG stream")
            seg_end = pos + 2 + ln
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
                if marker in (0xC0, 0xC1):
                    progressive = False
                elif marker == 0xC2:
                    progressive = True
                else:
                    raise NotImplementedError(
                        f"JPEG mode 0x{marker:02x} (arithmetic/lossless/"
                        "hierarchical) not supported by the stdlib codec"
                    )
                prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
                if prec != 8:
                    raise NotImplementedError("only 8-bit JPEG supported")
                if nc not in (1, 3):
                    raise NotImplementedError(
                        "only 1- or 3-component JPEG supported"
                    )
                comps = []
                for i in range(nc):
                    cid, samp, qid = payload[6 + 3 * i : 9 + 3 * i]
                    comps.append(
                        {"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid}
                    )
                # allocation guard (r07 review): the coefficient store
                # is built from UNVALIDATED header dims before any
                # entropy data is read — a 25-byte payload declaring
                # 65500x65500 would OOM-kill the worker (which the
                # quarantine's try/except cannot catch). 16M pixels is
                # far beyond any fixture/media-tier image.
                if w * h > (1 << 24):
                    raise ValueError(
                        "image too large for the stdlib JPEG decoder"
                    )
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    c["bw"] = mcux * c["h"]  # blocks across (MCU-padded)
                    c["bh"] = mcuy * c["v"]
                    c["coef"] = [
                        [0] * 64 for _ in range(c["bw"] * c["bh"])
                    ]
            elif marker == 0xDA:  # SOS
                if comps is None:
                    raise ValueError("missing SOF/SOS")
                ns = payload[0]
                by_id = {c["id"]: c for c in comps}
                scomps = []
                for i in range(ns):
                    cid, tids = payload[1 + 2 * i], payload[2 + 2 * i]
                    if cid not in by_id:
                        raise ValueError("scan references unknown component")
                    scomps.append((by_id[cid], tids >> 4, tids & 0xF))
                ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
                ahal = payload[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0xF
                if progressive:
                    if ss == 0 and se != 0:
                        raise ValueError(
                            "progressive DC scan must have Se=0"
                        )
                    if ss > 0 and ns != 1:
                        raise ValueError(
                            "progressive AC scan must be non-interleaved"
                        )
                elif ss != 0 or se != 63 or ah != 0 or al != 0:
                    raise ValueError("invalid baseline scan header")
                rd = _decode_scan(
                    _BitReader(b, seg_end), scomps, ss, se, ah, al
                )
                n_scans += 1
                # resume the marker walk past this scan's entropy data
                # (any 0xFF + non-stuffing, non-RST byte is a marker)
                p = rd.pos
                while p + 1 < len(b) and not (
                    b[p] == 0xFF
                    and b[p + 1] != 0x00
                    and not (0xD0 <= b[p + 1] <= 0xD7)
                ):
                    p += 1
                pos = p
                continue
            pos = seg_end
        if comps is None or n_scans == 0:
            raise ValueError("missing SOF/SOS")
        if not saw_eoi:
            raise ValueError("truncated JPEG stream")
        # dequantize + inverse DCT, once, after the last scan
        planes = []
        for c in comps:
            qt = qtables[c["q"]]
            stride = c["bw"] * 8
            plane = bytearray(stride * c["bh"] * 8)
            for bi, coef in enumerate(c["coef"]):
                deq = [0.0] * 64
                for k in range(64):
                    if coef[k]:
                        deq[zigzag[k]] = coef[k] * qt[k]
                px = _idct_block(deq)
                bby, bbx = divmod(bi, c["bw"])
                row0, col0 = bby * 8, bbx * 8
                for yy in range(8):
                    off = (row0 + yy) * stride + col0
                    plane[off : off + 8] = bytes(px[yy * 8 : yy * 8 + 8])
            planes.append(plane)
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
        w: int,
        h: int,
        channels: int,
        pixels: bytes,
        quality: int = 85,
        progressive: bool = False,
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
        # quantize every block ONCE (zigzag-order ints, raster per
        # component; 4:4:4 so all components share the block grid) —
        # baseline and progressive emit the SAME coefficients, which is
        # what makes their decodes bit-identical
        nbx, nby = pw // 8, ph // 8
        qblocks = [[None] * (nbx * nby) for _ in range(channels)]
        for by in range(nby):
            for bx in range(nbx):
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
                    qblocks[ci][by * nbx + bx] = quant

        def _emit_dc_diff(wr, diff: int):
            t = _category(diff)
            code, ln = dc_enc[t]
            wr.write(code, ln)
            if t:
                wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)

        def _emit_baseline_scan(wr):
            pred = [0] * channels
            for u in range(nbx * nby):
                for ci in range(channels):
                    quant = qblocks[ci][u]
                    _emit_dc_diff(wr, quant[0] - pred[ci])
                    pred[ci] = quant[0]
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

        def _emit_dc_first(wr, al: int):
            # point transform is an ARITHMETIC shift (floor for
            # negatives), mirrored by the decoder's pred << al
            pred = [0] * channels
            for u in range(nbx * nby):
                for ci in range(channels):
                    v = qblocks[ci][u][0] >> al
                    _emit_dc_diff(wr, v - pred[ci])
                    pred[ci] = v

        def _emit_dc_refine(wr, al: int):
            for u in range(nbx * nby):
                for ci in range(channels):
                    wr.write((qblocks[ci][u][0] >> al) & 1, 1)

        def _emit_ac_first(wr, ci: int, ss: int, se: int, al: int):
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    rr = eobrun.bit_length() - 1
                    code, ln = ac_enc[rr << 4]
                    wr.write(code, ln)
                    if rr:
                        wr.write(eobrun - (1 << rr), rr)
                    eobrun = 0

            for quant in qblocks[ci]:
                band = [
                    q >> al if q >= 0 else -((-q) >> al)
                    for q in quant[ss : se + 1]
                ]
                last = -1
                for i, v in enumerate(band):
                    if v:
                        last = i
                if last < 0:  # whole band zero: joins the EOB run
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(last + 1):
                    v = band[i]
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
                if last < len(band) - 1:  # trailing zeros: EOB run
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()

        def _emit_ac_refine(wr, ci: int, ss: int, se: int, al: int):
            # One more magnitude bit per band coefficient. New nonzeros
            # (|coef|>>al == 1) get a (run,1) symbol + sign bit; history
            # coefficients get a correction bit BUFFERED until the next
            # symbol (or carried with a deferred EOB run) so the decoder
            # reads them in positional order while it advances.
            eobrun = 0
            run_bits: list[int] = []  # corrections riding the EOB run

            def flush_eob():
                nonlocal eobrun, run_bits
                if eobrun:
                    rr = eobrun.bit_length() - 1
                    code, ln = ac_enc[rr << 4]
                    wr.write(code, ln)
                    if rr:
                        wr.write(eobrun - (1 << rr), rr)
                    eobrun = 0
                for bit in run_bits:
                    wr.write(bit, 1)
                run_bits = []

            for quant in qblocks[ci]:
                absv = [
                    (q if q >= 0 else -q) >> al for q in quant[ss : se + 1]
                ]
                sgn = [1 if q > 0 else 0 for q in quant[ss : se + 1]]
                eobpos = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eobpos = i
                r = 0
                blk_bits: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    # emit pending ZRLs, unless they fold into the EOB
                    while r > 15 and i <= eobpos:
                        flush_eob()
                        code, ln = ac_enc[0xF0]
                        wr.write(code, ln)
                        r -= 16
                        for bit in blk_bits:
                            wr.write(bit, 1)
                        blk_bits = []
                    if t > 1:  # history nonzero: correction bit only
                        blk_bits.append(t & 1)
                        continue
                    flush_eob()
                    code, ln = ac_enc[(r << 4) | 1]
                    wr.write(code, ln)
                    wr.write(sgn[i], 1)
                    for bit in blk_bits:
                        wr.write(bit, 1)
                    blk_bits = []
                    r = 0
                if r > 0 or blk_bits:
                    eobrun += 1
                    run_bits.extend(blk_bits)
                    if eobrun == 0x7FFF or len(run_bits) > 930:
                        flush_eob()
            flush_eob()

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
        seg(0xC2 if progressive else 0xC0, bytes(sof))
        seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
        seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS)
        if channels == 3:
            seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + _DC_VALS)
            seg(0xC4, bytes([0x11]) + bytes(_AC_BITS) + _AC_VALS)

        def sos_hdr(comp_ids, ss, se, ah, al) -> bytes:
            hdr = bytearray([len(comp_ids)])
            for ci in comp_ids:
                td = 0 if ci == 0 else 1
                hdr.extend(bytes([ci + 1, (td << 4) | td]))
            hdr.extend(bytes([ss, se, (ah << 4) | al]))
            return bytes(hdr)

        all_ci = list(range(channels))
        if not progressive:
            wr = _BitWriter()
            _emit_baseline_scan(wr)
            wr.flush()
            seg(0xDA, sos_hdr(all_ci, 0, 63, 0, 0))
            out.extend(wr.out)
        else:
            scans = [(all_ci, 0, 0, 0, 1, _emit_dc_first)]
            for ci in all_ci:
                scans.append(([ci], 1, 63, 0, 1, _emit_ac_first))
            for ci in all_ci:
                scans.append(([ci], 1, 63, 1, 0, _emit_ac_refine))
            scans.append((all_ci, 0, 0, 1, 0, _emit_dc_refine))
            for comp_ids, ss, se, ah, al, emit in scans:
                wr = _BitWriter()
                if ss == 0:
                    emit(wr, al)
                else:
                    emit(wr, comp_ids[0], ss, se, al)
                wr.flush()
                seg(0xDA, sos_hdr(comp_ids, ss, se, ah, al))
                out.extend(wr.out)
        out.extend(b"\xff\xd9")
        return bytes(out)

    return jpeg_size, jpeg_decode, jpeg_encode
