"""Image perceptual-hash near-dup tier (multimodal/phash.py): dHash
determinism and codec invariance, Hamming block-LSH exactness, quarantine
posture, planted-pair recall, and the never-all-pairs plan shape."""

from __future__ import annotations

import hashlib

import pytest

from airflow_etl_finance_market_spark.multimodal.binary import (
    _stdlib_png_codec,
)
from airflow_etl_finance_market_spark.multimodal.gif import _stdlib_gif_codec
from airflow_etl_finance_market_spark.multimodal.jpeg import (
    _stdlib_jpeg_codec,
)
from airflow_etl_finance_market_spark.multimodal.phash import (
    _dhash_from_pixels,
    hamming_near_pairs,
    image_dhash,
    image_near_dup_pairs,
)

_LEVELS = [16, 48, 80, 112, 144, 176, 208, 240]


def _block_image(seed: bytes, gw: int = 9, gh: int = 8, blk: int = 8):
    """72x64 grayscale block grid; horizontal neighbors >= 32 luma apart."""
    vals = []
    for r in range(gh):
        row = []
        for c in range(gw):
            hv = hashlib.md5(seed + bytes([r, c])).digest()[0]
            v = _LEVELS[hv % 8]
            if c > 0 and v == row[-1]:
                v = _LEVELS[(hv % 8 + 1) % 8]
            row.append(v)
        vals.append(row)
    pix = bytearray()
    for r in range(gh):
        rowbytes = bytearray()
        for c in range(gw):
            rowbytes += bytes([vals[r][c]]) * blk
        pix += bytes(rowbytes) * blk
    return gw * blk, gh * blk, bytes(pix)


def _upscale2(pix: bytes, w: int, h: int) -> bytes:
    out = bytearray()
    for y in range(h):
        d = bytearray()
        for v in pix[y * w : (y + 1) * w]:
            d += bytes([v, v])
        out += d + d
    return bytes(out)


class TestDhashKernel:
    def test_known_gradient_image(self):
        """A 9x8 image that IS the grid: bit k set iff right neighbor is
        brighter — hand-checkable on a monotone row."""
        # row r: luma increases left->right => all 8 bits of the row set
        pix = bytes(c * 20 for _ in range(8) for c in range(9))
        assert _dhash_from_pixels(9, 8, 1, pix) == (1 << 64) - 1
        # decreasing => no bits set
        pix = bytes((8 - c) * 20 for _ in range(8) for c in range(9))
        assert _dhash_from_pixels(9, 8, 1, pix) == 0

    def test_rgb_luma_reduction_matches_gray(self):
        """An RGB image with R=G=B must hash identically to its gray
        plane (BT.601 weights sum to ~1000/1000)."""
        w, h, gray = _block_image(b"rgbtest")
        rgb = b"".join(bytes((v, v, v)) for v in gray)
        assert _dhash_from_pixels(w, h, 3, rgb) == _dhash_from_pixels(
            w, h, 1, gray
        )

    def test_below_grid_size_refuses(self):
        with pytest.raises(ValueError, match="smaller than the hash grid"):
            _dhash_from_pixels(4, 4, 1, bytes(16))

    def test_codec_invariance_png_jpeg_gif_upscale(self):
        """The SAME pixels through PNG, baseline JPEG q90, and a GIF of
        the 2x nearest upscale hash IDENTICALLY (gradient signs survive
        codec noise when neighbors are >= 32 luma apart) — the property
        the image_phash_near_dups gate's planted families rest on."""
        _, png_dec, png_enc, _ = _stdlib_png_codec()
        _, jpeg_dec, jpeg_enc = _stdlib_jpeg_codec()
        _, gif_dec, gif_enc = _stdlib_gif_codec()
        gray_pal = [(i, i, i) for i in range(256)]
        for seed in (b"a", b"b", b"c"):
            w, h, pix = _block_image(seed)
            h_png = _dhash_from_pixels(*png_dec(png_enc(w, h, 1, pix)))
            h_jpg = _dhash_from_pixels(
                *jpeg_dec(jpeg_enc(w, h, 1, pix, quality=90))
            )
            h_gif = _dhash_from_pixels(
                *gif_dec(
                    gif_enc(2 * w, 2 * h, _upscale2(pix, w, h), gray_pal)
                )
            )
            assert h_png == h_jpg == h_gif

    def test_unrelated_images_are_far(self):
        _, png_dec, png_enc, _ = _stdlib_png_codec()
        hs = []
        for i in range(10):
            w, h, pix = _block_image(f"seed{i}".encode())
            hs.append(_dhash_from_pixels(*png_dec(png_enc(w, h, 1, pix))))
        for i in range(10):
            for j in range(i + 1, 10):
                assert bin(hs[i] ^ hs[j]).count("1") > 8


class TestHammingNearPairs:
    def _sig_frame(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, dhash long")

    def test_pigeonhole_recall_is_exact_within_block_bound(self, spark):
        """For max_hamming <= n_blocks - 1 the block join is an EXACT
        candidate generator: every pair within the bound must surface,
        for every choice of which bits differ."""
        base = 0x0123_4567_89AB_CDEF
        rows = [(0, base)]
        # flip 3 bits spread across three different blocks
        rows.append((1, base ^ (1 << 2) ^ (1 << 20) ^ (1 << 40)))
        # flip 3 bits all inside ONE block (others must still match)
        rows.append((2, base ^ 0b111 << 17))
        # 5 bits > max_hamming: excluded even though blocks collide
        rows.append((3, base ^ (0b11111 << 30)))
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_near_pairs(
                self._sig_frame(spark, rows), max_hamming=3
            ).collect()
        }
        assert (0, 1, 3) in got
        assert (0, 2, 3) in got
        assert not any(3 in (a, b) for a, b, _ in got)

    def test_signed_longs_block_split_is_unsigned(self, spark):
        """Hashes stored as NEGATIVE bigints (bit 63 set) must block-split
        with shiftrightunsigned semantics — a sign-extending shift would
        put equal high blocks in different buckets."""
        top = -(1 << 63)  # only bit 63 set
        rows = [(0, top), (1, top ^ 1)]  # hamming 1, high block equal
        got = hamming_near_pairs(
            self._sig_frame(spark, rows), max_hamming=1
        ).collect()
        assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(0, 1, 1)]


class TestImageDhashOnSpark:
    def test_hash_stage_quarantines_undecodable(self, spark):
        """Corrupt/unsupported payloads drop (never a task failure);
        well-formed ones hash — matching the binary.py frame posture."""
        _, _, png_enc, _ = _stdlib_png_codec()
        w, h, pix = _block_image(b"q")
        media = spark.createDataFrame(
            [
                (1, bytearray(png_enc(w, h, 1, pix))),
                (2, bytearray(b"\x89PNG\r\n\x1a\n garbage")),
                (3, bytearray(b"not an image at all")),
                (4, None),
            ],
            "doc_id long, payload binary",
        )
        got = image_dhash(media).collect()
        assert [r.doc_id for r in got] == [1]

    def test_planted_pair_recall(self, spark):
        """End to end (the verdict's planted-pair recall test): 8
        families x 3 byte-different variants of the same pixels — the
        pair set must be EXACTLY the 3 within-family pairs per family,
        nothing across families."""
        _, _, png_enc, _ = _stdlib_png_codec()
        _, _, jpeg_enc = _stdlib_jpeg_codec()
        _, _, gif_enc = _stdlib_gif_codec()
        gray_pal = [(i, i, i) for i in range(256)]
        rows = []
        for fam in range(8):
            w, h, pix = _block_image(f"fam{fam}".encode())
            rows.append((fam * 10, bytearray(png_enc(w, h, 1, pix))))
            rows.append(
                (fam * 10 + 1, bytearray(jpeg_enc(w, h, 1, pix, quality=90)))
            )
            rows.append(
                (
                    fam * 10 + 2,
                    bytearray(
                        gif_enc(2 * w, 2 * h, _upscale2(pix, w, h), gray_pal)
                    ),
                )
            )
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        pairs = image_near_dup_pairs(media, max_hamming=4).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        expect = {
            (fam * 10 + a, fam * 10 + b)
            for fam in range(8)
            for a, b in ((0, 1), (0, 2), (1, 2))
        }
        assert got == expect
        assert all(r.hamming == 0 for r in pairs)

    def test_pair_plan_is_equi_join_never_cartesian(self, spark):
        """The scale contract: candidate generation is a block equi-join
        (shuffle on block values), never CartesianProduct / all-pairs,
        and verification is JVM-side bit_count (no Python in the pair
        stage)."""
        sigs = spark.createDataFrame(
            [(i, i * 7919) for i in range(10)], "doc_id long, dhash long"
        )
        df = hamming_near_pairs(sigs, max_hamming=4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "bit_count" in plan


class TestMultiIndexAndBucketStats:
    """r09 verdict #1: the block-LSH pair join keyed on ~13-bit block
    values is exact and sub-linear at measured scale but grows
    ~n^2/2048 at web scale. These tests pin (a) the bucket-size audit
    query, (b) the exact multi-index mode's candidate-count win on an
    adversarially skewed signature set, and (c) that the mode stays
    EXACT — identical verified pairs, including at exactly Hamming 4."""

    @staticmethod
    def _sig(seed: int) -> int:
        return int.from_bytes(
            hashlib.md5(b"mih%d" % seed).digest()[:8], "big"
        ) & ((1 << 63) - 1)  # keep positive: createDataFrame longs

    def _skewed_frame(self, spark, n=60):
        """n signatures sharing the LOW 12 BITS (= block 0 of the
        5-block default scheme, one full bucket) but random elsewhere —
        mutually far in Hamming distance, so every same-bucket
        candidate is a wasted verify."""
        rows = [(i, (self._sig(i) & ~0xFFF) | 0xABC) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, dhash long")

    def test_bucket_stats_count_the_skewed_bucket(self, spark):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            block_bucket_stats,
        )

        stats = block_bucket_stats(self._skewed_frame(spark)).first()
        assert stats.n_items == 60
        assert stats.max_bucket == 60  # the planted (block 0, 0xABC) mass
        # every pair collides in block 0: candidate_pairs >= C(60, 2)
        assert stats.candidate_pairs >= 60 * 59 // 2

    def test_multi_index_bounds_skewed_candidates(self, spark):
        """The adversarial case the r09 verdict asked for: on the
        shared-low-bits set the ball-0 default generates the full
        C(60,2) candidate blow-up while 3x~21-bit blocks with ball-1
        probes scatter the shared 12 bits across a wider key space —
        candidates stay bounded, verified output identical (empty)."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            _block_candidates,
            hamming_near_pairs,
        )
        from pyspark.sql import functions as F

        frame = self._skewed_frame(spark)
        items = frame.select(
            F.col("doc_id").alias("id"), F.col("dhash").alias("sig")
        )
        ball0 = _block_candidates(items, n_blocks=5, n_bits=64).count()
        mih = _block_candidates(
            items, n_blocks=3, n_bits=64, ball=1
        ).count()
        assert ball0 >= 60 * 59 // 2
        assert mih < ball0 / 4  # bounded, not the full bucket blow-up
        # and the verified pair sets agree (here: no real near-dups)
        assert hamming_near_pairs(frame).count() == 0
        assert (
            hamming_near_pairs(frame, n_blocks=3, block_ball=1).count()
            == 0
        )

    def test_multi_index_exact_same_pairs_including_hamming_4(self, spark):
        """Exactness: a planted family at Hamming 0/2/4 (the radius
        boundary, bits spread 2+2 across different 21-bit blocks — the
        worst case for ball-1: min per-block distance exactly 1 needs
        the flip enumeration) yields the SAME verified pairs under the
        default and the multi-index mode."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            hamming_near_pairs,
        )

        base = self._sig(999)
        rows = [
            (1, base),
            (2, base ^ 0b11),  # Hamming 2, inside block 0
            # Hamming 4 spread 2/1/1 over the 21-bit blocks: min
            # per-block distance is exactly 1, so ONLY the ball-1 flip
            # enumeration can catch it (a ball-0 3-block split would
            # miss it — which is why that combination raises)
            (3, base ^ (1 << 1) ^ (1 << 20) ^ (1 << 25) ^ (1 << 50)),
            # Hamming 5 from base: outside the radius vs id 1
            (4, base ^ 0b11111),
            (5, self._sig(1000)),  # unrelated
        ]
        frame = spark.createDataFrame(rows, "doc_id long, dhash long")
        want = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_near_pairs(frame, max_hamming=4).collect()
        )
        got = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_near_pairs(
                frame, max_hamming=4, n_blocks=3, block_ball=1
            ).collect()
        )
        assert want == got
        assert (1, 3, 4) in want  # the radius-boundary pair is present

    def test_violating_ball_combination_raises(self, spark):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            hamming_near_pairs,
        )

        frame = spark.createDataFrame(
            [(1, 7)], "doc_id long, dhash long"
        )
        with pytest.raises(ValueError, match="exact recall"):
            # floor(4/2) = 2 > ball 1: two blocks can't cover radius 4
            hamming_near_pairs(
                frame, max_hamming=4, n_blocks=2, block_ball=1
            )
        with pytest.raises(NotImplementedError):
            from airflow_etl_finance_market_spark.multimodal.phash import (
                _block_candidates,
            )
            from pyspark.sql import functions as F

            _block_candidates(
                frame.select(
                    F.col("doc_id").alias("id"),
                    F.col("dhash").alias("sig"),
                ),
                n_blocks=2,
                n_bits=64,
                ball=2,
            )

    def test_ball1_full_width_block_raises(self, spark):
        """r10 ADVICE: with a 64-bit-wide block, the ball-1 flip mask
        for bit 63 saturates the double->long cast to Long.MAX_VALUE
        and silently probes a wrong mask — must raise, not mis-probe."""
        from pyspark.sql import functions as F

        from airflow_etl_finance_market_spark.multimodal.phash import (
            _block_candidates,
        )

        frame = spark.createDataFrame(
            [(1, 7)], "doc_id long, dhash long"
        ).select(
            F.col("doc_id").alias("id"), F.col("dhash").alias("sig")
        )
        with pytest.raises(NotImplementedError, match="63"):
            _block_candidates(frame, n_blocks=1, n_bits=64, ball=1)
        # 32-bit-wide blocks stay allowed: flip <= 31 < the sign bit.
        assert (
            _block_candidates(frame, n_blocks=2, n_bits=64, ball=1)
            .count()
            == 0
        )


def test_hamming_exactly_max_distance_one_bit_per_block(spark):
    """r07 review regression: a pair at EXACTLY max_hamming=4 with one
    flipped bit in each 16-bit quarter shared no block under the old
    n_blocks=4 default and was silently dropped; the max_hamming+1
    default restores the pigeonhole guarantee."""
    from airflow_etl_finance_market_spark.multimodal.phash import (
        hamming_near_pairs,
    )

    base = 0x0123456789ABCDEF
    other = base ^ (1 << 3) ^ (1 << 19) ^ (1 << 35) ^ (1 << 51)
    sigs = spark.createDataFrame(
        [(0, base), (1, other)], "doc_id long, dhash long"
    )
    rows = hamming_near_pairs(sigs, max_hamming=4).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(0, 1, 4)]


def test_hamming_violating_explicit_blocks_raises(spark):
    import pytest

    from airflow_etl_finance_market_spark.multimodal.phash import (
        hamming_near_pairs,
    )

    sigs = spark.createDataFrame([(0, 1)], "doc_id long, dhash long")
    with pytest.raises(ValueError, match="exact recall"):
        hamming_near_pairs(sigs, max_hamming=4, n_blocks=4)


class TestPhashDct:
    """DCT pHash (the global-spectral sibling of dHash): arithmetic-exact
    invariances, pinned empirical JPEG robustness, the crop LIMITATION
    contract for both signatures, and the Spark stage."""

    def _phash(self):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            _phash_kernel,
        )

        return _phash_kernel()

    @staticmethod
    def _base32(seed: bytes) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < 32 * 32:
            out += hashlib.md5(seed + bytes([i])).digest()
            i += 1
        return bytes(out[: 32 * 32])

    def test_exact_invariance_lossless_reencode_and_2x_upscale(self):
        """The driver gate's construction: identical pixels through GIF
        palette re-encode, and a 2x nearest upscale of a 32x32 image,
        hash IDENTICALLY (Hamming 0) — area-averaging a k-times-integer
        upscale of a grid-sized image reproduces the raster exactly."""
        ph = self._phash()
        _, png_dec, png_enc, _ = _stdlib_png_codec()
        _, gif_dec, gif_enc = _stdlib_gif_codec()
        gray_pal = [(i, i, i) for i in range(256)]
        for s in range(8):
            pix = self._base32(bytes([s]))
            h_png = ph(*png_dec(png_enc(32, 32, 1, pix)))
            h_gif = ph(*gif_dec(gif_enc(32, 32, pix, gray_pal)))
            h_up = ph(
                *png_dec(png_enc(64, 64, 1, _upscale2(pix, 32, 32)))
            )
            assert h_png == h_gif == h_up

    def test_jpeg_q90_stays_within_gate_radius(self):
        """Empirical (NOT provable — which is why the driver gate uses
        only the exact variants): baseline JPEG q90 re-encodes of fixed
        seeds stay within the Hamming-4 gate radius."""
        ph = self._phash()
        _, png_dec, png_enc, _ = _stdlib_png_codec()
        _, jpeg_dec, jpeg_enc = _stdlib_jpeg_codec()
        for s in range(12):
            pix = self._base32(bytes([100 + s]))
            h_png = ph(*png_dec(png_enc(32, 32, 1, pix)))
            h_jpg = ph(*jpeg_dec(jpeg_enc(32, 32, 1, pix, quality=90)))
            assert bin(h_png ^ h_jpg).count("1") <= 4, s

    def test_unrelated_images_are_far(self):
        ph = self._phash()
        hs = [ph(32, 32, 1, self._base32(bytes([s]))) for s in range(12)]
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                assert bin(hs[i] ^ hs[j]).count("1") > 8

    def test_crop_limitation_contract_pinned(self):
        """NEITHER whole-image signature is crop-robust — the documented
        contract (r07 verdict #6): a 25% edge crop of the same image
        lands well outside the Hamming-4 gate radius for dHash AND
        pHash, so crops are NOT near-dups under the WHOLE-IMAGE tier.
        The TILE-overlap tier (TestTileCropNearDups below) closes the
        aligned-crop case; arbitrary pixel-offset crops still need
        keypoint/patch methods — out of scope, stated loudly."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            _dhash_from_pixels,
        )

        ph = self._phash()
        missed_d, missed_p = 0, 0
        for s in range(6):
            seed = bytes([50 + s])
            pix = bytearray()
            i = 0
            while len(pix) < 64 * 64:
                pix += hashlib.md5(seed + bytes([i])).digest()
                i += 1
            pix = bytes(pix[: 64 * 64])
            # crop the left 16 columns off: a 48x64 view of the image
            crop = b"".join(
                pix[y * 64 + 16 : (y + 1) * 64] for y in range(64)
            )
            d_full = _dhash_from_pixels(64, 64, 1, pix)
            d_crop = _dhash_from_pixels(48, 64, 1, crop)
            p_full = ph(64, 64, 1, pix)
            p_crop = ph(48, 64, 1, crop)
            if bin(d_full ^ d_crop).count("1") > 4:
                missed_d += 1
            if bin(p_full ^ p_crop).count("1") > 4:
                missed_p += 1
        assert missed_d == 6 and missed_p == 6

    def test_below_grid_size_refuses(self):
        with pytest.raises(ValueError, match="smaller than the hash grid"):
            self._phash()(16, 16, 1, bytes(256))

    def test_rgb_luma_matches_gray(self):
        ph = self._phash()
        pix = self._base32(b"rgbluma")
        rgb = b"".join(bytes([v, v, v]) for v in pix)
        assert ph(32, 32, 1, pix) == ph(32, 32, 3, rgb)

    def test_spark_stage_and_planted_recall(self, spark):
        """image_phash_dct on Spark: exact variants pair at Hamming 0
        through hamming_near_pairs(sig_col='phash'); undecodable
        payloads quarantine."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            hamming_near_pairs,
            image_phash_dct,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix_a = self._base32(b"family-a")
        pix_b = self._base32(b"family-b")
        media = spark.createDataFrame(
            [
                (10, bytearray(png_enc(32, 32, 1, pix_a))),
                (11, bytearray(png_enc(64, 64, 1, _upscale2(pix_a, 32, 32)))),
                (20, bytearray(png_enc(32, 32, 1, pix_b))),
                (99, bytearray(b"not an image at all")),
            ],
            "doc_id long, payload binary",
        )
        sigs = image_phash_dct(media)
        rows = {r.doc_id: r.phash for r in sigs.collect()}
        assert set(rows) == {10, 11, 20}  # 99 quarantined
        assert rows[10] == rows[11]
        pairs = hamming_near_pairs(
            sigs, sig_col="phash", max_hamming=4
        ).collect()
        assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(10, 11, 0)]


class TestVideoNearDups:
    """Video-level near-dup: frame-hash set overlap over the map-only
    walk+decode+dHash stage."""

    def _make_avi(self, seed: bytes, n_frames: int = 4, noise: int = 0):
        from airflow_etl_finance_market_spark.multimodal.jpeg import (
            _stdlib_jpeg_codec,
        )
        from airflow_etl_finance_market_spark.multimodal.video import (
            _stdlib_avi_codec,
        )

        _, _, jpeg_enc = _stdlib_jpeg_codec()
        _, _, avi_enc = _stdlib_avi_codec()
        frames = []
        for fi in range(n_frames):
            w, h, pix = _block_image(seed + bytes([fi]))
            pix = bytearray(pix)
            for t in range(noise):
                p = hashlib.md5(seed + bytes([fi, 200 + t])).digest()
                pos = (p[0] % h) * w + p[1] % w
                pix[pos] = max(0, min(255, pix[pos] + (p[2] % 9) - 4))
            frames.append(jpeg_enc(w, h, 1, bytes(pix), quality=90))
        return avi_enc(frames, fps=10, width=72, height=64)

    def test_planted_video_pair_full_overlap(self, spark):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            video_frame_dhash,
            video_near_dup_pairs,
        )

        media = spark.createDataFrame(
            [
                (10, bytearray(self._make_avi(b"fam1"))),
                (11, bytearray(self._make_avi(b"fam1", noise=3))),
                (20, bytearray(self._make_avi(b"fam2"))),
                (99, bytearray(b"RIFFxxxxNOTAVIDEO")),  # quarantined
            ],
            "doc_id long, payload binary",
        )
        sigs = video_frame_dhash(media)
        assert sigs.select("video_id").distinct().count() == 3
        rows = video_near_dup_pairs(sigs).collect()
        assert [(r.video_a, r.video_b, r.match_frac) for r in rows] == [
            (10, 11, 1.0)
        ]

    def test_partial_overlap_below_threshold_filtered(self, spark):
        """A video sharing only 1 of 4 frames with another sits at
        frac 0.25 < 0.8 and must NOT pair — the fraction threshold is
        what absorbs incidental single-frame collisions."""
        from airflow_etl_finance_market_spark.multimodal.jpeg import (
            _stdlib_jpeg_codec,
        )
        from airflow_etl_finance_market_spark.multimodal.phash import (
            video_frame_dhash,
            video_near_dup_pairs,
        )
        from airflow_etl_finance_market_spark.multimodal.video import (
            _stdlib_avi_codec,
        )

        _, _, jpeg_enc = _stdlib_jpeg_codec()
        _, _, avi_enc = _stdlib_avi_codec()

        def frame(seed):
            w, h, pix = _block_image(seed)
            return jpeg_enc(w, h, 1, pix, quality=90)

        a = avi_enc([frame(b"s1"), frame(b"s2"), frame(b"s3"), frame(b"s4")],
                    fps=10, width=72, height=64)
        b = avi_enc([frame(b"s1"), frame(b"x2"), frame(b"x3"), frame(b"x4")],
                    fps=10, width=72, height=64)
        media = spark.createDataFrame(
            [(1, bytearray(a)), (2, bytearray(b))],
            "doc_id long, payload binary",
        )
        pairs = video_near_dup_pairs(video_frame_dhash(media)).collect()
        assert pairs == []
        loose = video_near_dup_pairs(
            video_frame_dhash(media), min_match_frac=0.2
        ).collect()
        assert [(r.video_a, r.video_b, r.n_matched) for r in loose] == [
            (1, 2, 1)
        ]

    def test_every_n_sampling(self, spark):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            video_frame_dhash,
        )

        media = spark.createDataFrame(
            [(1, bytearray(self._make_avi(b"samp", n_frames=6)))],
            "doc_id long, payload binary",
        )
        rows = video_frame_dhash(media, every_n=2).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 2, 4]


class TestTileCropNearDups:
    """Tile-hash set-overlap crop dedup (image_tile_dhash ∘
    image_tile_near_dup_pairs) — the tier that CLOSES the crop
    limitation pinned above: per-tile signatures survive a crop even
    though whole-image dHash/pHash do not."""

    @staticmethod
    def _noise(seed: bytes, w: int, h: int) -> bytes:
        out = bytearray()
        i = 0
        while len(out) < w * h:
            out += hashlib.md5(seed + i.to_bytes(2, "big")).digest()
            i += 1
        return bytes(out[: w * h])

    @staticmethod
    def _crop(pix: bytes, w: int, x0: int, y0: int, cw: int, ch: int):
        return b"".join(
            pix[(y0 + y) * w + x0 : (y0 + y) * w + x0 + cw]
            for y in range(ch)
        )

    def test_tile_stage_counts_and_distinctness(self, spark):
        """A 128x128 image yields exactly 16 complete 32x32 tiles with
        (whp, pinned for this seed) 16 distinct signatures; partial
        tiles at the edges of a 100x70 image do not hash."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"tiles", 128, 128)
        odd = self._noise(b"odd", 100, 70)
        media = spark.createDataFrame(
            [
                (1, bytearray(png_enc(128, 128, 1, pix))),
                (2, bytearray(png_enc(100, 70, 1, odd))),
                (3, bytearray(b"not an image")),
            ],
            "doc_id long, payload binary",
        )
        rows = image_tile_dhash(media).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.doc_id, []).append(r.dhash)
        assert len(by_id[1]) == 16 and len(set(by_id[1])) == 16
        assert len(by_id[2]) == 3 * 2  # floor(100/32) x floor(70/32)
        assert 3 not in by_id  # quarantined

    def test_aligned_crop_found_whole_image_hash_misses(self, spark):
        """THE closing test: the tile-aligned 96x96 crop of a 128x128
        image is found by tile overlap (match_frac == 1) while the
        whole-image dHash pair stage misses it — same images, same
        session, both facts asserted together."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_dhash,
            image_tile_dhash,
            image_tile_near_dup_pairs,
            hamming_near_pairs,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"crop-family", 128, 128)
        cr = self._crop(pix, 128, 32, 32, 96, 96)
        unrelated = self._noise(b"unrelated", 128, 128)
        media = spark.createDataFrame(
            [
                (1, bytearray(png_enc(128, 128, 1, pix))),
                (2, bytearray(png_enc(96, 96, 1, cr))),
                (3, bytearray(png_enc(128, 128, 1, unrelated))),
            ],
            "doc_id long, payload binary",
        )
        tile_pairs = image_tile_near_dup_pairs(
            image_tile_dhash(media), min_match_frac=0.8
        ).collect()
        assert [(r.id_a, r.id_b, r.n_matched, r.match_frac) for r in tile_pairs] == [
            (1, 2, 9, 1.0)
        ]
        whole_pairs = hamming_near_pairs(image_dhash(media)).collect()
        assert whole_pairs == []  # the pinned limitation, same data
        # the exact multi-index mode rides the same set-overlap path
        # (shared _block_candidates) and returns the identical gate
        mih = image_tile_near_dup_pairs(
            image_tile_dhash(media),
            min_match_frac=0.8,
            n_blocks=3,
            block_ball=1,
        ).collect()
        assert [
            (r.id_a, r.id_b, r.n_matched, r.match_frac) for r in mih
        ] == [(1, 2, 9, 1.0)]

    def test_misaligned_crop_degrades_honestly(self, spark):
        """An off-grid crop (offset 40,40 — 8 pixels past the tile
        boundary) shares NO byte-identical tiles; gradient signs drift
        with the shift, so overlap falls below the 0.8 threshold. The
        tier's honest residual: tile overlap buys ALIGNED-crop recall
        (thumbnails, letterbox strips, exact re-tiles), not arbitrary
        pixel-offset crops — pinned so the claim stays measured."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
            image_tile_near_dup_pairs,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"misaligned", 128, 128)
        cr = self._crop(pix, 128, 40, 40, 80, 80)
        media = spark.createDataFrame(
            [
                (1, bytearray(png_enc(128, 128, 1, pix))),
                (2, bytearray(png_enc(80, 80, 1, cr))),
            ],
            "doc_id long, payload binary",
        )
        pairs = image_tile_near_dup_pairs(
            image_tile_dhash(media), min_match_frac=0.8
        ).collect()
        assert pairs == []

    def test_half_aligned_crop_found_with_two_phase_grid(self, spark):
        """r09 verdict #4 CLOSING test: a crop at offset (16, 16) — off
        the 32-px base grid but exactly on the tile/2 phase — is MISSED
        by the single-phase tile path and FOUND by the two-phase grid
        (offsets (0,0) and (16,16)): the crop's phase-0 tiles are
        byte-identical to the original's phase-16 tiles (and the crop's
        phase-16 tiles to the original's phase-0 interior), so overlap
        is exact by arithmetic. Same data, both facts asserted."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
            image_tile_near_dup_pairs,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"half-aligned", 128, 128)
        cr = self._crop(pix, 128, 16, 16, 96, 96)
        media = spark.createDataFrame(
            [
                (1, bytearray(png_enc(128, 128, 1, pix))),
                (2, bytearray(png_enc(96, 96, 1, cr))),
            ],
            "doc_id long, payload binary",
        )
        single = image_tile_near_dup_pairs(
            image_tile_dhash(media), min_match_frac=0.8
        ).collect()
        assert single == []  # the single-phase residual, same data
        two_phase = image_tile_near_dup_pairs(
            image_tile_dhash(media, phase_offsets=((0, 0), (16, 16))),
            min_match_frac=0.8,
        ).collect()
        # crop sigs: 9 phase-0 tiles (== original's phase-16 grid) + 4
        # phase-16 tiles (== original's phase-0 interior) = 13 distinct,
        # ALL matched in the original's 16 + 9 = 25-signature union
        assert [
            (r.id_a, r.id_b, r.n_matched, r.match_frac) for r in two_phase
        ] == [(1, 2, 13, 1.0)]

    def test_off_both_phases_crop_still_degrades_honestly(self, spark):
        """A crop at offset (8, 8) — off BOTH the base grid and the
        tile/2 phase — still shares no byte-identical tiles under the
        two-phase grid; the residual contract after r10 is 'crops
        congruent to 0 or tile/2 (mod tile)', not arbitrary offsets."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
            image_tile_near_dup_pairs,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"off-both", 128, 128)
        cr = self._crop(pix, 128, 8, 8, 96, 96)
        media = spark.createDataFrame(
            [
                (1, bytearray(png_enc(128, 128, 1, pix))),
                (2, bytearray(png_enc(96, 96, 1, cr))),
            ],
            "doc_id long, payload binary",
        )
        pairs = image_tile_near_dup_pairs(
            image_tile_dhash(media, phase_offsets=((0, 0), (16, 16))),
            min_match_frac=0.8,
        ).collect()
        assert pairs == []

    def test_tile_stage_passthrough_carries_columns(self, spark):
        """The tile stage now carries passthrough columns like every
        sibling signature stage (r09 advice) — the streaming dedup
        caller's event-time column must survive the Arrow stage."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"pass", 64, 64)
        media = spark.createDataFrame(
            [(1, 1234, bytearray(png_enc(64, 64, 1, pix)))],
            "doc_id long, ts long, payload binary",
        )
        rows = image_tile_dhash(media, passthrough=("ts",)).collect()
        assert len(rows) == 4 and all(r.ts == 1234 for r in rows)

    def test_unrelated_images_zero_pairs(self, spark):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
            image_tile_near_dup_pairs,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        media = spark.createDataFrame(
            [
                (i, bytearray(png_enc(128, 128, 1, self._noise(bytes([i]), 128, 128))))
                for i in range(6)
            ],
            "doc_id long, payload binary",
        )
        assert (
            image_tile_near_dup_pairs(image_tile_dhash(media)).collect()
            == []
        )

    def test_tile_pair_plan_is_equi_join_never_cartesian(self, spark):
        """The tile set-overlap chain (shared with the video gate via
        _block_rows) must candidate-generate through the block equi-join
        — never CartesianProduct / broadcast nested loop."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
            image_tile_near_dup_pairs,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        media = spark.createDataFrame(
            [
                (i, bytearray(png_enc(128, 128, 1, self._noise(bytes([i]), 128, 128))))
                for i in range(3)
            ],
            "doc_id long, payload binary",
        )
        df = image_tile_near_dup_pairs(image_tile_dhash(media))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_rgb_tile_slicing_matches_gray(self, spark):
        """Channel-stride arithmetic: an RGB image with R=G=B must
        produce the SAME tile signatures as its gray plane (the tile
        extractor slices interleaved bytes; an off-by-ch bug would
        scramble every tile)."""
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_tile_dhash,
        )
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        gray = self._noise(b"rgb-tiles", 64, 64)
        rgb = b"".join(bytes((v, v, v)) for v in gray)
        media = spark.createDataFrame(
            [
                (1, bytearray(png_enc(64, 64, 1, gray))),
                (2, bytearray(png_enc(64, 64, 3, rgb))),
            ],
            "doc_id long, payload binary",
        )
        rows = image_tile_dhash(media).collect()
        sigs = {}
        for r in rows:
            sigs.setdefault(r.doc_id, {})[r.tile_idx] = r.dhash
        assert len(sigs[1]) == 4 and sigs[1] == sigs[2]


def test_four_byte_encodings_same_luma_hash_identically():
    """The multimodal_corpus_prep gate's arithmetic: gray PNG, gray GIF,
    REVERSED-palette GIF (inverted indices + inverted palette), and RGB
    PNG with R=G=B all decode to the identical luma plane and therefore
    dHash identically, while their payload bytes all differ."""
    import hashlib

    from airflow_etl_finance_market_spark.multimodal.phash import (
        _decode_factory,
        _dhash_from_pixels,
    )

    _, png_dec, png_enc, _ = _stdlib_png_codec()
    _, gif_dec, gif_enc = _stdlib_gif_codec()
    decode = _decode_factory()
    gray_pal = [(i, i, i) for i in range(256)]
    rev_pal = [(255 - i, 255 - i, 255 - i) for i in range(256)]
    pix = bytearray()
    i = 0
    while len(pix) < 32 * 32:
        pix += hashlib.md5(b"enc4" + bytes([i])).digest()
        i += 1
    pix = bytes(pix[: 32 * 32])
    payloads = [
        png_enc(32, 32, 1, pix),
        gif_enc(32, 32, pix, gray_pal),
        gif_enc(32, 32, bytes(255 - v for v in pix), rev_pal),
        png_enc(32, 32, 3, b"".join(bytes((v, v, v)) for v in pix)),
    ]
    assert len({bytes(p) for p in payloads}) == 4  # byte-different
    hashes = {_dhash_from_pixels(*decode(p)) for p in payloads}
    assert len(hashes) == 1


class TestMirrorCanonical:
    """mirror_canonical: mirrored reposts collapse; the default path
    misses them (the closing-test pattern); rotations stay the honest
    residual."""

    def _noise(self, seed: bytes, w: int = 32, h: int = 32) -> bytes:
        import hashlib

        pix = bytearray()
        i = 0
        while len(pix) < w * h:
            pix += hashlib.md5(seed + bytes([i])).digest()
            i += 1
        return bytes(pix[: w * h])

    def _mirror(self, pix: bytes, w: int, h: int) -> bytes:
        out = bytearray()
        for y in range(h):
            row = pix[y * w : (y + 1) * w]
            out += row[::-1]
        return bytes(out)

    def _hashes(self, spark, rows, **kw):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_dhash,
        )

        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        return {
            r.doc_id: r.dhash for r in image_dhash(df, **kw).collect()
        }

    def test_mirror_collapses_canonical_misses_default(self, spark):
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"mirror fam")
        rows = [
            (1, bytearray(png_enc(32, 32, 1, pix))),
            (2, bytearray(png_enc(32, 32, 1, self._mirror(pix, 32, 32)))),
            (3, bytearray(png_enc(32, 32, 1, self._noise(b"other")))),
        ]
        default = self._hashes(spark, rows)
        assert default[1] != default[2]  # the gap the option closes
        canon = self._hashes(spark, rows, mirror_canonical=True)
        assert canon[1] == canon[2]  # EXACT collapse by arithmetic
        assert canon[1] != canon[3]  # unrelated stays apart

    def test_canonical_is_involution_stable_and_idempotent_on_symmetric(
        self, spark
    ):
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"stable")
        half = self._noise(b"sym", 16, 32)
        sym = bytearray()
        for y in range(32):
            row = half[y * 16 : (y + 1) * 16]
            sym += row + row[::-1]
        sym = bytes(sym)
        rows = [
            (1, bytearray(png_enc(32, 32, 1, pix))),
            (2, bytearray(png_enc(32, 32, 1, self._mirror(pix, 32, 32)))),
            (3, bytearray(png_enc(32, 32, 1, sym))),
        ]
        canon = self._hashes(spark, rows, mirror_canonical=True)
        # canonical of the mirror == canonical of the original (min is
        # order-free), and a left-right SYMMETRIC image is its own
        # mirror so both kernel evaluations agree
        assert canon[1] == canon[2]
        assert isinstance(canon[3], int)

    def test_vertical_flip_stays_residual(self, spark):
        from airflow_etl_finance_market_spark.multimodal.binary import (
            _stdlib_png_codec,
        )

        _, _, png_enc, _ = _stdlib_png_codec()
        pix = self._noise(b"vert")
        vflip = bytearray()
        for y in reversed(range(32)):
            vflip += pix[y * 32 : (y + 1) * 32]
        rows = [
            (1, bytearray(png_enc(32, 32, 1, pix))),
            (2, bytearray(png_enc(32, 32, 1, bytes(vflip)))),
        ]
        canon = self._hashes(spark, rows, mirror_canonical=True)
        assert canon[1] != canon[2]  # documented out-of-scope


def test_mirror_canonical_near_radius_branch_instability_pinned():
    """r11 ADVICE residual, pinned at the kernel level: canonical =
    min(h, h_flipped) compares pseudo-random 64-bit values, so two
    NEAR-dup non-mirror images (raw hashes 1 bit apart) can resolve to
    OPPOSITE branches and land on unrelated canonical signatures —
    canonical signatures are an EXACT-match tier (max_hamming=0);
    near-radius recall runs the plain kernel alongside."""
    from airflow_etl_finance_market_spark.multimodal.phash import (
        _mirror_canonical_kernel,
    )

    # 1x2 gray images: flip swaps the two bytes
    a, a_f = b"\x00\x01", b"\x01\x00"
    b_, b_f = b"\x02\x03", b"\x03\x02"
    table = {
        a: 0xFFFF_FFFF_FFFF_FFF0,    # h(A)
        a_f: 0x8123_4567_89AB_CDEF,  # h(mirror A) < h(A) -> wins
        b_: 0xFFFF_FFFF_FFFF_FFF1,   # h(B): Hamming 1 from h(A)
        b_f: 0xFFFF_0000_0000_0000,  # h(mirror B) < h(B) -> wins
    }
    canon = _mirror_canonical_kernel(lambda w, h, ch, pix: table[pix])
    ca = canon(2, 1, 1, a)
    cb = canon(2, 1, 1, b_)
    assert ca == table[a_f] and cb == table[b_f]
    # raw distance 1 bit; canonical distance is UNRELATED (here 27
    # bits) — the documented near-radius residual
    raw_d = bin(table[a] ^ table[b_]).count("1")
    canon_d = bin(ca ^ cb).count("1")
    assert raw_d == 1 and canon_d > 8
    # while the exact-collapse contract is untouched: mirror pairs
    # still canonicalize identically
    assert canon(2, 1, 1, a_f) == ca and canon(2, 1, 1, b_f) == cb


class TestRowCdcCropTier:
    """Per-row content-defined segmentation: the arbitrary-offset crop
    tier — re-sync at ANY offset (the off-both-phases case the tile
    tiers pin as honest degradation), flat-run suppression, and the
    content-defined sampling knob."""

    def _kernel(self, **kw):
        from airflow_etl_finance_market_spark.multimodal.phash import (
            _row_cdc_kernel,
        )

        return _row_cdc_kernel(**kw)

    def _family(self, seed=b"cdc fam", cx=17, cy=23):
        from airflow_etl_finance_market_spark.fixtures import (
            image_fixture_primitives,
        )

        noise_pix, crop = image_fixture_primitives()
        pix = noise_pix(seed, 128, 128)
        return pix, crop(pix, 128, cx, cy, 96, 96)

    def test_arbitrary_offset_crop_resyncs(self):
        import hashlib

        k = self._kernel()
        worst = 1.0
        for s in range(12):
            pix, cr = self._family(hashlib.md5(b"s%d" % s).digest())
            sf = {h for _, h in k(128, 128, 1, pix)}
            sc = {h for _, h in k(96, 96, 1, cr)}
            worst = min(worst, len(sf & sc) / min(len(sf), len(sc)))
        assert worst >= 0.7, worst  # measured 0.80 over 40 seeds
        # unrelated images share nothing
        pix2, _ = self._family(b"unrelated")
        s2 = {h for _, h in k(128, 128, 1, pix2)}
        assert not (sf & s2)

    def test_flat_runs_never_sign(self):
        # an all-constant image yields ZERO signatures (every segment
        # is a flat run — the promiscuous-collision guard), and a
        # half-flat image signs only its textured half
        k = self._kernel()
        assert k(64, 64, 1, b"\x80" * (64 * 64)) == []
        pix, _ = self._family(b"texture")
        mixed = pix[: 64 * 128] + b"\x00" * (64 * 128)
        sigs = {h for _, h in k(128, 128, 1, mixed)}
        top = {h for _, h in k(128, 64, 1, pix[: 64 * 128])}
        assert sigs == top

    def test_sample_bits_is_content_defined_subset(self):
        # sampling keeps a SUBSET chosen by content: both copies keep
        # the same segments, so crop overlap survives sampling
        k0, k2 = self._kernel(), self._kernel(sample_bits=2)
        pix, cr = self._family()
        full0 = {h for _, h in k0(128, 128, 1, pix)}
        full2 = {h for _, h in k2(128, 128, 1, pix)}
        assert full2 < full0 and len(full2) < len(full0) / 2
        crop2 = {h for _, h in k2(96, 96, 1, cr)}
        assert len(full2 & crop2) / min(len(full2), len(crop2)) >= 0.6

    def test_rgb_reduces_to_mean_luma(self):
        k = self._kernel()
        pix, _ = self._family(b"rgb")
        rgb = b"".join(bytes((v, v, v)) for v in pix)
        assert k(128, 128, 3, rgb) == k(128, 128, 1, pix)

    def test_cdc_finds_off_phase_crop_tile_grid_misses(self, spark):
        """The closing pair: on the SAME (17,23)-offset members the
        TWO-PHASE tile grid finds only crop↔crop (the honest
        degradation its gate documents) while the row-CDC tier finds
        all three family pairs."""
        from airflow_etl_finance_market_spark.fixtures import (
            tile_crop_family_members,
        )
        from airflow_etl_finance_market_spark.multimodal.phash import (
            image_cdc_crop_near_dup_pairs,
            image_tile_dhash,
            image_tile_near_dup_pairs,
        )

        members = tile_crop_family_members(17, 23)("off both phases")
        rows = [(k, bytearray(p)) for k, p in enumerate(members)]
        media = spark.createDataFrame(rows, "doc_id long, payload binary")
        tile_sigs = image_tile_dhash(
            media, phase_offsets=((0, 0), (16, 16))
        ).localCheckpoint()
        tile_pairs = {
            (r.id_a, r.id_b)
            for r in image_tile_near_dup_pairs(
                tile_sigs, max_hamming=4, min_match_frac=0.8
            ).collect()
        }
        assert tile_pairs == {(1, 2)}  # crop↔crop only: grid misses
        cdc_pairs = {
            (r.id_a, r.id_b)
            for r in image_cdc_crop_near_dup_pairs(media).collect()
        }
        assert cdc_pairs == {(0, 1), (0, 2), (1, 2)}
