"""Multimodal gate tier: real codec roundtrips, perceptual-hash /
tile / row-CDC image dedup, audio fingerprint tiers, video
overlap, crawl text extraction, and cross-modal corpus prep.

One CONTIGUOUS slice of the registry in REGISTRATION ORDER —
the driver-ledger contract: ``harness.py`` imports the tier
modules in sequence, so ``queries()``/``oracles()`` keep the
exact pre-split ordering (the 50-slot window membership is
pinned by tests/test_harness_window.py). Slices are cut at
registration boundaries, so a handful of entries sit with
their chronological neighbors rather than their thematic kin
— ordering is the contract, theming is the map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import (  # noqa: F401  (shared gate surface)
    fan_out,
    load_fixture,
    register,
)
from .harness_corpus import (  # noqa: F401
    _COS_SQL,
    _TOKS_SQL,
)


# ---------------------------------------------------------------------------
# Round 7: REAL image/video codec driver gates + image perceptual-hash dedup
# ---------------------------------------------------------------------------


@register(
    "multimodal_image_codec_real",
    """
SELECT COUNT(*) * 4 AS n_images,
       true AS dims_exact,
       true AS mime_ok,
       true AS pixels_ok
FROM documents
""",
)
def q_multimodal_image_codec_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-codec HARD GATE, mirroring multimodal_audio_features
    (r06 verdict #2): per document, deterministic doc-byte-derived pixels
    are encoded to real PNG (RGB), baseline JPEG (grayscale, 8x8-block
    content), GIF (grayscale palette), and WebP (VP8L lossless RGB)
    payloads, then pushed through the REAL frame path
    (extract_binary_features(use_fake_codec=False) — the stdlib codec
    tier). The oracle PREDICTS n_images = 4 x n_docs from first
    principles and pins three booleans: every decoded dimension matches
    the octet_length-derived prediction computed independently in the
    build closure (a quarantined row coalesces to false — it can't
    hide), every mime sniffs as its format, and every payload
    PIXEL-round-trips (PNG/GIF/WebP bit-exact; JPEG dims exact + mean
    abs error <= 4 on flat blocks). A regression anywhere in the four
    decoders, the PNG/GIF/WebP encoders, or the quarantine plumbing flips the
    hash red in CORRECTNESS_r{N}.json. Both stages are map-only Arrow
    passes — zero data movement at any scale."""
    from .multimodal.binary import _stdlib_png_codec, extract_binary_features
    from .multimodal.gif import _stdlib_gif_codec
    from .multimodal.jpeg import _stdlib_jpeg_codec
    from .multimodal.webp import _stdlib_webp_codec

    _, _png_dec, _png_enc, _ = _stdlib_png_codec()
    _, _jpeg_dec, _jpeg_enc = _stdlib_jpeg_codec()
    _, _gif_dec, _gif_enc = _stdlib_gif_codec()
    _, _webp_dec, _webp_enc = _stdlib_webp_codec()

    def _build(batches):
        import pandas as pd

        gray_pal = [(i, i, i) for i in range(256)]

        def variants(doc_id, text):
            data = text.encode("utf-8") or b"x"
            n = len(data)
            # PNG: RGB, arbitrary dims derived from byte length
            w = n % 24 + 8
            h = (n * 3) % 24 + 8
            rgb = bytes(data[i % n] for i in range(w * h * 3))
            png = _png_enc(w, h, 3, rgb)
            png_ok = _png_dec(png) == (w, h, 3, rgb)
            yield doc_id * 10, "png", png, w, h, bool(png_ok)
            # JPEG: grayscale, flat 8x8 blocks (block-exactness regime)
            bw, bh = n % 5 + 2, (n * 3) % 5 + 2
            jw, jh = 8 * bw, 8 * bh
            blocks = [data[i % n] for i in range(bw * bh)]
            gray = bytes(
                blocks[(y // 8) * bw + (x // 8)]
                for y in range(jh)
                for x in range(jw)
            )
            jpg = _jpeg_enc(jw, jh, 1, gray, quality=90)
            try:
                dw, dh, dch, dpix = _jpeg_dec(jpg)
                mae = sum(
                    abs(a - b) for a, b in zip(dpix, gray)
                ) / len(gray)
                jpg_ok = (dw, dh, dch) == (jw, jh, 1) and mae <= 4.0
            except Exception:
                jpg_ok = False
            yield doc_id * 10 + 1, "jpeg", jpg, jw, jh, bool(jpg_ok)
            # GIF: grayscale palette (palette-lossless round trip)
            idx = bytes(data[i % n] for i in range(w * h))
            gif = _gif_enc(w, h, idx, gray_pal)
            expect = b"".join(bytes((v, v, v)) for v in idx)
            gif_ok = _gif_dec(gif) == (w, h, 3, expect)
            yield doc_id * 10 + 2, "gif", gif, w, h, bool(gif_ok)
            # WebP: VP8L lossless RGB, third independent dims recipe
            ww = n % 20 + 4
            wh = (n * 5) % 20 + 4
            wrgb = bytes(data[(i * 3 + 1) % n] for i in range(ww * wh * 3))
            webp = _webp_enc(ww, wh, 3, wrgb)
            webp_ok = _webp_dec(webp) == (ww, wh, 3, wrgb)
            yield doc_id * 10 + 3, "webp", webp, ww, wh, bool(webp_ok)

        for pdf in batches:
            rows = [
                v
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
                for v in variants(doc_id, text)
            ]
            yield pd.DataFrame(
                {
                    "img_id": pd.Series(
                        [r[0] for r in rows], dtype="int64"
                    ),
                    "fmt": [r[1] for r in rows],
                    "payload": pd.Series(
                        [r[2] for r in rows], dtype="object"
                    ),
                    "pred_w": pd.Series(
                        [r[3] for r in rows], dtype="int32"
                    ),
                    "pred_h": pd.Series(
                        [r[4] for r in rows], dtype="int32"
                    ),
                    "pix_ok": pd.Series(
                        [r[5] for r in rows], dtype="bool"
                    ),
                }
            )

    docs = fan_out(load_fixture(spark, sf_dir, "documents"), "doc_id")
    media = docs.select("doc_id", "text").mapInPandas(
        _build,
        "img_id long, fmt string, payload binary, "
        "pred_w int, pred_h int, pix_ok boolean",
    )
    # derived frame feeds TWO consumers (real decode + prediction join):
    # checkpoint so the per-document encodes run once (house rule for
    # derived-frame reuse)
    media = media.localCheckpoint(eager=False)
    feats = extract_binary_features(
        media.select(F.col("img_id").alias("doc_id"), "payload"),
        use_fake_codec=False,
    )
    joined = feats.join(
        media.select("img_id", "fmt", "pred_w", "pred_h", "pix_ok"),
        feats["doc_id"] == F.col("img_id"),
    )
    row = joined.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min(
            F.coalesce(
                (F.col("width") == F.col("pred_w"))
                & (F.col("height") == F.col("pred_h")),
                F.lit(False),
            )
        ).alias("dims_exact"),
        F.min(
            F.coalesce(
                F.col("mime") == F.concat(F.lit("image/"), F.col("fmt")),
                F.lit(False),
            )
        ).alias("mime_ok"),
        F.min("pix_ok").alias("pixels_ok"),
    ).first()
    return spark.createDataFrame(
        [tuple(row)],
        "n_images long, dims_exact boolean, "
        "mime_ok boolean, pixels_ok boolean",
    )


@register(
    "multimodal_video_frames_real",
    """
SELECT doc_id,
       CAST((greatest(octet_length(encode(text)), 1) % 7 + 3) // 2 AS BIGINT)
           AS n_sampled,
       true AS shas_exact
FROM documents
""",
)
def q_multimodal_video_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-frame-sampling HARD GATE (r06 verdict #2): per
    document, octet_length(text) % 7 + 2 real baseline-JPEG frames are
    packed into a real MJPEG-in-AVI container, and
    sample_frames(use_fake_codec=False) walks the RIFF/movi structure,
    emitting every 2nd frame. The oracle PREDICTS the per-document
    sampled-frame count ceil(n_frames / 2) from the same byte-length
    arithmetic — a PER-ROW prediction, stronger than a summary boolean —
    and ``shas_exact`` pins BYTE-EXACT extraction: the sha16 multiset of
    the walker's output must equal the sha16s of the exact JPEG payloads
    the builder packed at the sampled indices (computed independently in
    the build closure). A mis-parsed chunk boundary, off-by-one stride,
    or padding-byte leak flips the hash red. Builder and walker are both
    map-only Arrow passes; the verify side is one groupBy on doc_id."""
    from .multimodal.binary import sample_frames
    from .multimodal.jpeg import _stdlib_jpeg_codec
    from .multimodal.video import _stdlib_avi_codec

    _, _, _jpeg_enc = _stdlib_jpeg_codec()
    _, _, _avi_enc = _stdlib_avi_codec()

    def _build(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, payloads, exp = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") or b"x"
                n_frames = len(data) % 7 + 2
                frames = [
                    _jpeg_enc(
                        16, 16, 1,
                        bytes([data[j % len(data)]]) * 256,
                        quality=90,
                    )
                    for j in range(n_frames)
                ]
                ids.append(doc_id)
                payloads.append(_avi_enc(frames, fps=10, width=16, height=16))
                exp.append(
                    [
                        hashlib.sha256(frames[j]).hexdigest()[:16]
                        for j in range(0, n_frames, 2)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "exp_shas": pd.Series(exp, dtype="object"),
                }
            )

    docs = fan_out(load_fixture(spark, sf_dir, "documents"), "doc_id")
    media = docs.select("doc_id", "text").mapInPandas(
        _build, "doc_id long, payload binary, exp_shas array<string>"
    )
    # two consumers (frame walk + expected-sha join): encode once
    media = media.localCheckpoint(eager=False)
    sampled = sample_frames(
        media.select("doc_id", "payload"),
        every_n=2,
        use_fake_codec=False,
    )
    got = sampled.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sort_array(F.collect_list("frame_sha16")).alias("got_shas"),
    )
    return (
        got.join(media.select("doc_id", "exp_shas"), "doc_id")
        .select(
            "doc_id",
            "n_sampled",
            (
                F.col("got_shas") == F.array_sort(F.col("exp_shas"))
            ).alias("shas_exact"),
        )
    )


@register(
    "video_near_dups",
    """
SELECT COUNT(*) * 2 AS n_videos,
       COUNT(*) AS n_pairs,
       true AS pairs_within_family,
       true AS full_overlap
FROM documents
WHERE doc_id % 11 = 5
""",
)
def q_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO-level near-dup via frame-hash set overlap
    (multimodal/phash.py video_frame_dhash ∘ video_near_dup_pairs):
    every 11th document seeds a 2-member planted video family — 5
    MJPEG/AVI frames of 72x64 block-grid pixels (the dHash gate's
    >=32-luma-margin construction, seed varying per frame), video B
    re-encoding the SAME frames with sub-margin +-4 luma noise (byte-
    different, gradient-sign-identical, so each frame pair hashes
    EQUAL). The walk+decode+dHash all happen in one map-only Arrow
    stage (8 bytes out per frame, raw frames never shuffled); pairs
    come from the pigeonhole block equi-join keyed on video ids, and
    the match FRACTION threshold absorbs any single-frame collision —
    a cross-family frame match contributes at most 1/5 < 0.8. The
    oracle PREDICTS the outcome: 2n videos hashed, the near-dup pair
    set is exactly the n planted (A, B) pairs, every pair within
    family at full overlap (match_frac == 1)."""
    from .multimodal.phash import video_frame_dhash, video_near_dup_pairs

    _LEVELS = [16, 48, 80, 112, 144, 176, 208, 240]

    def _build(batches):
        import hashlib

        import pandas as pd

        gw, gh, blk = 9, 8, 8

        def base_pixels(seed: bytes) -> bytearray:
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
            return pix

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.md5(text.encode("utf-8")).digest()
                frames_a, frames_b = [], []
                for fi in range(5):
                    pix = base_pixels(seed + bytes([fi]))
                    frames_a.append(
                        _jpeg_enc(gw * blk, gh * blk, 1, bytes(pix), quality=90)
                    )
                    noisy = bytearray(pix)
                    for t in range(4):
                        p = hashlib.md5(seed + bytes([fi, 128 + t])).digest()
                        pos = (p[0] % (gh * blk)) * gw * blk + p[1] % (gw * blk)
                        noisy[pos] = max(
                            0, min(255, noisy[pos] + (p[2] % 9) - 4)
                        )
                    frames_b.append(
                        _jpeg_enc(
                            gw * blk, gh * blk, 1, bytes(noisy), quality=90
                        )
                    )
                ids.append(doc_id * 10)
                payloads.append(_avi_enc(frames_a, fps=10, width=72, height=64))
                ids.append(doc_id * 10 + 1)
                payloads.append(_avi_enc(frames_b, fps=10, width=72, height=64))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    from .multimodal.jpeg import _stdlib_jpeg_codec
    from .multimodal.video import _stdlib_avi_codec

    _, _, _jpeg_enc = _stdlib_jpeg_codec()
    _, _, _avi_enc = _stdlib_avi_codec()

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 11 == 5
        ),
        "doc_id",
    )
    n_docs = docs.count()
    media = docs.select("doc_id", "text").mapInPandas(
        _build, "doc_id long, payload binary"
    )
    # the signature frame feeds the count AND the pair self-join: eager
    # checkpoint so encode+walk+decode+hash runs exactly once
    sigs = video_frame_dhash(media).localCheckpoint()
    n_videos = sigs.select("video_id").distinct().count()
    pairs = video_near_dup_pairs(sigs, max_hamming=4, min_match_frac=0.8)
    row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(
            (F.col("video_a") / 10).cast("long")
            == (F.col("video_b") / 10).cast("long")
        ).alias("within"),
        F.min(F.col("match_frac") == 1.0).alias("full"),
    ).first()
    return spark.createDataFrame(
        [
            (
                n_videos,
                row["n_pairs"],
                bool(row["within"]) if row["within"] is not None else False,
                bool(row["full"]) if row["full"] is not None else False,
            )
        ],
        "n_videos long, n_pairs long, pairs_within_family boolean, "
        "full_overlap boolean",
    )


def _family_media_builder(members):
    """``mapInPandas`` closure for the planted 3-member media families:
    ``(doc_id, text)`` -> ``(doc_id*10 + k, payload)`` for each family
    member ``k``. ``members`` is a fixtures.py factory PRODUCT, so the
    closure ships self-contained to bare workers (the pickle house
    rule)."""

    def _build(batches):
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for k, payload in enumerate(members(text)):
                    ids.append(doc_id * 10 + k)
                    payloads.append(payload)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return _build


def _family_pair_outcome(fps, *, sig_col, n_docs, max_hamming=4):
    """Shared verdict aggregate for every planted 3-member-family media
    gate: run the block-LSH pair stage over the (already checkpointed)
    signature frame and reduce to the 4-tuple the oracles predict —
    ``(n_items, n_pairs, pairs_within_family, families_fully_paired)``
    with family = id div 10. Hoisted r11 from four near-identical gate
    bodies when the dHash/DCT and raw/normalized-audio gate pairs were
    merged (registry-headroom work, r10 verdict #1)."""
    from .multimodal.phash import hamming_near_pairs

    n_items = fps.count()
    fam = hamming_near_pairs(
        fps, sig_col=sig_col, max_hamming=max_hamming
    ).select(
        (F.col("id_a") / 10).cast("long").alias("fam_a"),
        (F.col("id_b") / 10).cast("long").alias("fam_b"),
    )
    per_fam = fam.groupBy("fam_a").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.col("fam_a") == F.col("fam_b")).alias("within"),
    )
    row = per_fam.agg(
        F.sum("cnt").alias("n_pairs"),
        F.min("within").alias("within"),
        (
            F.min((F.col("cnt") == 3) & F.col("within"))
            & (F.count(F.lit(1)) == F.lit(n_docs))
        ).alias("fully"),
    ).first()
    return n_items, row["n_pairs"], row["within"], row["fully"]


@register(
    "image_phash_multi_near_dups",
    """
SELECT 'dct' AS variant,
       COUNT(*) * 3 AS n_images,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 7 = 3
UNION ALL
SELECT 'dhash' AS variant,
       COUNT(*) * 3 AS n_images,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 5 = 0
""",
)
def q_image_phash_multi_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IMAGE near-dup through BOTH perceptual-hash kernels in ONE gate
    — the r10 verdict's registry-headroom merge of
    ``image_phash_near_dups`` (r06) + ``image_phash_dct_near_dups``
    (r07); every assertion of both retired gates survives as one
    variant row here, and both kernels still ride the SAME
    hamming_near_pairs block-LSH.

    Variant 'dhash' (multimodal/phash.py image_dhash — decode -> luma
    -> 9x8 gradient-sign hash): every 5th document seeds a 3-member
    family (72x64 block-grid PNG / baseline JPEG q90 / GIF of the 2x
    nearest upscale; fixtures.dhash_family_members) — byte-different,
    pixel-similar, with adjacent blocks >= 32 luma apart so every
    gradient sign survives codec noise.

    Variant 'dct' (image_phash_dct — luma -> 32x32 area-average ->
    orthonormal 2-D DCT -> 63 median-sign bits): every 7th document
    seeds a family EXACT BY ARITHMETIC (gray PNG / GIF palette
    re-encode of identical pixels / PNG of the 2x nearest upscale,
    which area-averages back to the same raster;
    fixtures.dct_family_members).

    The oracle PREDICTS both outcomes from first principles: 3n images
    hash per variant (a quarantine shrinks the count), the verified
    pair set is exactly the 3 within-family pairs per family, none
    cross-family. Hash stages are map-only Arrow; the pair stage is
    the 64k-bucket block equi-join + bit_count verify — never
    all-pairs. JPEG robustness of the DCT kernel (not provable, only
    measurable) stays pinned empirically in tests/test_phash.py."""
    from .fixtures import dct_family_members, dhash_family_members
    from .multimodal.phash import image_dhash, image_phash_dct

    rows = []
    for variant, mod, rem, members, hash_fn, sig_col in (
        ("dhash", 5, 0, dhash_family_members(), image_dhash, "dhash"),
        ("dct", 7, 3, dct_family_members(), image_phash_dct, "phash"),
    ):
        docs = fan_out(
            load_fixture(spark, sf_dir, "documents").filter(
                F.col("doc_id") % mod == rem
            ),
            "doc_id",
        )
        n_docs = docs.count()
        media = docs.select("doc_id", "text").mapInPandas(
            _family_media_builder(members), "doc_id long, payload binary"
        )
        # the hash frame feeds the count AND the LSH self-join: eager
        # checkpoint so the pure-Python decode + hash runs exactly once
        fps = hash_fn(media).localCheckpoint()
        rows.append(
            (variant,)
            + _family_pair_outcome(
                fps, sig_col=sig_col, n_docs=n_docs, max_hamming=4
            )
        )
    return spark.createDataFrame(
        rows,
        "variant string, n_images long, n_pairs long, "
        "pairs_within_family boolean, families_fully_paired boolean",
    )


@register(
    "audio_multi_near_dups",
    """
SELECT 'norm' AS variant,
       COUNT(*) * 3 AS n_clips,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 6 = 2
UNION ALL
SELECT 'raw' AS variant,
       COUNT(*) * 3 AS n_clips,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 9 = 4
""",
)
def q_audio_multi_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-dup through BOTH ingest pipelines in ONE gate — the
    r10 verdict's registry-headroom merge of ``audio_near_dups`` (r08)
    + ``audio_norm_near_dups`` (r09); every assertion of both retired
    gates survives as one variant row here, and both pipelines still
    feed the SAME banded spectral-energy sign fingerprint
    (multimodal/audio.py audio_fingerprints — the Haitsma-Kalker
    shape) and the SAME hamming_near_pairs block-LSH.

    Variant 'raw' (same-rate RE-ENCODE axis): every 9th document seeds
    a 3-member family on the 8-BIT LATTICE (mono PCM16 / stereo
    channel-dup PCM16 / mono PCM8; fixtures.wav_family_members) — all
    three decode to the same sample stream, so fingerprints collide at
    Hamming 0 by arithmetic while cross-family sits near
    Binomial(64, 1/2).

    Variant 'norm' (cross-RATE axis, where raw fingerprints drift past
    the Hamming-4 radius — measured 5 bits, pinned in pytest): every
    6th document seeds a family at 8/16/24 kHz by sample replication
    (fixtures.wav_rate_family_members); nearest k*r -> r downsampling
    inverts the replication bit-for-bit, so normalize-then-fingerprint
    (resample_audio to 8 kHz first) is exact.

    The oracle PREDICTS both outcomes: 3n clips fingerprinted per
    variant, exactly the 3 within-family pairs per family, none
    cross-family. Both stages are map-only Arrow; the pair stage is
    the shared pigeonhole equi-join. Resample robustness on real
    signals (not provable, only measurable) stays pinned empirically
    in tests/test_audio.py."""
    from .fixtures import wav_family_members, wav_rate_family_members
    from .multimodal.audio import audio_fingerprints, resample_audio

    rows = []
    for variant, mod, rem, members, normalize in (
        ("raw", 9, 4, wav_family_members(), False),
        ("norm", 6, 2, wav_rate_family_members(), True),
    ):
        docs = fan_out(
            load_fixture(spark, sf_dir, "documents").filter(
                F.col("doc_id") % mod == rem
            ),
            "doc_id",
        )
        n_docs = docs.count()
        media = docs.select("doc_id", "text").mapInPandas(
            _family_media_builder(members), "doc_id long, payload binary"
        )
        if normalize:
            media = resample_audio(media, target_rate=8000).select(
                "doc_id", "payload"
            )
        # n_clips counts the POST-normalize POST-fingerprint frame (a
        # quarantine at either stage shrinks it); eager checkpoint so
        # the WAV decode (+resample) + FFT runs exactly once before
        # the count AND the LSH self-join
        fps = audio_fingerprints(media).localCheckpoint()
        rows.append(
            (variant,)
            + _family_pair_outcome(
                fps, sig_col="afp", n_docs=n_docs, max_hamming=4
            )
        )
    return spark.createDataFrame(
        rows,
        "variant string, n_clips long, n_pairs long, "
        "pairs_within_family boolean, families_fully_paired boolean",
    )


@register(
    "doc_paragraph_dedup",
    """
WITH pages AS (
    SELECT doc_id,
           'SUBSCRIBE to our newsletter today' || chr(10) || chr(10)
           || text || chr(10) || chr(10)
           || 'copyright 2024 all rights reserved' AS page
    FROM documents WHERE doc_id % 9 = 1
), split AS (
    SELECT doc_id, string_split(page, chr(10) || chr(10)) AS parts
    FROM pages
), paras AS (
    SELECT doc_id, i.i - 1 AS pos, parts[i.i] AS para
    FROM split, unnest(generate_series(1, len(parts))) AS i(i)
), ranked AS (
    SELECT doc_id, pos, para,
           ROW_NUMBER() OVER (
               PARTITION BY para ORDER BY doc_id, pos
           ) AS rn
    FROM paras
)
SELECT doc_id,
       string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text,
       COUNT(*) AS n_paras_kept
FROM ranked WHERE rn = 1
GROUP BY doc_id
""",
)
def q_doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAGRAPH-level dedup with REASSEMBLY (r10 — the Dolma recipe):
    boilerplate repeats across pages at paragraph granularity, below
    document dedup (the whole texts differ) and above span stats
    (which only report, never rewrite). Every 9th document becomes a
    synthetic page — a shared SUBSCRIBE banner, the document body, a
    shared copyright footer — and operators/corpus.paragraph_dedup
    keeps each distinct paragraph's globally FIRST occurrence
    (doc id, then position), reassembling survivors in order: the
    first selected document keeps all three paragraphs, every other
    page keeps only its own body (and documents whose fixture text is
    an exact duplicate lose that too — the planted exact-dup structure
    gives the gate real cross-doc body collisions, not just the
    banners). The oracle replays split/rank/reassemble verbatim
    (ROW_NUMBER over paragraph, string_agg ORDER BY position), so an
    off-by-one in position order, a wrong winner, a dropped separator,
    or an undropped empty document all hash-mismatch. Plan: one
    generate + one hash-keyed window + one id-keyed aggregate — the
    corpus shuffles once, the Dolma shape at 100 TB."""
    from .operators.corpus import paragraph_dedup

    pages = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 9 == 1
        ),
        "doc_id",
    ).select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.lit("SUBSCRIBE to our newsletter today"),
            F.col("text"),
            F.lit("copyright 2024 all rights reserved"),
        ).alias("text"),
    )
    return paragraph_dedup(pages)


@register(
    "html_text_extract",
    """
WITH expected AS (
    SELECT doc_id,
           trim(regexp_replace(
               'Doc ' || CAST(doc_id AS VARCHAR)
               || ' Doc ' || CAST(doc_id AS VARCHAR)
               || ' ' || replace(text, 'and', '&')
               || ' Home About',
               '\\s+', ' ', 'g')) AS text
    FROM documents WHERE doc_id % 7 = 5
)
SELECT doc_id, text, length(text) AS n_chars FROM expected
""",
)
def q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEB-CORPUS BOILERPLATE EXTRACTION (r10): HTML → training text as
    one pure-Catalyst chain (functions/text.html_to_text — script/style
    elements dropped WHOLESALE including their '<'-bearing payloads,
    comments dropped, tags stripped to spaces, entities unescaped
    after stripping with &amp; last, whitespace collapsed). The one
    crawl-prep stage the text tier lacked: every published pipeline
    (C4, Gopher, RefinedWeb, Dolma) starts here. Every 7th document is
    wrapped in a deterministic full page (title/script/style/h1/
    entity-escaped body/nav list/comment) and the oracle derives the
    expected text FROM THE CONSTRUCTION, not from the chain: the page
    is built from known parts, so the expected output is the direct
    concatenation 'Doc N  Doc N  <body with and->&>  Home About'
    whitespace-collapsed — an INDEPENDENT formulation (r11, replacing
    the r10 replayed-chain oracle the verdict flagged as a shared
    blindspot: both sides wrong identically would have passed). A
    missed script payload, a glued word at a block boundary, an
    entity decoded before tag-stripping, an entity-ordering bug
    (&amp; before the others), or a whitespace-collapse drift now
    all diverge from construction truth. The construction assumes
    the fixture corpus is markup-free (verified: no '<'/'>'/'&' in
    documents.text at any SF). Map-only, codegen, zero shuffles —
    the 100 TB posture for a per-document string stage."""
    from .functions.text import html_to_text

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 7 == 5
        ),
        "doc_id",
    )
    html = F.concat(
        F.lit('<html><head><title>Doc '),
        F.col("doc_id").cast("string"),
        F.lit(
            '</title><script type="text/javascript">var x = 1 < 2 '
            '&& "a&b";</script><style>.nav { color: red; }</style>'
            "</head><body><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.replace(F.col("text"), F.lit("and"), F.lit("&amp;")),
        F.lit(
            '</p><div id="nav"><ul><li>Home</li><li>About</li></ul>'
            "</div><!-- footer --></body></html>"
        ),
    )
    extracted = html_to_text(html).alias("text")
    return docs.select("doc_id", extracted).select(
        "doc_id", "text", F.length("text").alias("n_chars")
    )


#: The c4_line_filter gate's planted page: boilerplate lines that each
#: trip exactly one C4 line rule, the document body flattened to one
#: terminated line, three guaranteed full sentences, and a per-doc
#: page-level payload (lorem-ipsum / curly-brace / clean) chosen by
#: doc_id % 3. The oracle rebuilds the page identically and replays
#: the published line rules verbatim (the gopher_quality_flags
#: pattern); per-rule single-line behavior is pinned independently in
#: tests/test_corpus_ops.py.
_C4_PAGE_LINES_SQL = """
'Home | About | Contact' || chr(10) ||
'Please enable Javascript to view the comments.' || chr(10) ||
'This site uses cookies to improve your browsing experience.' || chr(10) ||
'Ok.' || chr(10) ||
regexp_replace(text, '\\s+', ' ', 'g') || '.' || chr(10) ||
'This is a perfectly normal first sentence for the page.' || chr(10) ||
'Here is another complete sentence with enough words.' || chr(10) ||
'Finally a third full sentence closes the page nicely.' || chr(10) ||
CASE WHEN doc_id % 3 = 0
     THEN 'lorem ipsum dolor sit amet is boilerplate filler text.'
     WHEN doc_id % 3 = 1 THEN 'function f() { return 1; }'
     ELSE 'A closing remark rounds out the document body.' END
"""


@register(
    "c4_line_filter",
    f"""
WITH pages AS (
    SELECT doc_id, {_C4_PAGE_LINES_SQL} AS page
    FROM documents WHERE doc_id % 11 = 6
), l AS (
    SELECT doc_id, page,
           list_transform(string_split(page, chr(10)),
                          x -> trim(x)) AS lines
    FROM pages
), k AS (
    SELECT doc_id, page, lines,
           list_filter(lines, t ->
               regexp_matches(t, '[.!?"”]$')
               AND len(regexp_split_to_array(t, '\\s+')) >= 5
               AND NOT contains(lower(t), 'javascript')
               AND NOT (contains(lower(t), 'terms of use')
                    OR contains(lower(t), 'privacy policy')
                    OR contains(lower(t), 'cookie policy')
                    OR contains(lower(t), 'uses cookies')
                    OR contains(lower(t), 'use of cookies')
                    OR contains(lower(t), 'use cookies'))) AS kept
    FROM l
), agg AS (
    SELECT doc_id,
           array_to_string(kept, chr(10)) AS text,
           len(lines) AS n_lines,
           len(kept) AS n_lines_kept,
           len(list_filter(lines, t ->
               NOT regexp_matches(t, '[.!?"”]$'))) AS n_no_terminal_punct,
           len(list_filter(lines, t ->
               len(regexp_split_to_array(t, '\\s+')) < 5)) AS n_short_lines,
           len(list_filter(lines, t ->
               contains(lower(t), 'javascript'))) AS n_javascript_lines,
           len(list_filter(lines, t ->
               contains(lower(t), 'terms of use')
               OR contains(lower(t), 'privacy policy')
               OR contains(lower(t), 'cookie policy')
               OR contains(lower(t), 'uses cookies')
               OR contains(lower(t), 'use of cookies')
               OR contains(lower(t), 'use cookies'))) AS n_policy_lines,
           len(regexp_extract_all(array_to_string(kept, chr(10)),
                                  '[.!?]+')) AS n_sentences,
           contains(lower(page), 'lorem ipsum') AS has_lorem_ipsum,
           contains(page, '{{') AS has_brace
    FROM k
)
SELECT doc_id, text,
       CAST(n_lines AS INT) AS n_lines,
       CAST(n_lines_kept AS INT) AS n_lines_kept,
       CAST(n_no_terminal_punct AS INT) AS n_no_terminal_punct,
       CAST(n_short_lines AS INT) AS n_short_lines,
       CAST(n_javascript_lines AS INT) AS n_javascript_lines,
       CAST(n_policy_lines AS INT) AS n_policy_lines,
       CAST(n_sentences AS INT) AS n_sentences,
       has_lorem_ipsum, has_brace,
       (n_sentences >= 3 AND NOT has_lorem_ipsum AND NOT has_brace)
           AS keep
FROM agg
""",
)
def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 LINE-LEVEL QUALITY FILTERING (r11 — the r10 verdict's What's
    missing #3): the published single-doc boilerplate stage between
    html_to_text and the Gopher bundle
    (operators/corpus.c4_line_quality — Raffel et al. 2020 §2.2 line
    rules: terminal punctuation, >= 5 words, no javascript mention, no
    policy-boilerplate substring; page rules: lorem ipsum, curly
    brace, >= 3 sentences in the retained text). Every 11th document
    becomes a synthetic page of planted boilerplate lines (each
    tripping exactly one line rule), the flattened document body, and
    three guaranteed sentences, with a page-level payload cycling
    clean / lorem-ipsum / curly-brace by doc_id % 3 — so the gate
    exercises every rule in BOTH directions on every driver run. The
    oracle rebuilds the page and replays the published rules verbatim
    (per the r10 html precedent, per-rule single-line truth is pinned
    independently in pytest). Map-only, one projection, no shuffle —
    the 100 TB posture for a per-document string stage."""
    from .operators.corpus import c4_line_quality

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 11 == 6
        ),
        "doc_id",
    )
    page = F.concat_ws(
        "\n",
        F.lit("Home | About | Contact"),
        F.lit("Please enable Javascript to view the comments."),
        F.lit(
            "This site uses cookies to improve your browsing experience."
        ),
        F.lit("Ok."),
        F.concat(
            F.regexp_replace(F.col("text"), r"\s+", " "), F.lit(".")
        ),
        F.lit("This is a perfectly normal first sentence for the page."),
        F.lit("Here is another complete sentence with enough words."),
        F.lit("Finally a third full sentence closes the page nicely."),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit(
                "lorem ipsum dolor sit amet is boilerplate filler text."
            ),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("function f() { return 1; }"))
        .otherwise(
            F.lit("A closing remark rounds out the document body.")
        ),
    )
    return c4_line_quality(docs.select("doc_id", page.alias("text")))


@register(
    "media_pair_bucket_audit",
    """
WITH sigs AS (
    SELECT DISTINCT doc_id,
           CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS sig
    FROM documents WHERE doc_id % 5 = 3
), blocks AS (
    SELECT 0 AS block_idx, (sig % 4096) AS block_val FROM sigs
    UNION ALL SELECT 1, (sig // 4096) % 4096 FROM sigs
    UNION ALL SELECT 2, (sig // 16777216) % 4096 FROM sigs
    UNION ALL SELECT 3, (sig // 68719476736) % 4096 FROM sigs
    UNION ALL SELECT 4, (sig // 281474976710656) % 65536 FROM sigs
), buckets AS (
    SELECT block_idx, block_val, COUNT(*) AS sz
    FROM blocks GROUP BY block_idx, block_val
)
SELECT (SELECT COUNT(*) FROM sigs) AS n_items,
       COUNT(*) AS n_buckets,
       MAX(sz) AS max_bucket,
       ROUND(AVG(sz), 6) AS avg_bucket,
       CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs,
       true AS stats_match_join
FROM buckets
""",
)
def q_media_pair_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The block-LSH PAIR-JOIN COST AUDIT, oracle-gated (r10 — the
    instrument the 100 TB media-dedup posture stands on): before a
    large pair job, ``block_bucket_stats`` prices the candidate join
    from one 8-byte-keyed aggregation. This gate verifies BOTH halves
    of that claim: (a) the bucket accounting itself against a full SQL
    replay of the 5-block split (12/12/12/12/16 bits — remainder
    widens the LAST block, the ``_block_rows`` convention) over a
    portable 60-bit md5 signature, and (b) the accounting IDENTITY —
    ``candidate_pairs`` must equal the ACTUAL ball-0 candidate join's
    row count, computed live by running ``_block_candidates`` on the
    same signatures (``stats_match_join`` flips to false if the stats
    query and the join it prices ever drift apart; measured exact at
    150k images and 200k audio windows, bench.py r10 notes). The md5
    signature is the repo's established engine-portable hash
    (operators/dedup.py:61 pattern), so the oracle replays bucket
    sizes bit-for-bit."""
    from .multimodal.phash import _block_candidates, block_bucket_stats

    sigs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 5 == 3
        ),
        "doc_id",
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("sig"),
    )
    row = block_bucket_stats(
        sigs, id_col="doc_id", sig_col="sig", max_hamming=4
    ).first()
    joined = _block_candidates(
        sigs.select(F.col("doc_id").alias("id"), "sig"),
        n_blocks=5,
        n_bits=64,
    ).count()
    return spark.createDataFrame(
        [
            (
                row["n_items"],
                row["n_buckets"],
                row["max_bucket"],
                float(row["avg_bucket"]),
                row["candidate_pairs"],
                int(row["candidate_pairs"]) == joined,
            )
        ],
        "n_items long, n_buckets long, max_bucket long, "
        "avg_bucket double, candidate_pairs long, "
        "stats_match_join boolean",
    )


@register(
    "audio_trim_multi_near_dups",
    """
SELECT 'window' AS variant,
       COUNT(*) * 3 AS n_clips,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 14 = 9
UNION ALL
SELECT 'cdc' AS variant,
       COUNT(*) * 3 AS n_clips,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 13 = 11
""",
)
def q_audio_trim_multi_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRIM-robust audio near-dup through BOTH segmentation tiers in
    ONE gate — the r12 registry-headroom merge of
    ``audio_window_trim_near_dups`` (r09) + ``audio_cdc_trim_near_dups``
    (r11), the image_phash_multi precedent applied to audio: every
    assertion of both retired gates survives as one variant row, and
    both tiers still ride the SAME set-overlap pair machinery.
    RETIREMENT RATIONALE: the two gates exercised the same
    fixture-family → fingerprint-stage → block-join → per-family-verdict
    pipeline differing ONLY in the segmentation kernel and trim
    lattice; merging pins both kernels under one hash per round instead
    of two ledger rows, funding the r12 growth (token budget, row-CDC,
    mirror, gain-CDC gates) per the pair-growth-with-retirements rule.

    Variant 'window' (audio_window_fingerprints ∘
    audio_window_near_dup_pairs): every 14th document seeds the 3-member
    WINDOW-ALIGNED trim family (fixtures.wav_trim_family_members — drop
    the first 2000-sample window; surviving windows byte-identical BY
    ARITHMETIC, overlap 1.0, threshold 0.8).

    Variant 'cdc' (audio_cdc_fingerprints ∘ the same pair machinery):
    every 13th document seeds the 3-member ARBITRARY-offset trim family
    (fixtures.wav_cdc_trim_family_members — 1234 front / 777 back, OFF
    the window grid; the exact case the window tier pins as honest
    degradation in tests, re-synced by Gear content anchors; measured
    worst overlap 0.83 over 120 seeds, threshold 0.5).

    The oracle PREDICTS both outcomes from the construction: 3n clips
    per variant, exactly 3 within-family pairs per family, none
    cross-family. Both signature stages map-only Arrow; each pair
    stage is the ONE shared block-bounded equi-join."""
    from .fixtures import (
        wav_cdc_trim_family_members,
        wav_trim_family_members,
    )
    from .multimodal.audio import (
        audio_cdc_fingerprints,
        audio_window_fingerprints,
        audio_window_near_dup_pairs,
    )

    rows = []
    for variant, mod, rem, members, fp_stage, frac in (
        ("window", 14, 9, wav_trim_family_members(),
         audio_window_fingerprints, 0.8),
        ("cdc", 13, 11, wav_cdc_trim_family_members(),
         audio_cdc_fingerprints, 0.5),
    ):
        media = fan_out(
            load_fixture(spark, sf_dir, "documents").filter(
                F.col("doc_id") % mod == rem
            ),
            "doc_id",
        ).select("doc_id", "text")
        n_docs = media.count()
        media = media.mapInPandas(
            _family_media_builder(members), "doc_id long, payload binary"
        )
        # the segment frame feeds the count AND the overlap self-join:
        # eager checkpoint so decode + per-window/segment FFTs run once
        sigs = fp_stage(media).localCheckpoint()
        n_clips = sigs.select("doc_id").distinct().count()
        fam = audio_window_near_dup_pairs(
            sigs, max_hamming=4, min_match_frac=frac
        ).select(
            (F.col("id_a") / 10).cast("long").alias("fam_a"),
            (F.col("id_b") / 10).cast("long").alias("fam_b"),
        )
        per_fam = fam.groupBy("fam_a").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.col("fam_a") == F.col("fam_b")).alias("within"),
        )
        row = per_fam.agg(
            F.sum("cnt").alias("n_pairs"),
            F.min("within").alias("within"),
            (
                F.min((F.col("cnt") == 3) & F.col("within"))
                & (F.count(F.lit(1)) == F.lit(n_docs))
            ).alias("fully"),
        ).first()
        rows.append(
            (variant, n_clips, row["n_pairs"], row["within"], row["fully"])
        )
    return spark.createDataFrame(
        rows,
        "variant string, n_clips long, n_pairs long, "
        "pairs_within_family boolean, families_fully_paired boolean",
    )


@register(
    "image_tile_multi_crop_near_dups",
    """
SELECT 'aligned' AS variant,
       COUNT(*) * 3 AS n_images,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 13 = 6
UNION ALL
SELECT 'phase' AS variant,
       COUNT(*) * 3 AS n_images,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 15 = 8
""",
)
def q_image_tile_multi_crop_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CROP-tolerant image near-dup through BOTH tile-grid
    configurations in ONE gate — the r12 registry-headroom merge of
    ``image_tile_crop_near_dups`` (r08) + ``image_tile_phase_crop_
    near_dups`` (r09): every assertion of both retired gates survives
    as one variant row; same kernel (image_tile_dhash), same pair
    machinery (image_tile_near_dup_pairs), differing ONLY in
    phase_offsets and the planted crop offset. RETIREMENT RATIONALE:
    the pair always moved together (one tile kernel feeds both), the
    merge pins single-phase AND two-phase recovery under one hash per
    round, and it funds the r12 growth per the
    pair-growth-with-retirements rule; the arbitrary-offset case both
    tiers degrade on is now covered by the row-CDC gate
    (image_cdc_crop_near_dups), completing the crop lattice:
    aligned / half-phase / ANY offset.

    Variant 'aligned': every 13th document seeds the TILE-ALIGNED
    3-member family (fixtures.tile_crop_family_members — 96x96 crop at
    (32, 32); surviving tiles byte-identical BY ARITHMETIC), single
    (0, 0) phase.

    Variant 'phase': every 15th document seeds the HALF-tile family
    (crop at (16, 16) — off the base grid, exactly on the tile/2
    phase), hashed on TWO interleaved grids (phase_offsets=((0, 0),
    (16, 16))): the crop's phase-0 tiles are byte-identical to the
    original's phase-16 tiles and vice versa — exactly 2x hash cost,
    pair machinery unchanged.

    The oracle PREDICTS both outcomes: 3n images per variant, exactly
    3 within-family pairs per family, none cross-family. Off-BOTH-
    phases crops remain pinned as this tier's honest degradation in
    tests/test_phash.py — and recovered by the row-CDC tier."""
    from .fixtures import tile_crop_family_members
    from .multimodal.phash import (
        image_tile_dhash,
        image_tile_near_dup_pairs,
    )

    rows = []
    for variant, mod, rem, members, phases in (
        ("aligned", 13, 6, tile_crop_family_members(), ((0, 0),)),
        ("phase", 15, 8, tile_crop_family_members(16, 16),
         ((0, 0), (16, 16))),
    ):
        docs = fan_out(
            load_fixture(spark, sf_dir, "documents").filter(
                F.col("doc_id") % mod == rem
            ),
            "doc_id",
        )
        n_docs = docs.count()
        media = docs.select("doc_id", "text").mapInPandas(
            _family_media_builder(members), "doc_id long, payload binary"
        )
        # the tile frame feeds the count AND the overlap self-join:
        # eager checkpoint so decode + 16-25 dHashes per image run once
        sigs = image_tile_dhash(
            media, phase_offsets=phases
        ).localCheckpoint()
        n_images = sigs.select("doc_id").distinct().count()
        fam = image_tile_near_dup_pairs(
            sigs, max_hamming=4, min_match_frac=0.8
        ).select(
            (F.col("id_a") / 10).cast("long").alias("fam_a"),
            (F.col("id_b") / 10).cast("long").alias("fam_b"),
        )
        per_fam = fam.groupBy("fam_a").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.col("fam_a") == F.col("fam_b")).alias("within"),
        )
        row = per_fam.agg(
            F.sum("cnt").alias("n_pairs"),
            F.min("within").alias("within"),
            (
                F.min((F.col("cnt") == 3) & F.col("within"))
                & (F.count(F.lit(1)) == F.lit(n_docs))
            ).alias("fully"),
        ).first()
        rows.append(
            (variant, n_images, row["n_pairs"], row["within"],
             row["fully"])
        )
    return spark.createDataFrame(
        rows,
        "variant string, n_images long, n_pairs long, "
        "pairs_within_family boolean, families_fully_paired boolean",
    )


def q_multimodal_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[RETIRED r13 into multimodal_corpus_prep_multi — now that gate's
    'image_only' variant builder; the funnel is unchanged.]

    CROSS-MODAL corpus-prep funnel: image-dedup survivorship gates
    DOCUMENT selection — the vision-LM twin of corpus_prep_pipeline
    (there the dedup key was a text fingerprint; here it is the image
    dHash, so documents whose attached images are byte-different
    re-encodes of the same pixels collapse to one survivor). Every 8th
    document carries one image; documents in the same 32-id block share
    PIXELS (seed = the block id) but each of the block's 4 members
    ((doc_id // 8) % 4) publishes a different byte encoding — gray PNG,
    gray-palette GIF, REVERSED-palette GIF (indices inverted, palette
    inverted — same decoded values, different bytes), and RGB PNG with
    R=G=B — all decoding to the IDENTICAL luma plane, hence
    dHash-identical by arithmetic. (A 2x upscale variant would NOT be:
    the 9-wide dHash grid does not divide 64, so upscaled pixel pairs
    straddle grid columns — unlike the 32-grid DCT hash where integer
    upscales are exact.) The funnel: map-only hash stage → exact-signature min-id
    survivor (one hash-agg) → broadcast semi-join back to documents →
    per-lang data card. The oracle re-derives survivorship PURELY from
    id arithmetic (min doc_id per 32-block), so a hash drift, a missed
    re-encode, or an over-dedup all break the per-lang counts. Scale
    shape: pixels never shuffle (8 B/image out of the Arrow stage);
    the survivor agg shuffles 8-byte hashes; the semi-join broadcasts
    ≤ one row per image."""
    from .fixtures import image_encoding_variants
    from .multimodal.phash import image_dhash

    _variant = image_encoding_variants()

    def _build(batches):
        import hashlib

        import pandas as pd

        def noise32(seed: bytes) -> bytes:
            out = bytearray()
            i = 0
            while len(out) < 32 * 32:
                out += hashlib.md5(seed + bytes([i])).digest()
                i += 1
            return bytes(out[: 32 * 32])

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                block = int(doc_id) // 32
                pix = noise32(hashlib.md5(str(block).encode()).digest())
                ids.append(doc_id)
                payloads.append(_variant(pix, (int(doc_id) // 8) % 4))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 8 == 3
        ),
        "doc_id",
    ).select("doc_id", "lang")
    media = docs.select("doc_id").mapInPandas(
        _build, "doc_id long, payload binary"
    )
    sigs = image_dhash(media)
    survivors = sigs.groupBy("dhash").agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        docs.join(F.broadcast(survivors.select("doc_id")), "doc_id", "semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_multimodal_corpus_prep_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[RETIRED r13 into multimodal_corpus_prep_multi — now that gate's
    'full' variant builder; the funnel is unchanged.]

    The FULL multimodal-LM prep funnel (r09 verdict #7): a document
    is selected only if it survives dedup in ALL THREE media modalities
    — image dHash, audio fingerprint, AND video frame-set — each
    grouping content at a DIFFERENT granularity so every modality has
    independent teeth. Every 4th document carries one of each medium:

    - IMAGE: 32-id blocks share pixels; the 8 selected members cycle
      the four byte-different dHash-exact encodings (gray PNG / gray
      GIF / REVERSED-palette GIF / RGB PNG — fixtures.py
      image_encoding_variants). Survivor = min doc_id per dhash.
    - AUDIO: 16-id blocks share an 8-bit-lattice stream; the 4 members
      cycle mono PCM16 / stereo dup / PCM8 / HALF-GAIN PCM16 (all
      fingerprint-equal by arithmetic — wav_encoding_variants).
      Survivor = min doc_id per afp.
    - VIDEO: 8-id blocks share 5 deterministic MJPEG frames; the 2
      members carry 5 vs first-4 frames (byte-identical JPEGs —
      frame-set overlap 4/min(5,4) = 1). Survivors = videos never the
      LARGER id of a >= 0.8-overlap pair (anti-join on video_b).

    Because a block's min id is also the min of its nested sub-blocks,
    the intersection equals the 32-block survivors — but the THREE
    reported survivor counts break independently: a missed re-encode,
    gain drift, or dropped frame-set pair in ANY modality inflates or
    deflates its count (over- AND under-dedup both visible). The
    oracle re-derives everything PURELY from id arithmetic. Scale
    shape: three map-only signature stages (pixels/samples/frames
    never shuffle; 8 B per item out), two 8-byte hash-aggs + one
    block-bounded pair join, three broadcast semi/anti-joins back to
    documents, survivor counts crossJoined as broadcast 1-row frames."""
    from .fixtures import (
        image_encoding_variants,
        mjpeg_video_variants,
        wav_encoding_variants,
    )
    from .multimodal.audio import audio_fingerprints
    from .multimodal.phash import (
        image_dhash,
        video_frame_dhash,
        video_near_dup_pairs,
    )

    _img = image_encoding_variants()
    _wav = wav_encoding_variants()
    _vid = mjpeg_video_variants()

    def _mk_builder(kind):
        img_v, wav_v, vid_v = _img, _wav, _vid

        def _build(batches):
            import hashlib

            import pandas as pd

            def noise32(seed: bytes) -> bytes:
                out = bytearray()
                i = 0
                while len(out) < 32 * 32:
                    out += hashlib.md5(seed + bytes([i])).digest()
                    i += 1
                return bytes(out[: 32 * 32])

            def lattice(seed: bytes, n: int = 8000) -> bytes:
                out = bytearray()
                i = 0
                while len(out) < n:
                    out += hashlib.md5(
                        seed + bytes([i & 0xFF, (i >> 8) & 0xFF])
                    ).digest()
                    i += 1
                return bytes(out[:n])

            for pdf in batches:
                ids, payloads = [], []
                for doc_id in pdf["doc_id"]:
                    d = int(doc_id)
                    k = d // 4
                    if kind == "image":
                        seed = hashlib.md5(
                            b"img%d" % (d // 32)
                        ).digest()
                        payload = img_v(noise32(seed), k % 4)
                    elif kind == "audio":
                        seed = hashlib.md5(
                            b"aud%d" % (d // 16)
                        ).digest()
                        payload = wav_v(lattice(seed), k % 4)
                    else:
                        seed = hashlib.md5(b"vid%d" % (d // 8)).digest()
                        payload = vid_v(seed, k % 2)
                    ids.append(doc_id)
                    payloads.append(payload)
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "payload": pd.Series(payloads, dtype="object"),
                    }
                )

        return _build

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 4 == 1
        ),
        "doc_id",
    ).select("doc_id", "lang")
    ids = docs.select("doc_id")

    img_surv = (
        image_dhash(ids.mapInPandas(
            _mk_builder("image"), "doc_id long, payload binary"
        ))
        .groupBy("dhash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    aud_surv = (
        audio_fingerprints(ids.mapInPandas(
            _mk_builder("audio"), "doc_id long, payload binary"
        ))
        .groupBy("afp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # video: pair stage (frame hashes are per-frame, not one per video,
    # so survivorship goes through the overlap gate) — checkpoint the
    # 8-byte sig frame so the container walk + JPEG decodes run once
    # for the pair join's both sides
    vid_sigs = video_frame_dhash(
        ids.mapInPandas(
            _mk_builder("video"), "doc_id long, payload binary"
        )
    ).localCheckpoint()
    vid_pairs = video_near_dup_pairs(
        vid_sigs, min_match_frac=0.8
    )
    vid_surv = (
        vid_sigs.select(F.col("video_id").alias("doc_id"))
        .distinct()
        .join(
            F.broadcast(
                vid_pairs.select(F.col("video_b").alias("doc_id"))
            ),
            "doc_id",
            "anti",
        )
    )

    counts = [
        surv.agg(F.count(F.lit(1)).alias(name))
        for surv, name in (
            (img_surv, "n_img_survivors"),
            (aud_surv, "n_audio_survivors"),
            (vid_surv, "n_video_survivors"),
        )
    ]
    out = (
        docs.join(F.broadcast(img_surv), "doc_id", "semi")
        .join(F.broadcast(aud_surv), "doc_id", "semi")
        .join(F.broadcast(vid_surv), "doc_id", "semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    for c in counts:
        out = out.crossJoin(F.broadcast(c))
    return out.select(
        "lang",
        "n_docs",
        "n_img_survivors",
        "n_audio_survivors",
        "n_video_survivors",
    )


@register(
    "embedding_semantic_dedup",
    f"""
WITH RECURSIVE vv AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM vv a JOIN vv b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({_COS_SQL.format(a="a.e", b="b.e")}, 6) >= 0.35
), edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b AS u, id_a AS v FROM pairs
), reach(id, lbl) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.id = e.v
), cl AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cl GROUP BY cluster_id)
SELECT cl.id AS vec_id, cl.cluster_id,
       cl.id = cl.cluster_id AS is_canonical, sz.cluster_size
FROM cl JOIN sz USING (cluster_id)
""",
)
def q_embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023) END TO END:
    embedding-cosine near-dup pairs within cluster blocks → connected
    components → one canonical survivor per semantic group —
    ``filter(is_canonical)`` IS the semantically deduplicated corpus,
    the embedding-space twin of ``doc_dedup_clusters``'s lexical dedup.
    Composes the existing blocked cosine-pair generator
    (operators/similarity.embedding_near_dup_pairs — the label blocks
    stand in for SemDeDup's k-means cells; the unblocked scale path is
    the LSH/IVF bucketing) with the hash-min CC + survivor machinery
    (operators/graph.dedup_clusters). Oracle: the same pairs via the
    exact cosine SQL, transitive closure as a recursive CTE, MIN(label)
    per vertex = hash-min's fixpoint."""
    from .operators.graph import dedup_clusters
    from .operators.similarity import embedding_near_dup_pairs

    emb = load_fixture(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.35)
    return dedup_clusters(emb, pairs, id_col="vec_id")


@register(
    "gopher_quality_flags",
    f"""
WITH base AS (
    SELECT doc_id, text AS _raw, {_TOKS_SQL} AS _toks,
           string_split(text, chr(10)) AS _lines
    FROM documents
), m AS (
    SELECT doc_id,
           len(_toks) AS n_words,
           list_sum(list_transform(_toks, w -> length(w))) AS _char_sum,
           len(list_filter(_toks, w -> regexp_matches(w, '[a-z]'))) AS _alpha_words,
           len(list_filter(_toks, w -> w IN
               ('the','be','to','of','and','that','have','with'))) AS stopword_hits,
           (length(_raw) - length(replace(_raw, '#', '')))
             + (length(_raw) - length(replace(_raw, '...', ''))) / 3 AS _symbols,
           len(list_filter(_lines, l -> starts_with(l, '•') OR starts_with(l, '- '))) AS _bullet_lines,
           len(list_filter(_lines, l -> ends_with(l, '...'))) AS _ellipsis_lines,
           len(_lines) AS _n_lines
    FROM base
)
SELECT doc_id, n_words,
       ROUND(_char_sum / greatest(n_words, 1), 6) AS mean_word_len,
       ROUND(_symbols / greatest(n_words, 1), 6) AS symbol_ratio,
       ROUND(_alpha_words / greatest(n_words, 1), 6) AS alpha_word_frac,
       stopword_hits,
       (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
       (_char_sum >= 3 * n_words AND _char_sum <= 10 * n_words) AS ok_mean_word_len,
       (_symbols * 10 <= greatest(n_words, 1)) AS ok_symbol_ratio,
       (_bullet_lines * 10 < greatest(_n_lines, 1) * 9) AS ok_bullets,
       (_ellipsis_lines * 10 < greatest(_n_lines, 1) * 3) AS ok_ellipsis,
       (_alpha_words * 10 >= greatest(n_words, 1) * 8) AS ok_alpha_words,
       (stopword_hits >= 2) AS ok_stopwords,
       (n_words >= 50 AND n_words <= 100000
        AND _char_sum >= 3 * n_words AND _char_sum <= 10 * n_words
        AND _symbols * 10 <= greatest(n_words, 1)
        AND _bullet_lines * 10 < greatest(_n_lines, 1) * 9
        AND _ellipsis_lines * 10 < greatest(_n_lines, 1) * 3
        AND _alpha_words * 10 >= greatest(n_words, 1) * 8
        AND stopword_hits >= 2) AS keep
FROM m
""",
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality-rule bundle (Rae et al. 2021 A1.1)
    per document — every signal, every per-rule boolean, and the
    composite keep flag, in ONE map-only projection (operators/corpus
    .gopher_quality_flags). All thresholds are integer-ratio
    comparisons, so the oracle mirrors them without float straddle."""
    from .operators.corpus import gopher_quality_flags

    return gopher_quality_flags(load_fixture(spark, sf_dir, "documents"))


@register(
    "dsir_importance_weights",
    f"""
WITH occ AS (
    SELECT doc_id, (lang = 'en') AS _t,
           CAST(('0x' || substr(md5(g.gram), 1, 8)) AS BIGINT) % 1024 AS bucket
    FROM documents,
         unnest(CASE WHEN len({_TOKS_SQL}) >= 2
                     THEN list_transform(generate_series(1, len({_TOKS_SQL}) - 1),
                                         i -> array_to_string(({_TOKS_SQL})[i:i+1], ' '))
                     ELSE [array_to_string({_TOKS_SQL}, ' ')] END) AS g(gram)
), hist AS (
    SELECT bucket, SUM(CASE WHEN _t THEN 1 ELSE 0 END) AS c_t, COUNT(*) AS c_r
    FROM occ GROUP BY bucket
), tot AS (SELECT SUM(c_t) AS tot_t, SUM(c_r) AS tot_r FROM hist),
ratio AS (
    SELECT bucket,
           ln(c_t + 1.0) - ln(t.tot_t + 1024.0)
             - ln(c_r + 1.0) + ln(t.tot_r + 1024.0) AS lr
    FROM hist CROSS JOIN tot t
)
SELECT o.doc_id, COUNT(*) AS n_grams, ROUND(SUM(r.lr), 6) AS log_weight
FROM occ o JOIN ratio r USING (bucket)
GROUP BY o.doc_id
""",
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023) with the
    lang='en' subset as the target distribution: hashed-bigram histogram
    ratio summed per doc (operators/corpus.dsir_importance). The bucket
    log-ratio table is n_buckets rows — broadcast onto the occurrence
    stream, so the plan is scan + two bounded aggregates at any corpus
    size. On the fixtures the weights separate en (~-0.2 avg) from
    non-en (~-3) — the tilt the method promises."""
    from .operators.corpus import dsir_importance

    return dsir_importance(
        load_fixture(spark, sf_dir, "documents"), F.col("lang") == "en"
    )
