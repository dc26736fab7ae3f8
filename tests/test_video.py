"""MJPEG-in-AVI stdlib codec + the REAL frame-sampling path
(multimodal/video.py, binary.sample_frames use_fake_codec=False):
container walk, byte-exact frame extraction, quarantine posture."""

from __future__ import annotations

import hashlib

import pytest

from airflow_etl_finance_market_spark.multimodal.jpeg import (
    _stdlib_jpeg_codec,
)
from airflow_etl_finance_market_spark.multimodal.video import (
    _stdlib_avi_codec,
    decode_video,
)


def _mjpeg_avi(n_frames=6, fps=10):
    _, _, jenc = _stdlib_jpeg_codec()
    frames = [
        jenc(8, 8, 1, bytes([i * 30] * 64), quality=90)
        for i in range(n_frames)
    ]
    _, _, enc = _stdlib_avi_codec()
    return enc(frames, fps=fps, width=8, height=8), frames


class TestStdlibAviCodec:
    def test_roundtrip_frames_byte_exact(self):
        """The container must hand back every JPEG frame byte-for-byte —
        word-aligned chunk padding included (JPEG payloads are routinely
        odd-length)."""
        avi, frames = _mjpeg_avi()
        info, extract, _ = _stdlib_avi_codec()
        assert any(len(f) & 1 for f in frames)  # padding actually exercised
        assert extract(avi) == frames
        assert info(avi) == (6, 100_000)  # 10 fps -> 100ms per frame

    def test_sampled_frame_decodes_through_jpeg_codec(self):
        """Cross-codec: a frame pulled from the container is a REAL
        baseline JPEG the image tier decodes to the exact flat block."""
        avi, _ = _mjpeg_avi()
        _, extract, _ = _stdlib_avi_codec()
        _, jdec, _ = _stdlib_jpeg_codec()
        w, h, ch, pix = jdec(extract(avi)[3])
        assert (w, h, ch) == (8, 8, 1) and set(pix) == {90}

    def test_probe_and_loud_seam(self):
        avi, _ = _mjpeg_avi(n_frames=4, fps=25)
        assert decode_video(avi) == (4, 40_000)
        with pytest.raises(NotImplementedError):
            decode_video(b"\x00\x00\x00\x20ftypmp42 not avi")

    def test_missing_movi_raises(self):
        body = b"AVI " + b"JUNK" + (4).to_bytes(4, "little") + b"\x00" * 4
        bad = b"RIFF" + len(body).to_bytes(4, "little") + body
        _, extract, _ = _stdlib_avi_codec()
        with pytest.raises(ValueError):
            extract(bad)


class TestRealFrameSamplingOnSpark:
    def test_samples_every_nth_real_frame_and_quarantines(self, spark):
        """sample_frames(use_fake_codec=False): every 2nd MJPEG frame is
        emitted with its TRUE byte length and sha (provably the container
        walk, not chunk arithmetic); unparseable payloads contribute zero
        rows; NULL payloads are skipped."""
        from airflow_etl_finance_market_spark.multimodal.binary import (
            sample_frames,
        )

        avi, frames = _mjpeg_avi()
        media = spark.createDataFrame(
            [
                (1, bytearray(avi)),
                (2, bytearray(b"\x00ftypmp42 h264-ish payload")),
                (3, bytearray(avi[: len(avi) // 3])),  # truncated container
                (4, None),
            ],
            "doc_id long, payload binary",
        )
        rows = sample_frames(
            media, every_n=2, use_fake_codec=False
        ).collect()
        assert sorted({r.doc_id for r in rows}) == [1, 3]
        got = {
            r.frame_idx: (r.frame_bytes, r.frame_sha16)
            for r in rows
            if r.doc_id == 1
        }
        assert sorted(got) == [0, 2, 4]
        for k, (nb, sha) in got.items():
            assert nb == len(frames[k])
            assert sha == hashlib.sha256(frames[k]).hexdigest()[:16]
        # a truncated container yields its intact PREFIX of frames — and
        # ONLY intact ones: every emitted frame byte-matches the original
        # (the walker must never clamp a cut-off chunk into a fake frame)
        prefix = sorted(
            (r.frame_idx, r.frame_bytes, r.frame_sha16)
            for r in rows
            if r.doc_id == 3
        )
        assert prefix  # the cut at 1/3 leaves at least the first frame
        for k, nb, sha in prefix:
            assert nb == len(frames[k])
            assert sha == hashlib.sha256(frames[k]).hexdigest()[:16]


class TestVideoCdcCrop:
    def test_whole_frame_tier_misses_the_crop_family(self, spark):
        """The honest-gap pin (the image tier's precedent): a cropped
        video shares NO whole-frame dHash with its original — every
        frame's hash moves — so video_near_dup_pairs finds nothing on
        the exact members the CDC gate recovers."""
        from airflow_etl_finance_market_spark.fixtures import (
            mjpeg_cdc_crop_family_members,
        )
        from airflow_etl_finance_market_spark.multimodal.phash import (
            video_cdc_crop_near_dup_pairs,
            video_frame_dhash,
            video_near_dup_pairs,
        )

        members = mjpeg_cdc_crop_family_members()
        rows = []
        for fam, text in enumerate(["vid one", "vid two"]):
            for k, payload in enumerate(members(text)):
                rows.append((fam * 10 + k, bytearray(payload)))
        media = spark.createDataFrame(
            rows, "doc_id long, payload binary"
        ).cache()
        try:
            whole = video_near_dup_pairs(
                video_frame_dhash(media),
                max_hamming=4,
                min_match_frac=0.5,
            ).collect()
            assert whole == []  # the gap the CDC tier closes
            cdc = {
                (r.video_a, r.video_b): r.match_frac
                for r in video_cdc_crop_near_dup_pairs(
                    media, min_match_frac=0.5
                ).collect()
            }
            assert set(cdc) == {(0, 1), (10, 11)}
            for frac in cdc.values():
                assert frac >= 0.7  # measured 0.78 worst across seeds
        finally:
            media.unpersist()

    def test_crop_members_are_pixel_exact_by_construction(self):
        """The fixture's whole premise: every frame is a per-MCU q90
        fixed point, so the MCU-aligned crop decodes to exactly the
        crop of the original's decoded pixels."""
        from airflow_etl_finance_market_spark.fixtures import (
            mjpeg_cdc_crop_family_members,
        )
        from airflow_etl_finance_market_spark.multimodal.jpeg import (
            _stdlib_jpeg_codec,
        )
        from airflow_etl_finance_market_spark.multimodal.video import (
            _stdlib_avi_codec,
        )

        _, frames_of, _ = (_stdlib_avi_codec()[0:3])
        _, dec, _ = _stdlib_jpeg_codec()
        full, cropped = mjpeg_cdc_crop_family_members()("pixel exact")
        fa, fb = frames_of(full), frames_of(cropped)
        assert len(fa) == len(fb) == 3
        for a, b in zip(fa, fb):
            w, h, _, pa = dec(a)
            cw, ch2, _, pb = dec(b)
            assert (w, h, cw, ch2) == (96, 64, 80, 32)
            want = b"".join(
                pa[(24 + y) * 96 + 8 : (24 + y) * 96 + 88]
                for y in range(32)
            )
            assert pb == want


def test_video_signature_stages_passthrough_columns(spark):
    """Streaming parity: both video signature stages must carry
    `passthrough` columns verbatim onto every emitted row — a watermark
    dies with any projection that drops its event-time column (the
    image/audio stages' contract, extended to video)."""
    import datetime as dt

    from airflow_etl_finance_market_spark.fixtures import (
        mjpeg_video_variants,
    )
    from airflow_etl_finance_market_spark.multimodal.phash import (
        video_frame_dhash,
        video_frame_row_cdc,
    )

    v = mjpeg_video_variants()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    media = spark.createDataFrame(
        [
            (1, t0, bytearray(v(b"pt-a", 0))),
            (2, t0.replace(hour=13), bytearray(v(b"pt-b", 0))),
            (3, t0.replace(hour=14), None),  # quarantined: no rows
        ],
        "doc_id long, ts timestamp_ntz, payload binary",
    )
    for stage in (video_frame_dhash, video_frame_row_cdc):
        rows = stage(media, passthrough=("ts",)).collect()
        assert rows, stage.__name__
        got = {(r.video_id, r.ts) for r in rows}
        assert got == {
            (1, t0), (2, t0.replace(hour=13))
        }, stage.__name__


def test_mirrored_video_collapses_only_via_canonical_frames(spark):
    """r13: the image tier's mirror-canonical option lifted to frames —
    a MIRRORED video flips every frame's pixels, so the plain frame
    tier finds nothing, while canonical frame signatures collapse the
    pair by arithmetic (min of hash and flipped-hash per frame)."""
    import hashlib

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
    levels = [16, 48, 80, 112, 144, 176, 208, 240]
    gw, gh, blk = 9, 8, 8

    def base_pixels(seed: bytes) -> bytes:
        # the dHash-margin block grid (flat 8px blocks, horizontally
        # adjacent levels distinct) — JPEG-exact per the video gate
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
            rowb = bytearray()
            for c in range(gw):
                rowb += bytes([vals[r][c]]) * blk
            pix += bytes(rowb) * blk
        return bytes(pix)

    def mirror(pix: bytes, w: int, h: int) -> bytes:
        return b"".join(pix[y * w : (y + 1) * w][::-1] for y in range(h))

    w, h = gw * blk, gh * blk
    frames, mirrored = [], []
    for fi in range(4):
        p = base_pixels(hashlib.md5(b"mir%d" % fi).digest())
        frames.append(jpeg_enc(w, h, 1, p, quality=90))
        mirrored.append(jpeg_enc(w, h, 1, mirror(p, w, h), quality=90))
    media = spark.createDataFrame(
        [
            (1, bytearray(avi_enc(frames, fps=10, width=w, height=h))),
            (2, bytearray(avi_enc(mirrored, fps=10, width=w, height=h))),
        ],
        "doc_id long, payload binary",
    ).cache()
    try:
        plain = video_near_dup_pairs(
            video_frame_dhash(media), max_hamming=0, min_match_frac=0.5
        ).collect()
        assert plain == []  # the gap the canonical option closes
        canon = video_near_dup_pairs(
            video_frame_dhash(media, mirror_canonical=True),
            max_hamming=0,
            min_match_frac=0.5,
        ).collect()
        assert [(r.video_a, r.video_b, r.match_frac) for r in canon] == [
            (1, 2, 1.0)
        ]
    finally:
        media.unpersist()
