"""Pure-stdlib WAV (RIFF/PCM) audio codec — the REAL audio tier.

Audio joins PNG and baseline JPEG as a format that decodes for real in a
bare container: RIFF/WAVE PCM (the interchange format every audio
pipeline can emit) needs only ``struct`` — no libav. The same honesty
boundary as the image codecs applies: compressed audio (MP3/AAC/OGG,
or non-PCM WAV encodings like IEEE float / A-law) raises
NotImplementedError from the single-payload probe, and the FRAME-level
Spark path QUARANTINES those rows (NULL features), because one bad byte
string in a media crawl must never fail the task.

Scope:

- **Decode**: RIFF/WAVE with 8-bit unsigned or 16-bit signed PCM
  (``audio_decode`` returns per-channel int sample arrays), any channel
  count and sample rate, chunk-walk tolerant of extra chunks (LIST,
  fact, …).
- **Features** (``audio_features``): duration, sample rate, channels,
  per-payload RMS and peak amplitude normalized to [0, 1] — the
  loudness/clipping signals an audio-quality filter gates on.
- **Downmix/resample** (``resample_nearest``): mono downmix + nearest-
  neighbor rate conversion — the normalize-before-embed stage; nearest
  is deterministic and engine-portable (no windowed sinc), which is
  what a correctness-gated pipeline wants from a fixture-tier DSP.
- **Encode** (``audio_encode``): PCM16 writer for fixtures/tests.

Everything nests inside :func:`_stdlib_wav_codec` so cloudpickle ships
the codec BY VALUE into mapInPandas closures (Spark workers unpickle
without this repo on sys.path) — the same factory pattern as
``binary._stdlib_png_codec`` and ``jpeg._stdlib_jpeg_codec``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: RIFF file magic — the sniff for the stdlib WAV path.
WAV_MAGIC = b"RIFF"

#: Output schema of the audio feature-extraction stage.
AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def _stdlib_wav_codec():
    """Build the self-contained WAV codec namespace.

    Returns ``(wav_info, wav_decode, wav_encode, resample_nearest)``:

    - ``wav_info(b) -> (sample_rate, channels, bits, n_samples)``;
    - ``wav_decode(b) -> (sample_rate, [ch0_samples, ch1_samples, ...])``
      with samples as signed ints at PCM16 scale (8-bit input is
      centered and shifted left 8);
    - ``wav_encode(sample_rate, channels_samples) -> bytes`` (PCM16);
    - ``resample_nearest(rate, chans, out_rate) -> (out_rate, [mono])``.
    """
    import struct

    def _chunks(b: bytes):
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos = 12
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            ln = int.from_bytes(b[pos + 4 : pos + 8], "little")
            if pos + 8 + ln > len(b):
                # truncated chunk (cut-off download): REFUSE rather than
                # clamp — a silently-shortened decode would report wrong
                # duration/RMS as if valid; the frame path quarantines
                # (same complete-chunk rule as the AVI walker)
                raise ValueError("truncated RIFF chunk")
            yield cid, b[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned

    def _fmt_and_data(b: bytes):
        fmt = data = None
        for cid, payload in _chunks(b):
            if cid == b"fmt ":
                fmt = payload
            elif cid == b"data":
                data = payload
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        (tag, ch, rate, _bps, _align, bits) = struct.unpack(
            "<HHIIHH", fmt[:16]
        )
        if tag != 1:  # PCM only; float/A-law/mu-law/extensible need codecs
            raise NotImplementedError(
                f"WAV format tag {tag} (non-PCM) not supported by the "
                "stdlib codec"
            )
        if bits not in (8, 16):
            raise NotImplementedError(f"{bits}-bit PCM not supported")
        if ch < 1 or rate < 1:
            # malformed header: channels=0 would make every
            # len(data)//(ch*width) below raise ZeroDivisionError, which
            # escapes the single-payload probe's documented
            # ValueError/NotImplementedError contract (r06 advice)
            raise ValueError(
                f"malformed WAV fmt chunk (channels={ch}, rate={rate})"
            )
        return ch, rate, bits, data

    def wav_info(b: bytes) -> tuple[int, int, int, int]:
        ch, rate, bits, data = _fmt_and_data(b)
        n = len(data) // (ch * (bits // 8))
        return rate, ch, bits, n

    def wav_decode(b: bytes) -> tuple[int, list[list[int]]]:
        """Samples are returned at PCM16 SCALE regardless of source
        depth: 8-bit input is centered and shifted left 8 bits, so every
        consumer (RMS/peak normalized by 32768, PCM16 re-encode) treats
        one scale — returning 8-bit samples at +/-128 made the feature
        stage report full-scale 8-bit audio as near-silence and the
        resampler emit 48 dB-quiet output (round-6 review findings)."""
        ch, rate, bits, data = _fmt_and_data(b)
        width = bits // 8
        n = len(data) // (ch * width)
        data = data[: n * ch * width]  # drop a trailing partial frame
        if bits == 16:
            flat = struct.unpack(f"<{n * ch}h", data)
        else:  # 8-bit WAV is UNSIGNED; center, then scale to PCM16
            flat = [(v - 128) << 8 for v in data]
        return rate, [list(flat[c :: ch]) for c in range(ch)]

    def wav_encode(sample_rate: int, channels: list[list[int]]) -> bytes:
        ch = len(channels)
        if ch == 0 or not all(
            len(c) == len(channels[0]) for c in channels
        ):
            raise ValueError("need >=1 equal-length channels")
        n = len(channels[0])
        clamp = lambda v: -32768 if v < -32768 else (32767 if v > 32767 else v)
        flat = [
            clamp(int(channels[c][i]))
            for i in range(n)
            for c in range(ch)
        ]
        data = struct.pack(f"<{n * ch}h", *flat)
        fmt = struct.pack(
            "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
        )
        out = b"WAVE"
        out += b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        out += b"data" + len(data).to_bytes(4, "little") + data
        return b"RIFF" + len(out).to_bytes(4, "little") + out

    def resample_nearest(
        rate: int, channels: list[list[int]], out_rate: int
    ) -> tuple[int, list[list[int]]]:
        """Mono downmix (mean) + nearest-neighbor rate conversion."""
        n = len(channels[0])
        mono = (
            channels[0]
            if len(channels) == 1
            else [
                sum(c[i] for c in channels) // len(channels)
                for i in range(n)
            ]
        )
        if rate == out_rate or n == 0:
            return out_rate, [mono]
        m = max(1, (n * out_rate) // rate)
        return out_rate, [[mono[(i * rate) // out_rate] for i in range(m)]]

    return wav_info, wav_decode, wav_encode, resample_nearest


def decode_audio(payload: bytes) -> tuple[int, int, int]:
    """REAL single-payload probe: (sample_rate, channels, n_samples).

    RIFF/PCM parses via the stdlib codec; anything else raises
    NotImplementedError (the loud seam — MP3/AAC need a codec library;
    the frame-level path quarantines instead)."""
    if payload[:4] == WAV_MAGIC:
        wav_info, *_ = _stdlib_wav_codec()
        rate, ch, _bits, n = wav_info(payload)
        return rate, ch, n
    raise NotImplementedError(
        "non-WAV audio decoding requires an audio codec library, not "
        "present in this container"
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched ``mapInPandas`` audio feature extraction — REAL codec.

    One output row per input row: byte length plus decoded sample rate,
    channel count, sample count, duration, RMS, and peak (both amplitude
    stats normalized to [0, 1] full scale). Corrupt / truncated /
    non-PCM payloads yield NULL-featured rows (quarantine posture, same
    as the image path); NULL payloads keep their row with NULLs. Map-only
    — a 100 TB audio table featurizes with zero data movement.
    """
    _wav_info, _wav_decode, _, _ = _stdlib_wav_codec()

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_bytes", "sample_rate", "channels",
                "n_samples", "duration_s", "rms", "peak",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(
                    None if payload is None else len(payload)
                )
                feats = None
                if payload is not None:
                    try:
                        rate, chans = _wav_decode(bytes(payload))
                        n = len(chans[0])
                        flat = [v for c in chans for v in c]
                        full = 32768.0
                        rms = (
                            math.sqrt(
                                sum(v * v for v in flat) / len(flat)
                            ) / full
                            if flat
                            else 0.0
                        )
                        peak = (
                            max(abs(v) for v in flat) / full if flat else 0.0
                        )
                        feats = (
                            rate,
                            len(chans),
                            n,
                            round(n / rate, 6) if rate else None,
                            round(rms, 6),
                            round(peak, 6),
                        )
                    except Exception:
                        feats = None  # quarantine: NULL-featured row
                vals = feats or (None,) * 6
                for k, v in zip(
                    ("sample_rate", "channels", "n_samples",
                     "duration_s", "rms", "peak"),
                    vals,
                ):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_bytes": pd.Series(out["n_bytes"], dtype="Int64"),
                    "sample_rate": pd.Series(
                        out["sample_rate"], dtype="Int32"
                    ),
                    "channels": pd.Series(out["channels"], dtype="Int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="Int64"),
                    "duration_s": pd.Series(
                        out["duration_s"], dtype="Float64"
                    ),
                    "rms": pd.Series(out["rms"], dtype="Float64"),
                    "peak": pd.Series(out["peak"], dtype="Float64"),
                }
            )

    return media.mapInPandas(_extract, schema=AUDIO_FEATURE_SCHEMA)


def _audio_fingerprint_kernel(
    n_segments: int = 9,
    n_bands: int = 9,
    f_lo: float = 200.0,
    f_hi: float = 3600.0,
):
    """Build the banded spectral-energy sign fingerprint kernel,
    factory-nested (pickles BY VALUE into ``mapInPandas`` closures —
    the house rule shared with every stdlib codec and the image-hash
    kernels in :mod:`.phash`).

    The published Haitsma-Kalker audio-fingerprint shape (ISMIR 2002):
    band energies over a time-frequency grid, one bit per sign of the
    TIME-DIFFERENCED FREQUENCY-DIFFERENCE
    ``(E[t][b+1]-E[t][b]) - (E[t-1][b+1]-E[t-1][b])``. Here the grid is
    ``n_segments`` equal time slices x ``n_bands`` linear bands between
    ``f_lo`` and ``f_hi`` Hz, giving ``(n_segments-1) x (n_bands-1)``
    = 64 bits — one ``bigint``, the same signature shape as the image
    dHash so the pair stage is shared.

    Invariances the gate leans on (all BY ARITHMETIC, not tolerance):

    - **gain**: scaling every sample by ``c`` scales every band energy
      by ``c^2``; the double-difference sign is unchanged;
    - **channel layout**: the downmix is the exact mean, so a stereo
      duplication of a mono signal fingerprints IDENTICALLY;
    - **bit depth on the 8-bit lattice**: the codec decodes 8-bit PCM
      to ``(v-128) << 8`` (PCM16 scale), so a signal synthesized on
      that lattice re-encodes 16->8 bit LOSSLESSLY and fingerprints
      identically.

    Bands are ABSOLUTE Hz (requires ``rate >= 2*f_hi`` to populate the
    top band), not relative bins: a nearest-neighbor resample preserves
    absolute spectral content below the original Nyquist, so resampled
    copies stay within ~8 bits (measured 0-7 across noise and tonal
    signals; sparse spectra are the worst case — near-zero bands flip
    on leakage noise), which can exceed the Hamming-4 gate radius. The
    pipeline posture is therefore NORMALIZE-THEN-FINGERPRINT: run
    :func:`resample_audio` to a common rate first; after that, copies
    differ only by encoding and land EXACT. Both facts pinned in
    tests/test_audio.py. Signals shorter than ``8 * n_segments``
    samples raise ValueError (the Spark stage quarantines them), and so
    do clips whose Nyquist sits below ``f_hi``: a rate under ``2*f_hi``
    leaves the top bands structurally empty, so UNRELATED low-rate
    clips would converge toward identical (even all-zero) fingerprints
    and a signature-keyed dedup would silently drop distinct content —
    quarantine is the same honesty rule as the too-short guard
    (r09 advice)."""

    def fingerprint(rate: int, channels: list[list[int]]) -> int:
        import numpy as np

        if rate < 2 * f_hi:
            raise ValueError(
                f"rate {rate} below 2*f_hi={2 * f_hi:g}: top bands would "
                "be structurally empty and unrelated clips would collide"
            )
        n = len(channels[0])
        if n < 8 * n_segments:
            raise ValueError(
                f"{n} samples too short for a {n_segments}-segment "
                "fingerprint"
            )
        if len(channels) == 1:
            mono = np.asarray(channels[0], dtype=np.float64)
        else:
            mono = np.mean(
                np.asarray(channels, dtype=np.float64), axis=0
            )
        edges = np.linspace(f_lo, f_hi, n_bands + 1)
        energy = np.empty((n_segments, n_bands), dtype=np.float64)
        for t in range(n_segments):
            seg = mono[t * n // n_segments : (t + 1) * n // n_segments]
            spec = np.abs(np.fft.rfft(seg)) ** 2
            freqs = np.fft.rfftfreq(len(seg), d=1.0 / rate)
            for b in range(n_bands):
                mask = (freqs >= edges[b]) & (freqs < edges[b + 1])
                energy[t, b] = spec[mask].sum()
        bits = 0
        k = 0
        for t in range(1, n_segments):
            for b in range(n_bands - 1):
                if (
                    energy[t, b + 1] - energy[t, b]
                    - energy[t - 1, b + 1] + energy[t - 1, b]
                ) > 0:
                    bits |= 1 << k
                k += 1
        return bits

    return fingerprint


def audio_fingerprints(
    media: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Map-only Arrow stage: ``(id, payload)`` → ``(doc_id, afp
    bigint)`` — the banded spectral-energy sign fingerprint
    (:func:`_audio_fingerprint_kernel`) over the stdlib WAV decode.
    Audio's entry into the near-dup tier next to the image dHash/pHash
    and video frame-set signatures: feed the output to
    ``phash.hamming_near_pairs(sig_col="afp")``. Corrupt / truncated /
    non-PCM / too-short payloads QUARANTINE (row dropped), the frame
    path's posture; a 100 TB audio table reduces to 8 bytes per clip
    with zero data movement.

    ``passthrough`` columns are copied verbatim onto each output row
    (types inherited from the input schema) — the streaming dedup
    caller needs the EVENT-TIME column to survive this stage, because a
    watermark declared upstream dies with any projection that drops its
    column."""
    from pyspark.sql.types import StructField, StructType

    _, _wav_decode, _, _ = _stdlib_wav_codec()
    _fp = _audio_fingerprint_kernel()
    extra = tuple(passthrough)

    def _stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = []
            ids, fps = [], []
            for i, (doc_id, payload) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                if payload is None:
                    continue
                try:
                    rate, chans = _wav_decode(bytes(payload))
                    hv = _fp(rate, chans)
                except Exception:
                    continue  # quarantine: undecodable or too short
                ids.append(doc_id)
                keep.append(i)
                fps.append(hv - (1 << 64) if hv >= 1 << 63 else hv)
            out = {"doc_id": pd.Series(ids, dtype="int64")}
            for c in extra:
                out[c] = pdf[c].iloc[keep].reset_index(drop=True)
            out["afp"] = pd.Series(fps, dtype="int64")
            yield pd.DataFrame(out)

    schema = StructType(
        [StructField("doc_id", LongType())]
        + [media.schema[c] for c in extra]
        + [StructField("afp", LongType())]
    )
    return media.select(
        F.col(id_col).alias(id_col),
        F.col(payload_col).alias(payload_col),
        *[F.col(c) for c in extra],
    ).mapInPandas(_stage, schema=schema)


def _audio_window_fingerprint_kernel(
    window_samples: int = 2000,
    n_segments: int = 9,
    n_bands: int = 9,
    f_lo: float = 200.0,
    f_hi: float = 3600.0,
):
    """Per-WINDOW subfingerprints — the TRIM-robust audio signature
    (r09 verdict #3), factory-nested per the pickle house rule.

    The whole-clip kernel (:func:`_audio_fingerprint_kernel`) slices
    the ENTIRE clip into 9 equal segments, so a 1-second trim shifts
    every segment boundary and the signature diverges. The published
    Haitsma-Kalker scheme is per-window subfingerprints matched as
    SETS — exactly the machinery the video/tile tiers already provide.
    This kernel evaluates the whole-clip kernel over NON-OVERLAPPING
    fixed-SAMPLE windows from the clip start (``windows(rate, chans)
    -> [(win_idx, bits), ...]``; the trailing partial window is
    dropped — it would change under any edit). The arithmetic the gate
    leans on: trimming k WHOLE windows off either end leaves every
    surviving window's samples byte-identical
    (``trimmed[i*W:(i+1)*W] == original[(i+k)*W:(i+k+1)*W]``), so its
    subfingerprints are EXACTLY the original's — set overlap 1.0 on
    the trim's side. Off-window-boundary trims shift every window and
    degrade honestly (pinned in tests), the same residual contract as
    the single-phase tile grid. All whole-clip invariances (gain,
    channel layout, 8-bit lattice) carry over per window; clips
    shorter than one window yield no rows (quarantine)."""
    base = _audio_fingerprint_kernel(n_segments, n_bands, f_lo, f_hi)
    W = window_samples

    def windows(rate: int, channels: list[list[int]]):
        n = len(channels[0])
        out = []
        for i in range(n // W):
            seg = [c[i * W : (i + 1) * W] for c in channels]
            out.append((i, base(rate, seg)))
        return out

    return windows


def audio_window_fingerprints(
    media: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_samples: int = 2000,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Map-only Arrow stage: ``(id, payload)`` → ``(doc_id, win_idx,
    afp)`` — one subfingerprint per fixed-sample window
    (:func:`_audio_window_fingerprint_kernel`), the audio twin of
    :func:`.phash.image_tile_dhash` / ``video_frame_dhash``. Feed the
    rows to :func:`audio_window_near_dup_pairs` for trim-robust dedup.
    ``win_idx`` rides along for debuggability only (a trim shifts every
    surviving window's index, so position is deliberately NOT part of
    the match). Corrupt / non-PCM / sub-window payloads QUARANTINE
    (zero rows); a 100 TB audio table reduces to 8 bytes per window
    with zero data movement.

    ``passthrough`` columns are copied verbatim onto each output row
    (every window of a clip inherits the clip's values) — the streaming
    windowed-dedup caller needs the EVENT-TIME column to survive this
    stage, because a watermark declared upstream dies with any
    projection that drops its column (same contract as
    :func:`audio_fingerprints`)."""
    from pyspark.sql.types import StructField, StructType

    _, _wav_decode, _, _ = _stdlib_wav_codec()
    _wins = _audio_window_fingerprint_kernel(window_samples)
    extra = tuple(passthrough)

    def _stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = []
            ids, idxs, fps = [], [], []
            for i, (doc_id, payload) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                if payload is None:
                    continue
                try:
                    rate, chans = _wav_decode(bytes(payload))
                    rows = _wins(rate, chans)
                except Exception:
                    continue  # quarantine: undecodable / low-rate clip
                for k, hv in rows:
                    ids.append(doc_id)
                    keep.append(i)
                    idxs.append(k)
                    fps.append(hv - (1 << 64) if hv >= 1 << 63 else hv)
            out = {"doc_id": pd.Series(ids, dtype="int64")}
            for c in extra:
                out[c] = pdf[c].iloc[keep].reset_index(drop=True)
            out["win_idx"] = pd.Series(idxs, dtype="int64")
            out["afp"] = pd.Series(fps, dtype="int64")
            yield pd.DataFrame(out)

    schema = StructType(
        [StructField("doc_id", LongType())]
        + [media.schema[c] for c in extra]
        + [StructField("win_idx", LongType()), StructField("afp", LongType())]
    )
    return media.select(
        F.col(id_col).alias(id_col),
        F.col(payload_col).alias(payload_col),
        *[F.col(c) for c in extra],
    ).mapInPandas(_stage, schema=schema)


def audio_window_near_dup_pairs(
    window_sigs: DataFrame,
    *,
    id_col: str = "doc_id",
    sig_col: str = "afp",
    max_hamming: int = 4,
    min_match_frac: float = 0.8,
    n_blocks: int | None = None,
    block_ball: int = 0,
) -> DataFrame:
    """Trim-robust audio near-dup via WINDOW-HASH SET OVERLAP — the
    video gate's machinery on :func:`audio_window_fingerprints` rows:
    two clips are near-dups when ``>= min_match_frac`` of the smaller
    one's distinct window subfingerprints have a
    within-``max_hamming`` match in the other. A window-aligned trim
    keeps every surviving window byte-identical, so trim↔original
    overlap = 1 on the trim's side; unrelated clips share ~nothing and
    a single-window collision is absorbed by the fraction threshold.
    Plan shape inherited wholesale (per-clip DISTINCT hash sets, the
    shared ``_block_candidates`` pigeonhole equi-join with the exact
    multi-index mode available, one aggregate per candidate pair).
    Returns ``(id_a, id_b, n_matched, match_frac)`` with
    ``id_a < id_b``."""
    from .phash import video_near_dup_pairs

    return video_near_dup_pairs(
        window_sigs,
        video_col=id_col,
        sig_col=sig_col,
        max_hamming=max_hamming,
        min_match_frac=min_match_frac,
        n_blocks=n_blocks,
        block_ball=block_ball,
    ).select(
        F.col("video_a").alias("id_a"),
        F.col("video_b").alias("id_b"),
        "n_matched",
        "match_frac",
    )


def audio_near_dup_pairs(
    media: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 4,
    normalize_rate: int | None = None,
) -> DataFrame:
    """End-to-end audio near-dup: [optional rate-normalize ∘] spectral
    fingerprint ∘ Hamming block-LSH (the shared
    :func:`.phash.hamming_near_pairs` / ``_block_rows`` pigeonhole
    path). Re-encodes (bit depth, channel layout, gain) of the same
    signal land at Hamming 0 by arithmetic; unrelated clips sit near
    Binomial(64, 1/2).

    ``normalize_rate`` is the NORMALIZE-THEN-FINGERPRINT posture the
    raw kernel's docstring prescribes: run :func:`resample_audio` to a
    common rate first, so rate variants of the same signal fingerprint
    from the same sample stream. For sample-replicated rate variants
    (a k-times nearest upsample, the audio twin of the image tier's
    integer-upscale family) normalization is EXACT — nearest k*r → r
    picks every k-th sample, inverting the replication bit-for-bit —
    while generic resampled audio lands within the empirical few-bit
    band. Without it, cross-RATE copies can drift past the gate radius
    (pinned in tests). Returns verified ``(id_a, id_b, hamming)``."""
    from .phash import hamming_near_pairs

    if normalize_rate is not None:
        media = resample_audio(
            media.select(
                F.col(id_col).alias("doc_id"),
                F.col(payload_col).alias("payload"),
            ),
            target_rate=normalize_rate,
        ).select("doc_id", "payload")
        id_col, payload_col = "doc_id", "payload"
    return hamming_near_pairs(
        audio_fingerprints(media, id_col=id_col, payload_col=payload_col),
        id_col="doc_id",
        sig_col="afp",
        max_hamming=max_hamming,
    )


def resample_audio(
    media: DataFrame, *, target_rate: int = 8000
) -> DataFrame:
    """Mono-downmix + nearest resample as payload-in/payload-out
    ``mapInPandas`` — the audio twin of ``binary.resize_images``'s real
    path: WAV in, PCM16 mono WAV at ``target_rate`` out; payloads the
    codec can't handle are QUARANTINED (row dropped). Map-only."""
    _, _wav_decode, _wav_encode, _resample = _stdlib_wav_codec()
    out_rate = target_rate

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, ns, payloads = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    rate, chans = _wav_decode(bytes(payload))
                    r2, mono = _resample(rate, chans, out_rate)
                    enc = _wav_encode(r2, mono)
                except Exception:
                    continue  # quarantine
                ids.append(doc_id)
                rates.append(r2)
                ns.append(len(mono[0]))
                payloads.append(enc)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return media.mapInPandas(
        _go,
        schema=(
            "doc_id long, sample_rate int, n_samples long, payload binary"
        ),
    )


def _cdc_segment_kernel(
    min_seg: int = 128,
    avg_seg_bits: int = 9,
    max_seg: int = 4096,
    n_segments: int = 9,
    n_bands: int = 9,
    f_lo: float = 200.0,
    f_hi: float = 3600.0,
    anchor: str = "amplitude",
):
    """CONTENT-DEFINED segmentation + per-segment spectral fingerprint
    — the arbitrary-offset audio dedup tier (r10 verdict #2),
    factory-nested per the pickle house rule.

    The fixed-window tier (:func:`_audio_window_fingerprint_kernel`)
    is trim-robust only for trims aligned to the window grid; an
    arbitrary trim shifts every window and every subfingerprint
    diverges (pinned as honest degradation in its gate). The published
    fix is the CDC idiom (Muthitacharoen et al. 2001 LBFS; FastCDC;
    the rolling-hash anchoring Dolma's CCNet lineage uses for text
    spans): segment boundaries are chosen by a ROLLING HASH of the
    content itself, so any two clips sharing a run of samples choose
    the SAME boundaries inside that run — after at most one segment
    past the edit, the segmentations RE-SYNCHRONIZE and every interior
    segment is byte-identical, whatever the trim offset.

    Mechanics: the stream is the exact-mean mono downmix floored to
    int (channel-layout invariant by the same arithmetic as the
    whole-clip kernel). A Gear rolling hash (one table lookup + shift
    per sample; the table is a fixed md5-derived constant, so the
    kernel is fully deterministic) anchors a boundary wherever the
    hash's low ``avg_seg_bits`` bits are zero — expected segment
    ``2^avg_seg_bits`` samples (default 512: ~31 segments per 16k-
    sample clip, sized so a two-edge arbitrary trim keeps measured
    worst-case overlap ~0.83 across 120 lattice seeds, far above
    the 0.5 pair threshold). ``min_seg`` suppresses anchors too
    close to the previous cut and ``max_seg`` forces a cut in
    anchor-free runs (the FastCDC normalization pair); both are
    STATEFUL relative to the last cut, so segments adjacent to an edit
    or a forced cut may differ between copies — but state resets at
    every content anchor, so the re-sync guarantee survives: shared
    content re-aligns at its first post-edit anchor. Each segment >=
    ``8 * n_segments`` samples is fingerprinted with the SAME banded
    spectral-energy sign kernel as every other audio tier (64 bits,
    shared pair machinery); shorter segments are skipped — identically
    on both copies, because whether a shared segment is short is a
    property of the content, not the clip.

    Honesty notes (``anchor="amplitude"``, the default): the Gear hash
    runs over raw sample values, so CDC matching requires the shared
    run to be SAMPLE-identical — it covers trims/splices/padding and
    the exact re-encode axes (channel layout, 8-bit lattice), but NOT
    gain changes (a scaled copy moves every anchor; the whole-clip
    kernel keeps gain invariance because only energy SIGNS survive —
    here the segmentation itself consumes amplitudes).

    ``anchor="sign"`` (r11 verdict #6) closes that last matrix cell:
    the Gear stream is the SIGN of each downmixed sample ({-1, 0, +1}
    → three table symbols), which any positive gain preserves exactly
    — so a gain-scaled trim chooses the SAME boundaries inside every
    shared run, and the per-segment fingerprint is gain-invariant BY
    the band-energy-sign arithmetic (scaling by ``c`` scales energies
    by ``c^2``; the double-difference sign is unchanged) — the whole
    gain x trim axis lands EXACT, no tolerance. The trade: the sign
    stream carries ~1 bit/sample, so pathological inputs (constant
    DC, pure silence) anchor degenerately — constant-valued segments
    are SKIPPED in both modes (a silent segment fingerprints
    identically across UNRELATED clips; skipping is content-
    determined, hence identical on copies — the flat-run rule the
    image row-CDC tier uses). Returns
    ``segments(rate, channels) -> [(seg_idx, bits), ...]``."""
    import hashlib

    import numpy as np

    if anchor not in ("amplitude", "sign"):
        raise ValueError(f"unknown CDC anchor mode {anchor!r}")
    use_sign = anchor == "sign"
    base = _audio_fingerprint_kernel(n_segments, n_bands, f_lo, f_hi)
    mask = np.uint64((1 << avg_seg_bits) - 1)
    gear = np.array(
        [
            int.from_bytes(
                hashlib.md5(b"cdc-gear:" + bytes([b])).digest()[:8],
                "big",
            )
            for b in range(256)
        ],
        dtype=np.uint64,
    )
    min_fp = 8 * n_segments

    def segments(rate: int, channels: list[list[int]]):
        chans = [np.asarray(c, dtype=np.float64) for c in channels]
        mono = np.floor(np.mean(chans, axis=0)).astype(np.int64)
        n = len(mono)
        if n == 0:
            return []
        if use_sign:
            idx = (np.sign(mono) + 1).astype(np.int64)
        else:
            idx = ((mono & 0xFF) ^ ((mono >> 8) & 0xFF)).astype(np.int64)
        t = gear[idx]
        h = np.zeros(n, dtype=np.uint64)
        for j in range(64):
            if j:
                h[j:] += t[:-j] << np.uint64(j)
            else:
                h += t
        cand = np.nonzero((h & mask) == np.uint64(0))[0]
        cuts = []
        last = 0
        for i in cand:
            pos = int(i) + 1
            while pos - last > max_seg:
                last += max_seg
                cuts.append(last)
            if pos - last < min_seg:
                continue
            cuts.append(pos)
            last = pos
        while n - last > max_seg:
            last += max_seg
            cuts.append(last)
        bounds = [0] + cuts + [n]
        out = []
        for k in range(len(bounds) - 1):
            lo, hi = bounds[k], bounds[k + 1]
            if hi - lo < min_fp:
                continue  # content-determined skip, identical on copies
            m = mono[lo:hi]
            if int(m.max()) == int(m.min()):
                continue  # constant run (silence/DC): promiscuous
            seg = [c[lo:hi] for c in channels]
            out.append((k, base(rate, seg)))
        return out

    return segments


def audio_cdc_fingerprints(
    media: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    min_seg: int = 128,
    avg_seg_bits: int = 9,
    max_seg: int = 4096,
    anchor: str = "amplitude",
) -> DataFrame:
    """Map-only Arrow stage: ``(id, payload)`` → ``(doc_id, seg_idx,
    afp)`` — one spectral subfingerprint per CONTENT-DEFINED segment
    (:func:`_cdc_segment_kernel`), the arbitrary-offset sibling of
    :func:`audio_window_fingerprints`. Rows feed the SAME set-overlap
    pair machinery (:func:`audio_window_near_dup_pairs`) unchanged —
    ``seg_idx`` rides along for debuggability only; position is
    deliberately not part of the match. Corrupt / non-PCM / sub-
    segment payloads QUARANTINE (zero rows). 8 bytes per ~2^bits
    samples with zero data movement — the 100 TB posture is identical
    to the fixed-window tier, at the same signature bill."""
    _, _wav_decode, _, _ = _stdlib_wav_codec()
    _segs = _cdc_segment_kernel(min_seg, avg_seg_bits, max_seg,
                                anchor=anchor)

    def _stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    rate, chans = _wav_decode(bytes(payload))
                    rows = _segs(rate, chans)
                except Exception:
                    continue  # quarantine: undecodable / low-rate clip
                for k, hv in rows:
                    ids.append(doc_id)
                    idxs.append(k)
                    fps.append(hv - (1 << 64) if hv >= 1 << 63 else hv)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "seg_idx": pd.Series(idxs, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(_stage, schema="doc_id long, seg_idx long, afp long")


def audio_cdc_near_dup_pairs(
    media: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 4,
    min_match_frac: float = 0.5,
    min_seg: int = 128,
    avg_seg_bits: int = 9,
    max_seg: int = 4096,
    anchor: str = "amplitude",
) -> DataFrame:
    """End-to-end ARBITRARY-OFFSET audio near-dup: content-defined
    segmentation ∘ per-segment spectral fingerprint ∘ the shared
    window-set-overlap pair machinery. An arbitrarily trimmed copy
    re-synchronizes after at most one segment per edited edge, so its
    interior segments fingerprint identically and the pair survives
    any ``min_match_frac`` with edge-segment slack (default 0.5: a
    copy must share half its distinct segment fingerprints — far
    above the ~zero overlap of unrelated clips, far below the
    ~(k-2)/k of a two-edge trim at k segments). Returns verified
    ``(id_a, id_b, n_matched, match_frac)`` with ``id_a < id_b``.

    SCOPE DECISION — tempo/pitch-shifted copies (r12 verdict #7, the
    dihedral/off-MCU precedent): OUT OF SCOPE, permanently, for this
    engine's exact tier. The audio robustness matrix is deliberately
    closed at gain × arbitrary-trim × integer-rate: each of those
    transforms preserves some exact arithmetic invariant (signs under
    positive gain, interior bytes under trims, replicated samples
    under k× rates) that a Hamming-0/near-0 fingerprint can ride. A
    tempo or pitch shift preserves NONE — resampling at a non-integer
    ratio INTERPOLATES every sample, every CDC anchor moves (the Gear
    stream is computed over new sample values), every analysis window
    covers different content, and the band-energy lattice itself
    stretches in time and shifts in frequency — so no exact-hash
    method can recover it even in principle; that is an information
    boundary of the signal transform, not a kernel gap. Recovering
    tempo-shifted re-uploads takes tolerance-based spectral methods
    (constellation/landmark hashing over time-frequency peaks —
    Wang's Shazam design — or beat-synchronous chroma), whose
    scoring is inherently approximate and has no DuckDB-replayable
    oracle; a production deployment layers such a perceptual tier on
    top of this exact one. The divergence is pinned by
    ``test_tempo_shift_divergence_pinned_out_of_scope``: a 1.1x
    linear-interp tempo copy shares ZERO fingerprints with its
    original under BOTH CDC anchors and the whole-clip kernel."""
    sigs = audio_cdc_fingerprints(
        media,
        id_col=id_col,
        payload_col=payload_col,
        min_seg=min_seg,
        avg_seg_bits=avg_seg_bits,
        max_seg=max_seg,
        anchor=anchor,
    )
    return audio_window_near_dup_pairs(
        sigs,
        id_col="doc_id",
        sig_col="afp",
        max_hamming=max_hamming,
        min_match_frac=min_match_frac,
    )
