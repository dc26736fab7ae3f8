"""Multimodal binary-column plumbing (SURVEY.md §7.5, BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing here is real and tested — schema, Arrow-batched
``mapInPandas`` decode stage, partition-safe batch shape. The actual codec is
STUBBED: this container has no image/audio libraries, so ``decode_image``
raises NotImplementedError and the pipeline runs a clearly-marked
deterministic fake (arithmetic on payload bytes) instead. Swapping the fake
for a PIL/libav call changes ONE function, not the dataflow.

Scale notes: the decode stage is map-only (no shuffle); Arrow batches cross
the Python boundary (``spark.sql.execution.arrow.maxRecordsPerBatch``
controls peak memory per batch). Partitioning carries over from the source,
so a 100 TB media table decodes with zero data movement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..util import fan_out

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha16", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mime", StringType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """REAL codec hook — intentionally unimplemented in this container.

    A deployment with Pillow available implements this as
    ``Image.open(io.BytesIO(payload)).size``.
    """
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; use fake_decode for deterministic testing"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode_image: dimensions derived from the
    payload length (mirrorable in the SQL oracle)."""
    n = len(payload)
    return (n % 64 + 16, (n * 7) % 64 + 16)


def attach_fake_payload(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Make a (doc_id, payload binary) frame from documents — the stand-in
    for a real media table (no binary fixture exists).

    fan_out here, not in the decode stage: a real media table arrives in
    many splits and must decode with zero data movement, but this adapter
    feeds from a single-file fixture that would otherwise decode on 1 core.
    """
    return fan_out(docs).select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_binary_features(
    media: DataFrame, *, use_fake_codec: bool = True
) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads.

    Yields one output row per input row: byte length, sha256 prefix, and
    decoded dimensions (fake codec unless a real one is wired in).
    """
    # The closure must be fully self-contained: Spark's Python workers
    # unpickle it WITHOUT this package on their sys.path, so referencing
    # module-level functions (pickled by reference) would fail with
    # ModuleNotFoundError on the worker. Locals pickle by value.
    if use_fake_codec:
        def decode(payload: bytes) -> tuple[int, int]:
            n = len(payload)
            return (n % 64 + 16, (n * 7) % 64 + 16)
    else:
        def decode(payload: bytes) -> tuple[int, int]:
            raise NotImplementedError(
                "image decoding requires an image library not present in "
                "this container"
            )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # stdlib import inside the closure: worker-safe

        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payloads keep their row with NULL features (matching
            # the oracle's octet_length(NULL)/sha256(NULL) semantics)
            # instead of crashing the worker on len(None).
            dims = [None if p is None else decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in payloads],
                        dtype="Int64",
                    ),
                    "sha16": payloads.map(
                        lambda p: None
                        if p is None
                        else hashlib.sha256(p).hexdigest()[:16]
                    ),
                    "width": pd.array(
                        [None if d is None else d[0] for d in dims],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [None if d is None else d[1] for d in dims],
                        dtype="Int32",
                    ),
                    "mime": "image/fake",
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


#: Output schema of the frame-sampling stage (1 -> N rows per video).
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha16", StringType()),
    ]
)

#: Output schema of the resize stage (payload-in, payload-out).
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    *,
    frame_bytes: int = 256,
    every_n: int = 2,
    use_fake_codec: bool = True,
) -> DataFrame:
    """Video frame sampling as 1→N ``mapInPandas``: each payload yields one
    output row per SAMPLED frame (every ``every_n``-th), the shape a
    vision-LM data pipeline needs for frame-level captioning/filtering.

    The REAL codec seam (libav/ffmpeg keyframe iteration) is absent in
    this container; the fake codec treats the payload as a concatenation
    of fixed-size ``frame_bytes`` chunks — deterministic and mirrorable in
    the SQL oracle (harness ``multimodal_frame_sample``). The Spark-side
    contract is what's being tested: Arrow batch in, MORE rows out (output
    row count ≠ input row count — the generator-shaped mapInPandas case),
    map-only, partitioning preserved, so a 100 TB video table samples with
    zero data movement.
    """
    if not use_fake_codec:
        raise NotImplementedError(
            "video decoding requires libav/ffmpeg, not present in this "
            "container"
        )
    fb, step = frame_bytes, every_n

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, sizes, shas = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payloads (undecodable media) contribute no frames;
                # an EMPTY payload has zero frames, not one — both mirror
                # the harness oracle's generate_series(1, ceil(nb/fb))
                # arithmetic, which emits nothing for nb IN (0, NULL).
                if payload is None:
                    continue
                n_frames = -(-len(payload) // fb)
                for k in range(0, n_frames, step):
                    chunk = payload[k * fb : (k + 1) * fb]
                    ids.append(doc_id)
                    idxs.append(k)
                    sizes.append(len(chunk))
                    shas.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_sha16": pd.Series(shas, dtype="object"),
                }
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def resize_images(
    media: DataFrame,
    *,
    target_w: int = 32,
    target_h: int = 32,
    use_fake_codec: bool = True,
) -> DataFrame:
    """Image resize as payload-in/payload-out ``mapInPandas`` — the
    normalize-before-embed stage of an image pipeline.

    Fake codec: the "resized" payload is the input cycled/truncated to
    exactly ``target_w * target_h`` bytes (deterministic, size-exact);
    the real seam is a Pillow ``Image.resize`` call in the same closure.
    Map-only; output partitioning preserved.
    """
    if not use_fake_codec:
        raise NotImplementedError(
            "image resizing requires an image library not present in this "
            "container"
        )
    w, h = target_w, target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = w * h
        out_payloads, ids = [], []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # undecodable media: dropped, not crash
                    continue
                reps = -(-size // max(len(payload), 1))
                out_payloads.append((payload * reps)[:size])
                ids.append(doc_id)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series([w] * len(ids), dtype="int32"),
                    "height": pd.Series([h] * len(ids), dtype="int32"),
                    "n_bytes": pd.Series(
                        [len(p) for p in out_payloads], dtype="int64"
                    ),
                    "payload": pd.Series(out_payloads, dtype="object"),
                }
            )
            out_payloads, ids = [], []

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)
