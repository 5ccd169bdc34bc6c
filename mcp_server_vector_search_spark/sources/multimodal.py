"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as
``binary`` columns next to typed metadata, processed by Arrow-batched
``mapInPandas`` (one Python worker per partition, whole-batch numpy
work, no per-row serde).  This module implements that plumbing for
real; the actual media decoding is STUBBED (this container ships no
image/audio libraries) behind an import-try plus a deterministic fake,
so the Spark-side contract — schema, batch iteration, partition
behavior — is fully exercised by tests and the driver.

Sources for real payloads would be ``spark.read.format("binaryFile")``
or ``format("image")``; here the testdata's ``documents.text`` is
encoded to bytes as a stand-in payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .tables import load_table

META_SCHEMA = (
    "doc_id long, modality string, byte_len long, sha256 string, "
    "fake_width int, fake_height int"
)


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Stand-in ingest: text → utf-8 bytes as the opaque payload column.
    Real pipelines read payloads via binaryFile/image sources; from this
    point on the engine treats the column as opaque bytes either way."""
    return documents.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("modality"),
    )


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Decode stub: deterministic fake dimensions derived from the
    payload bytes.  The real implementation would be e.g. PIL:

        from PIL import Image; im = Image.open(io.BytesIO(payload))
        return im.width, im.height

    The fake is the unconditional path until a real codec is wired in
    (the stand-in payloads are utf-8 text, not decodable images, so
    probing for PIL here would be wrong even where it IS installed);
    it keeps tests and schema real while the codec is absent.
    """
    digest = hashlib.sha256(payload).digest()
    return 16 + digest[0] % 240, 16 + digest[1] % 240


def extract_metadata(with_payload: DataFrame) -> DataFrame:
    """mapInPandas over binary payloads: per-batch metadata extraction.

    The batch shape is the contract: each pandas DataFrame holds one
    Arrow batch of (doc_id, payload, modality); output rows align 1:1.
    Feature extraction / resize / frame-sampling plug in at the same
    spot with a different output schema.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                }
            )

    return with_payload.mapInPandas(decode_batches, schema=META_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string"
FRAME_BYTES = 500  # fake codec: one "frame" per 500 payload bytes


def resize_images(with_payload: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: batch-in/batch-out 1:1 transform over binary
    payloads.  The resample kernel is stubbed (no PIL/cv2 in this
    container) with a deterministic re-encode; the Spark contract —
    binary-in/binary-out schema, Arrow batching, partition preservation
    — is the real part.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                # real impl: PIL Image.open(...).resize((width, height))
                digest = hashlib.sha256(p).digest()
                out.append(digest * (width * height // len(digest) + 1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return with_payload.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


def sample_frames(with_payload: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: 1:N batch fan-out (each payload row
    yields ``1 + len // FRAME_BYTES`` frame rows).  The "frame" is a
    deterministic digest of (payload, index) so the operator is fully
    oracle-checkable even with the codec stubbed; a real video codec
    plugs into the same mapInPandas slot emitting binary frames.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = 1 + len(p) // FRAME_BYTES
                for k in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(k)
                    hashes.append(
                        hashlib.md5(p + b"#" + str(k).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return with_payload.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=f"""
SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
       md5(text || '#' || CAST(k AS VARCHAR)) AS frame_hash
FROM documents, UNNEST(range(0, 1 + LENGTH(text) // {FRAME_BYTES})) AS t(k)
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(docs))


@register(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       'image' AS modality,
       LENGTH(text) AS byte_len,
       sha256(text) AS sha256
FROM documents
""",
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction, oracle-checked on the parts
    DuckDB can reproduce (byte length + sha256 of the utf-8 payload);
    the fake decode dimensions are engine-internal and excluded."""
    docs = load_table(spark, sf_dir, "documents")
    meta = extract_metadata(attach_binary_payload(docs))
    return meta.select("doc_id", "modality", "byte_len", "sha256")


RESIZE_W, RESIZE_H = 64, 64
_RESIZE_OUT_LEN = 32 * (RESIZE_W * RESIZE_H // 32 + 1)  # digest-tiled stub


@register(
    "multimodal_resize",
    oracle=f"""
SELECT doc_id,
       CAST({RESIZE_W} AS INTEGER) AS width,
       CAST({RESIZE_H} AS INTEGER) AS height,
       CAST({_RESIZE_OUT_LEN} AS INTEGER) AS out_len,
       substr(sha256(text), 1, 8) AS head_hex
FROM documents
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize transform end to end through the Arrow boundary: each
    payload row comes back as a {RESIZE_W}×{RESIZE_H} re-encoded binary
    (stub codec: sha256 digest tiled to the target byte budget), and
    the registered result projects VALUES DERIVED FROM THE ACTUAL
    OUTPUT BYTES — the byte length and the leading digest hex — so the
    oracle's independent arithmetic verifies the mapInPandas batch
    path produced exactly the bytes the stub specifies.  A real PIL/cv2
    kernel swaps into the same slot; the Spark contract (schema, Arrow
    batching, 1:1 row preservation) is what this row certifies."""
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_images(attach_binary_payload(docs), RESIZE_W, RESIZE_H)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("int").alias("out_len"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("head_hex"),
    )
