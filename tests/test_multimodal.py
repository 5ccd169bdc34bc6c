"""Multimodal plumbing: batch shapes, determinism, PIL-independence."""

from __future__ import annotations

import sys
import types

from mcp_server_vector_search_spark.sources.multimodal import (
    FRAME_BYTES,
    _decode_image,
    attach_binary_payload,
    extract_metadata,
    resize_images,
    sample_frames,
)
from mcp_server_vector_search_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_decode_stub_is_pil_independent():
    """The fake decode must behave identically whether or not a PIL
    module is importable (round-1 bug: an installed PIL raised
    NotImplementedError past the ImportError guard)."""
    payload = b"not actually an image"
    without = _decode_image(payload)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.ModuleType("PIL.Image")
    sys.modules["PIL"] = fake_pil
    sys.modules["PIL.Image"] = fake_pil.Image
    try:
        with_pil = _decode_image(payload)
    finally:
        del sys.modules["PIL"], sys.modules["PIL.Image"]
    assert without == with_pil
    w, h = without
    assert 16 <= w < 256 and 16 <= h < 256


def test_metadata_rows_align_one_to_one(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    meta = extract_metadata(attach_binary_payload(docs))
    assert meta.count() == docs.count()
    row = meta.orderBy("doc_id").head()
    assert row["modality"] == "image" and len(row["sha256"]) == 64


def test_resize_preserves_rows_and_dims(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    out = resize_images(attach_binary_payload(docs), 32, 24).collect()
    assert len(out) == 20
    assert all(r["width"] == 32 and r["height"] == 24 for r in out)
    assert all(len(r["payload"]) >= 32 * 24 for r in out)


def test_frame_fanout_count(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    payloads = {r["doc_id"]: r["text"] for r in docs.collect()}
    frames = sample_frames(attach_binary_payload(docs))
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    for doc_id, text in payloads.items():
        assert per_doc[doc_id] == 1 + len(text.encode()) // FRAME_BYTES
