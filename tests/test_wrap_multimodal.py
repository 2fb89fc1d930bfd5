"""Tests for the testdata adapters and multimodal metadata stages."""

import numpy as np
import pyarrow as pa
import pytest

from distributed_system___ocr_ray import corpus
from distributed_system___ocr_ray.functions import glyph

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestWrap:
    def test_flat_as_spans_identity_extraction(self):
        """flat wrap -> full pipeline == identity on plain text (SQL-checkable)."""
        import duckdb

        from distributed_system___ocr_ray.pipelines import extract as pipeline
        from distributed_system___ocr_ray.sources import wrap

        ds = wrap.flat_as_spans(SF)
        out = pipeline.extract_dataset(ds, {}, num_partitions=8).to_pandas()
        got = {}
        for _, row in out.iterrows():
            spans = row["spans"]
            assert len(spans) == 1 and spans[0]["order"] == 0
            got[int(row["doc_id"].split("-")[1])] = spans[0]["text"]
        exp = duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE trim(text) <> ''"
        ).df()
        assert len(got) == len(exp)
        for did, text in zip(exp["doc_id"], exp["text"]):
            assert got[int(did)] == text

    def test_interleaved_matches_oracle(self):
        from distributed_system___ocr_ray import oracle
        from distributed_system___ocr_ray.pipelines import extract as pipeline
        from distributed_system___ocr_ray.sources import wrap

        ds, store = wrap.interleaved_from_documents(SF, replicate=1)
        docs_tbl = pa.Table.from_pandas(ds.to_pandas(), schema=corpus.DOC_SCHEMA)
        expected = oracle.extract_table(docs_tbl, corpus.media_dict(store))
        out = pipeline.extract_dataset(ds, store, num_partitions=8).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == expected.column("doc_id").to_pylist()
        for i, spans in enumerate(out["spans"]):
            e = expected.column("spans")[i].as_py()
            g = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in spans]
            en = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in e]
            assert g == en

    def test_replicate(self):
        from distributed_system___ocr_ray.sources import wrap

        ds, _ = wrap.interleaved_from_documents(SF, replicate=3)
        assert ds.count() == 3 * 500


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_media_metadata(self):
        import ray.data as rd

        from distributed_system___ocr_ray.stages import multimodal

        store = corpus.build_media_store(n_img=20, n_pdf=10, seed=42, corrupt_frac=0.0)
        ds = rd.from_arrow(store)
        out = multimodal.media_metadata(ds).to_pandas().set_index("media_ref")
        assert (out.loc[out["media_kind"] == "gly1", "height"] == glyph.GLYPH_H).all()
        assert len(out[out["media_kind"] == "gly1"]) == 20
        assert len(out[out["media_kind"] == "mpdf1"]) == 10
        assert (out["n_bytes"] > 0).all()

    def test_image_resize_real_and_fake(self):
        from distributed_system___ocr_ray.stages.multimodal import ImageResize

        font = glyph.GlyphFont()
        payload = font.render("Resize me please")
        batch = pa.table({"media_ref": ["a", "b"], "payload": [payload, b"JPEGnotreally"]})
        out = ImageResize(target=(7, 42), fake=True)(batch)
        resized = out.column("payload")[0].as_py()
        assert resized[:4] == glyph.MAGIC
        h, w = font.dims(resized)
        assert (h, w) == (7, 42)
        assert out.column("payload")[1].as_py().startswith(b"FAKE0")

    def test_image_resize_strict_raises(self):
        from distributed_system___ocr_ray.stages.multimodal import ImageResize

        batch = pa.table({"media_ref": ["b"], "payload": [b"JPEGnotreally"]})
        with pytest.raises(NotImplementedError):
            ImageResize(fake=False)(batch)

    def test_frame_sampler_fanout(self):
        import ray.data as rd

        from distributed_system___ocr_ray.stages.multimodal import FrameSampler

        store = corpus.build_media_store(n_img=6, n_pdf=0, seed=42, corrupt_frac=0.0)
        ds = rd.from_arrow(store.select(["media_ref", "payload"]))
        out = ds.map_batches(
            FrameSampler, fn_constructor_kwargs={"n_frames": 4},
            batch_format="pyarrow", batch_size=4, concurrency=2,
        ).to_pandas()
        assert len(out) == 6 * 4
        assert set(out["frame_idx"]) == {0, 1, 2, 3}
        assert out["frame"].map(lambda b: b.startswith(b"FRAME0")).all()

    def test_frame_sampler_strict_raises(self):
        from distributed_system___ocr_ray.stages.multimodal import FrameSampler

        batch = pa.table({"media_ref": ["a"], "payload": [b"xxxx"]})
        with pytest.raises(NotImplementedError):
            FrameSampler(fake=False)(batch)
