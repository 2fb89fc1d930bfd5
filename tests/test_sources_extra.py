"""JSONL source round trip, output publishing, CLI status, strip fuzzing."""

import json
import subprocess
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_system___ocr_ray import corpus, oracle
from distributed_system___ocr_ray.functions.html_strip import strip_boilerplate

from test_pipeline import _assert_span_equality, _sorted_output


@pytest.mark.usefixtures("ray_session")
class TestJsonlSource:
    def test_jsonl_roundtrip_through_pipeline(self, small_corpus, tmp_path):
        from distributed_system___ocr_ray.pipelines import extract as pipeline
        from distributed_system___ocr_ray.sources.jsonl import (
            read_documents_jsonl,
            write_documents_jsonl,
        )

        docs, store = small_corpus
        path = str(tmp_path / "docs.jsonl")
        assert write_documents_jsonl(docs, path) == docs.num_rows
        ds = read_documents_jsonl(path)
        expected = oracle.extract_table(docs, corpus.media_dict(store))
        out = _sorted_output(pipeline.extract_dataset(ds, store, num_partitions=8))
        _assert_span_equality(out, expected)

    def test_normalizer_defaults(self, tmp_path):
        from distributed_system___ocr_ray.sources.jsonl import read_documents_jsonl

        # NOTE: pyarrow's JSON reader needs type-consistent rows; the
        # normalizer's job is filling MISSING span fields and dropping extras
        p = tmp_path / "sparse.jsonl"
        p.write_text(
            json.dumps({"doc_id": 7, "spans": [{"kind": "text", "text": "hi", "junk": 1}]}) + "\n"
            + json.dumps({"doc_id": 8, "spans": []}) + "\n"
        )
        rows = sorted(read_documents_jsonl(str(p)).take_all(), key=lambda r: r["doc_id"])
        assert rows[0]["doc_id"] == "7"
        span = rows[0]["spans"][0]
        assert span["media_ref"] == "" and span["offset"] == 0 and "junk" not in span
        assert rows[1]["spans"] == []


@pytest.mark.usefixtures("ray_session")
class TestPublishAndStatus:
    def test_publish_then_read_as_table(self, small_corpus, tmp_path):
        from distributed_system___ocr_ray.pipelines.sharded import run_extraction_sharded
        from distributed_system___ocr_ray.sources import lance_like

        docs, store = small_corpus
        docs_dir = str(tmp_path / "docs")
        lance_like.write_table(docs, docs_dir, rows_per_fragment=20)
        out_dir = str(tmp_path / "out")
        m = run_extraction_sharded(docs_dir, store, out_dir, concurrency=2)

        repo = "/root/repo"
        pub = subprocess.run(
            [sys.executable, "-m", "distributed_system___ocr_ray", "publish", "--output", out_dir],
            cwd=repo, capture_output=True, text=True,
        )
        assert pub.returncode == 0, pub.stderr
        # the published table reads back with the standard reader
        tbl = lance_like.read_arrow(out_dir)
        assert tbl.num_rows == m["docs_out"]

        stat = subprocess.run(
            [sys.executable, "-m", "distributed_system___ocr_ray", "status", "--output", out_dir],
            cwd=repo, capture_output=True, text=True,
        )
        info = json.loads(stat.stdout.strip().splitlines()[-1])
        assert info["docs_out"] == m["docs_out"]
        assert sum(info["status_counts"].values()) == info["rows_in"]


@pytest.mark.usefixtures("ray_session")
class TestStreamingWriter:
    def test_write_dataset_roundtrip_and_append(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.sources import lance_like

        docs = corpus.build_documents(n_docs=90, seed=13)
        tdir = str(tmp_path / "tbl")
        man = lance_like.write_dataset(rd.from_arrow(docs), tdir, rows_per_fragment=25)
        assert sum(f["rows"] for f in man["fragments"]) == 90
        back = lance_like.read_arrow(tdir)
        assert back.num_rows == 90
        assert sorted(back.column("doc_id").to_pylist()) == sorted(
            docs.column("doc_id").to_pylist()
        )
        # append a second dataset: prior fragments stay listed
        more = corpus.build_documents(n_docs=30, seed=14)
        man2 = lance_like.write_dataset(
            rd.from_arrow(more), tdir, rows_per_fragment=25, mode="append"
        )
        assert sum(f["rows"] for f in man2["fragments"]) == 120
        assert lance_like.read_arrow(tdir).num_rows == 120


class TestStripFuzz:
    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def test_strip_never_raises(self, text):
        out = strip_boilerplate(text)
        assert isinstance(out, str)

    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet="<>/abp di&;#'\"=\n ", max_size=200))
    def test_strip_taggy_soup_never_raises(self, text):
        assert isinstance(strip_boilerplate(text), str)
