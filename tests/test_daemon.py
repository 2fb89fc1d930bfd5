"""Ingest daemon: drop-directory tail, durable ledger, SIGKILL resume."""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _drop_file(drop_dir, name, ids, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        os.path.join(drop_dir, name))


def _mk_texts(lo, hi, dup_of=None):
    return [f"alpha beta gamma delta epsilon zeta token{i} end" for i in
            (dup_of if dup_of is not None else range(lo, hi))]


@pytest.mark.usefixtures("ray_session")
class TestDaemon:
    def test_run_once_ledger_and_idempotence(self, tmp_path):
        from distributed_system___ocr_ray.pipelines import daemon
        from distributed_system___ocr_ray.sources import lance_like

        drop = tmp_path / "drop"; drop.mkdir()
        corpus_dir = str(tmp_path / "corpus")
        state = str(tmp_path / "state.json")
        metrics = str(tmp_path / "metrics.jsonl")
        _drop_file(str(drop), "a.parquet", range(0, 50), _mk_texts(0, 50))
        # b overlaps a's content: 20 cross-file dups + 30 new
        _drop_file(str(drop), "b.parquet", range(100, 150),
                   _mk_texts(0, 0, dup_of=list(range(30, 80))))
        rows = daemon.run_once(str(drop), corpus_dir, state,
                               metrics_path=metrics,
                               min_quality_ppm=0, max_top_token_ppm=10**6)
        assert [r["file"] for r in rows] == ["a.parquet", "b.parquet"]
        assert rows[0]["after_novelty"] == 50
        assert rows[1]["after_novelty"] == 30  # 20 already in corpus
        got = lance_like.read_arrow(corpus_dir)
        assert got.num_rows == 80
        # ledger: a second pass is a no-op
        assert daemon.run_once(str(drop), corpus_dir, state,
                               min_quality_ppm=0, max_top_token_ppm=10**6) == []
        with open(metrics) as f:
            assert len(f.readlines()) == 2
        st = json.load(open(state))
        assert set(st["done"]) == {"a.parquet", "b.parquet"}

    def test_crash_between_append_and_ledger_no_duplicates(self, tmp_path):
        """The dangerous window: increment COMMITTED to the corpus, ledger
        never written (SIGKILL right there). The rerun must reprocess the
        file (at-least-once) yet append nothing (content-addressed
        novelty) -- exactly-once corpus effects."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose, daemon
        from distributed_system___ocr_ray.sources import lance_like

        drop = tmp_path / "drop"; drop.mkdir()
        corpus_dir = str(tmp_path / "corpus")
        state = str(tmp_path / "state.json")
        _drop_file(str(drop), "a.parquet", range(0, 40), _mk_texts(0, 40))
        # simulate the killed run: increment committed, ledger absent
        tbl = pq.read_table(os.path.join(str(drop), "a.parquet"))
        compose.ingest_increment(rd.from_arrow(tbl), corpus_dir,
                                 min_quality_ppm=0, max_top_token_ppm=10**6)
        assert lance_like.read_arrow(corpus_dir).num_rows == 40
        # restart: file is pending again, reprocessed, appends 0
        rows = daemon.run_once(str(drop), corpus_dir, state,
                               min_quality_ppm=0, max_top_token_ppm=10**6)
        assert rows[0]["after_novelty"] == 0
        got = lance_like.read_arrow(corpus_dir)
        assert got.num_rows == 40  # no duplicates
        assert len(set(got.column("text").to_pylist())) == 40

    def test_retry_then_quarantine(self, tmp_path):
        from distributed_system___ocr_ray.pipelines import daemon

        drop = tmp_path / "drop"; drop.mkdir()
        corpus_dir = str(tmp_path / "corpus")
        state = str(tmp_path / "state.json")
        with open(os.path.join(str(drop), "bad.parquet"), "wb") as f:
            f.write(b"not parquet at all")
        for attempt in (1, 2, 3):
            rows = daemon.run_once(str(drop), corpus_dir, state,
                                   max_retries=2)
            assert rows and "error" in rows[0]
        assert rows[0]["quarantined"]
        # quarantined: no longer pending
        assert daemon.run_once(str(drop), corpus_dir, state) == []

    def test_watermark_late_counts(self, tmp_path):
        from distributed_system___ocr_ray.pipelines import daemon

        drop = tmp_path / "drop"; drop.mkdir()
        corpus_dir = str(tmp_path / "corpus")
        state = str(tmp_path / "state.json")
        base = 1_700_000_000_000_000  # us

        def drop_ts(name, ids, ts_us):
            pq.write_table(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([f"alpha beta gamma tok{i} end" for i in ids]),
                "ts": pa.array(ts_us, pa.timestamp("us")),
            }), os.path.join(str(drop), name))

        drop_ts("a.parquet", range(0, 5), [base + i * 10**6 for i in range(5)])
        rows = daemon.run_once(str(drop), corpus_dir, state,
                               min_quality_ppm=0, max_top_token_ppm=10**6,
                               allowed_lateness_us=2 * 10**6)
        assert rows[0]["n_late"] == 0  # no watermark yet
        st = json.load(open(state))
        assert st["watermark_us"] == base + 4 * 10**6
        # second file: 2 rows older than watermark - 2s, 1 fresh
        drop_ts("b.parquet", range(10, 13),
                [base - 10**6, base + 10**6, base + 9 * 10**6])
        rows = daemon.run_once(str(drop), corpus_dir, state,
                               min_quality_ppm=0, max_top_token_ppm=10**6,
                               allowed_lateness_us=2 * 10**6)
        assert rows[0]["n_late"] == 2
        st = json.load(open(state))
        assert st["watermark_us"] == base + 9 * 10**6

    def test_watermark_handles_ns_timestamps(self, tmp_path):
        """A timestamp[ns] drop (pandas writer default) must persist the
        same microsecond watermark as a timestamp[us] one (ADVICE r4)."""
        from distributed_system___ocr_ray.pipelines import daemon

        drop = tmp_path / "drop"; drop.mkdir()
        corpus_dir = str(tmp_path / "corpus")
        state = str(tmp_path / "state.json")
        base = 1_700_000_000_000_000  # us
        pq.write_table(pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array([f"alpha beta gamma tok{i} end" for i in range(3)]),
            "ts": pa.array([(base + i * 10**6) * 1000 for i in range(3)],
                           pa.timestamp("ns")),
        }), os.path.join(str(drop), "ns.parquet"))
        daemon.run_once(str(drop), corpus_dir, state,
                        min_quality_ppm=0, max_top_token_ppm=10**6)
        st = json.load(open(state))
        assert st["watermark_us"] == base + 2 * 10**6  # us, not ns

    def test_ledger_appended_uses_near_novelty(self, tmp_path):
        """With the fuzzy gate on, the ledger's appended count must be the
        rows actually written (after_near_novelty), not after_novelty."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose, daemon

        drop = tmp_path / "drop"; drop.mkdir()
        corpus_dir = str(tmp_path / "corpus")
        state = str(tmp_path / "state.json")
        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lam mu nu xi omicron pi rho sigma tau upsilon")
        compose.ingest_increment(
            rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                    "text": [base]})),
            corpus_dir, min_quality_ppm=0, max_top_token_ppm=10**6)
        # drop: a reflowed near-dup (passes exact gate, fails fuzzy) + 1 new
        _drop_file(str(drop), "d.parquet", [10, 11],
                   [base + " extra", "fresh novel sentence with its own "
                                     "words nothing shared at all"])
        rows = daemon.run_once(str(drop), corpus_dir, state,
                               min_quality_ppm=0, max_top_token_ppm=10**6,
                               near_dup_threshold=0.6)
        assert rows[0]["after_novelty"] == 2
        assert rows[0]["after_near_novelty"] == 1
        st = json.load(open(state))
        assert st["done"]["d.parquet"]["appended"] == 1


class TestDaemonSigkill:
    def test_sigkill_mid_run_resumes_exactly_once(self, tmp_path):
        """Real-process crash drill (reference analogue: kill the manager
        mid-dispatch, restart, the ledger carries on): SIGKILL the daemon
        CLI while it processes a multi-file backlog, restart in drain
        mode, and the corpus must hold every unique doc exactly once."""
        drop = tmp_path / "drop"; drop.mkdir()
        corpus_dir = str(tmp_path / "corpus")
        state = str(tmp_path / "state.json")
        n_files, per = 3, 400
        all_texts = set()
        for k in range(n_files):
            ids = range(k * 1000, k * 1000 + per)
            texts = [f"alpha beta gamma delta file{k} tok{i} end"
                     for i in range(per)]
            all_texts.update(texts)
            _drop_file(str(drop), f"f{k}.parquet", ids, texts)
        cmd = [sys.executable, "-m", "distributed_system___ocr_ray",
               "ingest-daemon", "--drop-dir", str(drop),
               "--corpus", corpus_dir, "--state", state,
               "--idle-exit", "1", "--no-hygiene", "--num-cpus", "2"]
        env = dict(os.environ, PYTHONPATH=REPO)
        proc = subprocess.Popen(cmd, cwd=REPO, env=env,
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        # kill as soon as the ledger shows the first file committed --
        # the process is then mid-backlog (usually mid-increment #2)
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(state) and json.load(open(state))["done"]:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.05)
        if proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
        done_after_kill = len(json.load(open(state))["done"]) if os.path.exists(state) else 0
        assert done_after_kill < n_files, "kill landed after all files -- too slow"
        # restart in drain mode: must finish the backlog
        r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-800:]
        from distributed_system___ocr_ray.sources import lance_like

        got = lance_like.read_arrow(corpus_dir)
        texts = got.column("text").to_pylist()
        assert len(texts) == len(all_texts) == len(set(texts)), (
            len(texts), len(all_texts))
        assert set(texts) == all_texts
        st = json.load(open(state))
        assert len(st["done"]) == n_files


@pytest.mark.usefixtures("ray_session")
class TestNearDupIngest:
    def test_near_dup_gate_drops_reflowed_recrawl(self, tmp_path):
        """Fuzzy second gate: a lightly-edited re-crawl of a committed doc
        (exact hash differs, shingle Jaccard high) is dropped; a genuinely
        new doc survives."""
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose
        from distributed_system___ocr_ray.sources import lance_like

        corpus_dir = str(tmp_path / "corpus")
        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lam mu nu xi omicron pi rho sigma tau upsilon")
        day1 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "text": [base, "completely different words entirely "
                                        "unrelated content here now"]})
        compose.ingest_increment(rd.from_arrow(day1), corpus_dir,
                                 min_quality_ppm=0, max_top_token_ppm=10**6)
        # day2: a reflowed near-dup of doc 1 (one token appended) + a new doc
        day2 = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                         "text": [base + " extra",
                                  "fresh novel sentence with its own words "
                                  "nothing shared with prior documents"]})
        stats = compose.ingest_increment(
            rd.from_arrow(day2), corpus_dir,
            min_quality_ppm=0, max_top_token_ppm=10**6,
            near_dup_threshold=0.6)
        assert stats["after_novelty"] == 2       # exact gate passes both
        assert stats["after_near_novelty"] == 1  # fuzzy gate drops the reflow
        got = lance_like.read_arrow(corpus_dir)
        ids = set(got.column("doc_id").to_pylist())
        assert ids == {1, 2, 11}


@pytest.mark.usefixtures("ray_session")
class TestGopherIngest:
    def test_gopher_gate_in_hygiene(self, tmp_path):
        import ray.data as rd

        from distributed_system___ocr_ray.pipelines import compose

        corpus_dir = str(tmp_path / "corpus")
        long_good = " ".join(["the"] * 5 + [f"word{i}" for i in range(55)])
        short = "the and tiny"
        tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                        "text": [long_good, short]})
        stats = compose.ingest_increment(
            rd.from_arrow(tbl), corpus_dir,
            min_quality_ppm=0, max_top_token_ppm=10**6, gopher=True)
        # gopher word-count window (>=50) drops the short doc
        assert stats["rows_in"] == 2 and stats["after_hygiene"] == 1
