"""Flagship extraction pipeline wiring (SURVEY.md #3 "Engine lifecycle").

Logical plan (one lazy Dataset; the streaming executor pipelines all stages
with backpressure -- nothing materializes the full input):

    read (Lance-style manifest -> read_parquet)
    -> map_batches(explode + partition-assign [+ resume-prune])   narrow
    -> map_batches(ExtractDispatch actor pool)                    narrow
    -> groupby(part).map_groups(vectorized reassemble)            THE shuffle
    -> per-partition atomic commit + lineage manifest             sink

The reference's three processes (LocalApplication / Manager / Worker) and its
SQS hops collapse into this single plan; queue transport disappears into the
object store (SURVEY.md S9).
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa


def media_fingerprint(media: Any) -> str:
    """Stable identity of the media store for resume validation (part of the
    job-level checkpoint entry): resuming a checkpointed run against a
    DIFFERENT media store must raise, not silently mix partitions extracted
    against different payloads.

    Path-form stores identify as their ordered fragment relpath list
    (fragment files are immutable and version-prefixed in the Lance-style
    contract, so the list pins the payload bytes without reading them);
    combined with :func:`media_compatible` this makes APPENDS resumable --
    the incremental-ingest workflow appends new docs AND the new media they
    reference -- while overwrite rewrites (fresh fragment names) still
    mismatch. A missing/empty table raises FileNotFoundError here, at job
    setup, rather than committing a bogus identity and failing later inside
    actors. In-memory stores hash refs + payload bytes (the media store is
    the broadcast SMALL side by design, so the one-time md5 at job setup is
    cheap) and only resume on exact equality: use a path-backed table for
    incremental workflows."""
    import hashlib

    if isinstance(media, str):
        from ..sources import lance_like

        man = lance_like.read_manifest(media)  # raises if table absent
        frags = ",".join(f["path"] for f in man["fragments"])
        return f"table:{os.path.abspath(media)}:{frags}"
    if isinstance(media, pa.Table):
        from ..corpus import media_dict

        media = media_dict(media)
    h = hashlib.md5()
    for ref in sorted(media):
        payload = media[ref]
        h.update(ref.encode("utf-8"))
        h.update(len(payload).to_bytes(8, "big"))
        h.update(payload)
    return "md5:" + h.hexdigest()[:16]


def media_compatible(committed: str, current: str) -> bool:
    """check_job comparator for the media fingerprint: exact match, or the
    committed path-form fragment list is a strict PREFIX of the current one
    (append-only growth -- committed partitions referenced only refs that
    existed at commit time, all still present byte-identical)."""
    if committed == current:
        return True
    return committed.startswith("table:") and current.startswith(committed + ",")


def docs_fingerprint(docs: Any) -> str:
    """Identity of the documents input for SHUFFLE-plan resume validation.
    Unlike the sharded plan (per-fragment identity, appends resumable), the
    shuffle plan prunes by hash(doc_id)%P, so ANY membership change breaks
    resume -- an appended doc hashing into a committed part would be
    silently dropped. Path-form inputs pin the exact table version;
    in-memory tables hash the doc_id membership. A pre-built Dataset cannot
    be fingerprinted without executing it: identified as
    ``dataset:unverified`` (no protection -- callers resuming Dataset-input
    jobs own input stability; pass the table path to get the guard)."""
    import hashlib

    if isinstance(docs, str):
        from ..sources import lance_like

        man = lance_like.read_manifest(docs)  # raises if table absent
        return f"table:{os.path.abspath(docs)}@{man['version']}"
    if isinstance(docs, pa.Table):
        h = hashlib.md5()
        # sorted: the fingerprint is doc_id MEMBERSHIP, not row order -- the
        # hash%P pruning invariant only needs the id set, so a row-permuted
        # but identical docs table must still resume
        for d in sorted(str(d) for d in docs.column("doc_id").to_pylist()):
            h.update(d.encode("utf-8"))
            h.update(b"\x00")
        return f"docids-md5:{h.hexdigest()[:16]}:{docs.num_rows}"
    return "dataset:unverified"


def _media_handle(media: Any):
    """Broadcast the media store once (ray.put) and wrap the ref so Ray does
    not auto-deref it in fn_constructor_kwargs; actors ray.get it in __init__."""
    import ray

    if isinstance(media, str):  # path to a Lance-style media table: let each
        return media  # actor read it (shared storage at scale)
    if isinstance(media, pa.Table):
        from ..corpus import media_dict

        media = media_dict(media)
    return [ray.put(media)]


def _as_dataset(docs: Any, read_blocks: int | None = None):
    import ray.data as rd

    if isinstance(docs, str):
        from ..sources import lance_like

        # split the read so downstream fused map stages get enough blocks to
        # parallelize (a fused actor stage inherits read-block granularity)
        if read_blocks is None:
            import ray

            read_blocks = max(64, int(ray.cluster_resources().get("CPU", 8)) * 4)
        return lance_like.read_dataset(docs, override_num_blocks=read_blocks)
    if isinstance(docs, pa.Table):
        return rd.from_arrow(docs)
    return docs  # already a Dataset


def exploded_dataset(
    docs: Any,
    *,
    num_partitions: int = 64,
    skip_parts: frozenset[int] | None = None,
    batch_size: int = 1024,
    read_blocks: int | None = None,
):
    from ..stages.explode import make_explode_fn

    ds = _as_dataset(docs, read_blocks)
    return ds.map_batches(
        make_explode_fn(num_partitions, skip_parts),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def extracted_dataset(
    docs: Any,
    media: Any,
    *,
    num_partitions: int = 64,
    skip_parts: frozenset[int] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    mode: str = "fused",
    read_blocks: int | None = None,
    fetcher=None,
    ocr_backend="auto",
):
    """Exploded + extracted span dataset (out_text/status columns added).

    ``fetcher`` / ``ocr_backend`` are the pluggable media-miss fetch and
    real-OCR hooks threaded into every extractor actor (see
    ``stages.extractors._Extractors``); defaults are no-fetch and
    auto-resolved (glyph-only in this container)."""
    ds = exploded_dataset(
        docs, num_partitions=num_partitions, skip_parts=skip_parts, read_blocks=read_blocks
    )
    handle = _media_handle(media)
    from ..stages.extractors import ExtractDispatch, OcrActor, PdfActor, extract_text_batch

    if mode == "fused":
        return ds.map_batches(
            ExtractDispatch,
            fn_constructor_kwargs={"media_handle": handle, "fetcher": fetcher,
                                   "ocr_backend": ocr_backend},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 8),
            num_cpus=1,
        )
    if mode == "split":
        # literal kind-per-pool routing (Manager.java:96 analogue). The three
        # filters re-execute the upstream explode, so pin it first; documented
        # trade-off vs the single-pass fused default. NOTE (VERDICT r4 #2 of
        # "what's wrong"): this pin MATERIALIZES the whole exploded dataset
        # in the object store -- unusable at 100 TB; this mode exists for
        # reference parity and fused-path cross-checks at test scale only.
        ds = ds.materialize()
        text_ds = ds.filter(expr="kind == 'text'").map_batches(
            extract_text_batch, batch_format="pyarrow", batch_size=batch_size
        )
        img_ds = ds.filter(expr="kind == 'image'").map_batches(
            OcrActor,
            fn_constructor_kwargs={"media_handle": handle, "fetcher": fetcher,
                                   "ocr_backend": ocr_backend},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 4),
        )
        pdf_ds = ds.filter(expr="kind == 'pdf'").map_batches(
            PdfActor,
            fn_constructor_kwargs={"media_handle": handle, "fetcher": fetcher},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 4),
        )
        return text_ds.union(img_ds).union(pdf_ds)
    raise ValueError(f"unknown mode: {mode!r}")


def extract_dataset(docs: Any, media: Any, *, num_partitions: int = 64, **kwargs):
    """Full pipeline -> reassembled (doc_id, spans) Dataset (no checkpoint)."""
    from ..stages.reassemble import reassemble

    ds = extracted_dataset(docs, media, num_partitions=num_partitions, **kwargs)
    return reassemble(ds)


def run_extraction(
    docs: Any,
    media: Any,
    out_dir: str,
    *,
    num_partitions: int = 64,
    resume: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    mode: str = "fused",
    read_blocks: int | None = None,
    coalesce_blocks: int | None = 64,
    fetcher=None,
    ocr_backend="auto",
    dry_run: bool = False,
) -> dict:
    """Checkpointed run: extract -> reassemble -> atomic per-partition commit.

    Returns the lineage summary. On resume, committed partitions are pruned
    at the explode stage, before any extraction compute is spent on them.
    ``dry_run=True`` builds and returns the plan summary (job identity,
    committed vs pending partition counts) without a Ray session or any
    output-directory mutation -- the shuffle-plan twin of
    ``run_extraction_sharded(dry_run=True)``.
    """
    from ..stages.extractors import _hook_identity
    from ..state.checkpoint import CheckpointManifest, CommittingReassembler

    manifest = CheckpointManifest(out_dir)
    if isinstance(media, pa.Table):  # convert ONCE: fingerprint + broadcast
        from ..corpus import media_dict

        media = media_dict(media)
    if dry_run:
        committed = sorted(manifest.committed()) if resume else []
        return {
            "dry_run": True,
            "plan": "shuffle",
            "num_partitions": int(num_partitions),
            "docs": docs_fingerprint(docs),
            "media": media_fingerprint(media),
            "hooks": _hook_identity(fetcher, ocr_backend),
            "partitions_pending": int(num_partitions) - len(committed),
            "partitions_skipped_prior": len(committed),
        }
    # refuse to resume under different partitioning/plan (committed part ids
    # were assigned by hash%P -- pruning by a different P drops documents),
    # a different media store (silent mixed-extraction output otherwise),
    # a changed docs input (appends are NOT resumable under hash%P
    # pruning: new docs landing in committed parts would be dropped), or
    # different fetch/OCR hooks (mixed-engine partitions otherwise)
    manifest.check_job(
        {
            # format 3: adds the hooks identity key (older checkpoints
            # refuse loudly at resume rather than mix engines silently)
            "format": 3,
            "plan": "shuffle",
            "num_partitions": int(num_partitions),
            "docs": docs_fingerprint(docs),
            "media": media_fingerprint(media),
            "hooks": _hook_identity(fetcher, ocr_backend),
        },
        enforce=resume,
        compat={"media": media_compatible},
    )
    from ..state.checkpoint import clean_tmp

    clean_tmp(out_dir)  # stale writer temp files from a crashed prior run
    skip = frozenset(manifest.committed()) if resume else frozenset()
    ds = extracted_dataset(
        docs, media, num_partitions=num_partitions, skip_parts=skip,
        concurrency=concurrency, batch_size=batch_size, mode=mode,
        read_blocks=read_blocks, fetcher=fetcher, ocr_backend=ocr_backend,
    )
    committer = CommittingReassembler(out_dir)

    def commit_partition(group):
        return committer(group)

    # coalesce before the sort-based groupby: extraction emits many small
    # blocks (good for the actor pool), but sort cost grows superlinearly
    # with block count (see stages/reassemble.py)
    if coalesce_blocks:
        ds = ds.repartition(coalesce_blocks)
    metrics = ds.groupby("part").map_groups(commit_partition, batch_format="pyarrow")
    rows = metrics.take_all()  # P small lineage rows, not data
    committed = manifest.committed()
    return {
        "partitions_total": len(committed),
        "partitions_run": len(rows),
        "partitions_skipped_prior": len(skip),
        "rows_in": sum(e["rows_in"] for e in committed.values()),
        "docs_out": sum(e["rows_out"] for e in committed.values()),
        "status_counts": _merge_counts(e.get("status_counts", {}) for e in committed.values()),
    }


def _merge_counts(dicts) -> dict[str, int]:
    out: dict[str, int] = {}
    for d in dicts:
        for k, v in d.items():
            out[k] = out.get(k, 0) + v
    return out


def load_output(out_dir: str):
    """Open the committed output partitions as a Dataset."""
    import ray.data as rd

    from ..state.checkpoint import CheckpointManifest

    return rd.read_parquet(CheckpointManifest(out_dir).data_paths())
