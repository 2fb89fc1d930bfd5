"""CLI driver -- the engine analogue of the reference client
(LocalApplication.main, LocalApplication.java:44-136): submit an extraction
job over a documents table, wait for completion, optionally render HTML.

Usage::

    python -m distributed_system___ocr_ray gen-corpus --out DIR --docs 1000
    python -m distributed_system___ocr_ray extract --input DIR/documents \\
        --media DIR/media_store --output OUT [--plan sharded|shuffle]
    python -m distributed_system___ocr_ray render --input OUT --html out.html

The CLI owns its Ray session (guarded init + shutdown); library code never
calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_gen_corpus(args) -> int:
    from . import corpus

    docs_dir, media_dir = corpus.write_corpus(
        args.out, n_docs=args.docs, seed=args.seed, rows_per_fragment=args.fragment_rows
    )
    print(json.dumps({"documents": docs_dir, "media_store": media_dir, "docs": args.docs}))
    return 0


def cmd_extract(args) -> int:
    _ray_session(args.num_cpus)
    import ray

    try:
        if args.plan == "sharded":
            from .pipelines.sharded import run_extraction_sharded

            metrics = run_extraction_sharded(
                args.input, args.media, args.output,
                resume=not args.no_resume, batch_size=args.batch_size,
            )
        else:
            from .pipelines.extract import run_extraction

            metrics = run_extraction(
                args.input, args.media, args.output,
                num_partitions=args.partitions, resume=not args.no_resume,
                batch_size=args.batch_size,
            )
        print(json.dumps(metrics))
        return 0
    finally:
        ray.shutdown()


def cmd_render(args) -> int:
    _ray_session(args.num_cpus)
    import ray

    try:
        from .pipelines.extract import load_output
        from .stages.render_html import write_html_file

        n = write_html_file(load_output(args.input), args.html)
        print(json.dumps({"html": args.html, "blocks": n}))
        return 0
    finally:
        ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="distributed_system___ocr_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus", help="generate a deterministic interleaved corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--docs", type=int, default=1000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--fragment-rows", type=int, default=1000)
    g.set_defaults(fn=cmd_gen_corpus)

    e = sub.add_parser("extract", help="run the extraction pipeline (checkpointed, resumable)")
    e.add_argument("--input", required=True, help="Lance-style documents table dir")
    e.add_argument("--media", required=True, help="Lance-style media_store table dir")
    e.add_argument("--output", required=True)
    e.add_argument("--plan", choices=["sharded", "shuffle"], default="sharded")
    e.add_argument("--partitions", type=int, default=64)
    e.add_argument("--batch-size", type=int, default=1024)
    e.add_argument("--no-resume", action="store_true")
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_extract)

    r = sub.add_parser("render", help="render committed output to one HTML file")
    r.add_argument("--input", required=True, help="extraction output dir")
    r.add_argument("--html", required=True)
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_render)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
