"""Reference-format source: a UTF-8 text file of image URLs, one per line.

This is the reference's literal input format (``inputs/short_input.txt``:
23 lines / 10 distinct URLs; parsed at Manager.parseInputFile,
Manager.java:463-471). One input file becomes one document whose spans are
image refs in line order (offset = line number); empty lines are filtered
exactly like the reference does before tasking (Manager.java:332-334).

The sandbox has no network, so real http(s) URLs resolve as media-store
misses -> the verbatim "Image download error" sentinel (Worker.java:87) --
errors-as-data, the same contract the reference's corrupted-URL lines
exercise in its golden outputs. URLs that ARE present in a provided media
store (e.g. ``mem://`` refs) extract normally.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..corpus import DOC_SCHEMA


def read_url_file(path: str, doc_id: str | None = None) -> pa.Table:
    """One URL-list text file -> a one-document spans table."""
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    spans = [
        {"kind": "image", "text": "", "media_ref": line.strip(), "offset": i}
        for i, line in enumerate(lines)
        if line.strip()  # empty-line filter, Manager.java:332-334
    ]
    doc_id = doc_id or os.path.splitext(os.path.basename(path))[0]
    return pa.table({"doc_id": [doc_id], "spans": [spans]}, schema=DOC_SCHEMA)


def read_url_files(paths: list[str]):
    """Many URL files -> a Dataset of documents (one doc per file), e.g.::

        ds = read_url_files(glob.glob("inputs/*.txt"))
        out = pipelines.extract.extract_dataset(ds, media_store, ...)
    """
    import ray.data as rd

    tables = [read_url_file(p) for p in paths]
    return rd.from_arrow(pa.concat_tables(tables))
