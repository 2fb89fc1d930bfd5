"""Deterministic synthetic corpus generator (FIXTURES.md F1/F2/F5).

Produces the engine's input shape mandated by ``BASELINE.json:input_hint``::

    documents:   doc_id: string,
                 spans: list<struct<kind:string, text:string,
                                    media_ref:string, offset:int32>>
    media_store: media_ref: string, kind: string, payload: binary, truth: string

Everything is a pure function of ``(seed, index)`` (per-doc ``random.Random``
streams), so corpora are reproducible at any scale, order-independent, and
shardable. Duplicate media_refs within and across docs are deliberate -- the
reference processes duplicates once per occurrence (23 lines / 10 distinct in
``inputs/short_input.txt``; multiplicity preserved in output,
LocalApplication.java:182-202). ~``broken_frac`` of media spans point at refs
absent from the store ("Image download error" path, Worker.java:87) and
~``corrupt_frac`` of store payloads are mangled ("OCR operation error" path,
Worker.java:95) -- mirroring the 10 corrupted URL lines in
``inputs/long_input.txt``.
"""

from __future__ import annotations

import random

import pyarrow as pa

from .functions import glyph, minipdf

SPAN_STRUCT = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])
OUT_SPAN_STRUCT = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("order", pa.int32())]
)
OUT_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(OUT_SPAN_STRUCT))])
MEDIA_SCHEMA = pa.schema(
    [("media_ref", pa.string()), ("kind", pa.string()), ("payload", pa.binary()), ("truth", pa.string())]
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega stream batch arrow "
    "shuffle actor block span table extract layout column offset manifest"
).split()


def _sentence(rng: random.Random, lo: int = 4, hi: int = 10) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(words).capitalize() + "."


# ---- md5-arithmetic randomness (SQL-replayable; no random.Random) ----------
#
# Everything the EXTRACTION OUTPUT of the flagship corpus depends on is
# derived from the big-endian 8-byte md5 prefix of a tag string
# (functions/dedup.md5_u64), which DuckDB replays exactly as
# ``('0x' || substr(md5(tag), 1, 16))::UBIGINT`` -- making the whole
# interleaved wrap + media store a closed-form function of the testdata
# ``documents`` table, and therefore oracle-checkable end-to-end
# (see __ray_entry__._interleaved_sql). random.Random remains only in the
# pytest-only fixtures below (build_documents etc.), never in the
# driver-checked corpus.

N_WORDS = len(_WORDS)
X_CHOICES = (10, 30, 230, 250, 450)  # pdf block x positions (3 columns)


def det_u64(tag: str) -> int:
    from .functions.dedup import md5_u64

    return md5_u64(tag.encode("utf-8"))


def det_sentence(tag: str, lo: int = 4, hi: int = 10) -> str:
    """One md5 per sentence: word count and every word index are div/mod
    slices of the same 64-bit md5 prefix (capacity: 7 * 37^10 < 2^64), so a
    single SQL expression replays it (``__ray_entry__._sent_sql``)."""
    hu = det_u64(tag)
    span = hi - lo + 1
    n = lo + hu % span
    r = hu // span
    words = [_WORDS[(r // (N_WORDS**j)) % N_WORDS] for j in range(n)]
    return " ".join(words).capitalize() + "."


def media_ref_img(i: int) -> str:
    return f"mem://img/{i:06d}"


def media_ref_pdf(i: int) -> str:
    return f"mem://pdf/{i:06d}"


def _render_page(
    title: str, script_x: int, nav_words: list[str], h1: str,
    ad_sentences: list[str], content_sentences: list[str],
) -> str:
    nav = " ".join(f'<a href="#{i}">{w}</a>' for i, w in enumerate(nav_words))
    ads = " ".join(f'<a href="#ad{i}">{s}</a>' for i, s in enumerate(ad_sentences))
    paras = "".join(f"<p>{s}</p>" for s in content_sentences)
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var x = {script_x};</script></head><body>"
        f"<header><a href='/'>Home</a> <a href='/about'>About</a></header>"
        f"<nav>{nav}</nav>"
        f"<div class='content'><h1>{h1}</h1>{paras}</div>"
        f"<div class='ads'>{ads}</div>"
        f"<footer><a href='/contact'>Contact</a> <a href='/tos'>Terms</a></footer>"
        f"</body></html>"
    )


def html_page(rng: random.Random, content_sentences: list[str]) -> str:
    """Wrap content sentences in a boilerplate-laden page template. The
    stripper's expected output is the content paragraphs joined by newlines
    (plus the h1 heading, which is a kept content block)."""
    return _render_page(
        rng.choice(_WORDS),
        rng.randint(0, 99),
        [rng.choice(_WORDS) for _ in range(rng.randint(2, 5))],
        _sentence(rng, 2, 4),
        [_sentence(rng, 2, 4) for _ in range(rng.randint(1, 3))],
        content_sentences,
    )


def html_page_det(tag: str, content_sentences: list[str]) -> str:
    """md5-arithmetic page template (the flagship wrap's variant). Only the
    h1 heading survives boilerplate stripping, so only it needs SQL replay
    (``det_sentence(f"{tag}:h1", 2, 4)``); the nav/title/script/ads filler
    varies per doc purely as stripper workload."""
    hb = det_u64(f"{tag}:bp")
    n_nav = 2 + hb % 4
    hb //= 4
    nav_words = []
    for _ in range(n_nav):
        nav_words.append(_WORDS[hb % N_WORDS])
        hb //= N_WORDS
    title = _WORDS[hb % N_WORDS]
    hb //= N_WORDS
    script_x = hb % 100
    hb //= 100
    n_ads = 1 + hb % 3
    return _render_page(
        title,
        script_x,
        nav_words,
        det_sentence(f"{tag}:h1", 2, 4),
        [det_sentence(f"{tag}:ad:{k}", 2, 4) for k in range(n_ads)],
        content_sentences,
    )


def build_media_store(
    n_img: int = 200, n_pdf: int = 100, seed: int = 42, corrupt_frac: float = 0.02
) -> pa.Table:
    """F2: media_ref -> payload side table. Payloads are generated FROM
    ``truth`` (glyph bitmaps / mini-PDFs), so extraction is exactly invertible.

    Every truth/layout/corruption decision is md5 arithmetic on the
    ``{seed}:{kind}:{i}`` tag (see det_sentence), which makes the extraction
    output over this store -- and its metadata (payload sizes, glyph widths,
    block counts) -- exactly replayable in DuckDB SQL: the flagship oracle
    (__ray_entry__._interleaved_sql) and the media_metadata oracle both
    recompute the truths independently from the same tags."""
    font = glyph.GlyphFont()
    corrupt_threshold = int(corrupt_frac * 2**64)
    refs, kinds, payloads, truths = [], [], [], []
    for i in range(n_img):
        tag = f"{seed}:img:{i}"
        truth = det_sentence(tag)
        payload = font.render(truth)
        if det_u64(f"{tag}:c") < corrupt_threshold:
            payload, truth = glyph.corrupt(payload), "OCR operation error"
        refs.append(media_ref_img(i)); kinds.append("image")
        payloads.append(payload); truths.append(truth)
    for i in range(n_pdf):
        tag = f"{seed}:pdf:{i}"
        nb = 1 + det_u64(f"{tag}:nb") % 4
        blocks = [
            {"x": X_CHOICES[det_u64(f"{tag}:{j}") % 5],
             "y": 40 * j + (det_u64(f"{tag}:{j}") // 5) % 21,
             "text": det_sentence(f"{tag}:{j}:s")}
            for j in range(nb)
        ]
        payload = minipdf.encode(blocks)
        if det_u64(f"{tag}:c") < corrupt_threshold:
            payload, truth = minipdf.corrupt(payload), "PDF parse error"
        else:
            truth = minipdf.reading_order_text(payload)
        refs.append(media_ref_pdf(i)); kinds.append("pdf")
        payloads.append(payload); truths.append(truth)
    return pa.table(
        {"media_ref": refs, "kind": kinds, "payload": payloads, "truth": truths},
        schema=MEDIA_SCHEMA,
    )


def media_dict(store: pa.Table) -> dict[str, bytes]:
    """ref -> payload lookup (the broadcast small side; SURVEY.md #2.4)."""
    return dict(zip(store.column("media_ref").to_pylist(), store.column("payload").to_pylist()))


def _doc_spans(
    rng: random.Random, n_img: int, n_pdf: int, broken_frac: float,
    min_spans: int, max_spans: int,
) -> list[dict]:
    spans = []
    offset = 0
    for _ in range(rng.randint(min_spans, max_spans)):
        offset += rng.randint(1, 50)
        kind = rng.choices(["text", "image", "pdf"], weights=[5, 3, 2])[0]
        if kind == "text":
            roll = rng.random()
            if roll < 0.05:
                text = rng.choice(["", "   ", "\n"])  # empty-record filter fixture (Manager.java:332-334)
            else:
                text = html_page(rng, [_sentence(rng) for _ in range(rng.randint(1, 3))])
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        elif kind == "image":
            if rng.random() < broken_frac:
                ref = f"mem://img/missing-{rng.randint(0, 10**6):06d}"
            else:
                ref = media_ref_img(rng.randrange(n_img))
            spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": offset})
        else:
            if rng.random() < broken_frac:
                ref = f"mem://pdf/missing-{rng.randint(0, 10**6):06d}"
            else:
                ref = media_ref_pdf(rng.randrange(n_pdf))
            spans.append({"kind": "pdf", "text": "", "media_ref": ref, "offset": offset})
    return spans


def build_documents(
    n_docs: int = 100, n_img: int = 200, n_pdf: int = 100, seed: int = 42,
    broken_frac: float = 0.05, min_spans: int = 1, max_spans: int = 8,
) -> pa.Table:
    """F1: interleaved documents table (deterministic from seed + doc index)."""
    doc_ids, spans_col = [], []
    for i in range(n_docs):
        rng = random.Random(f"{seed}:doc:{i}")
        doc_ids.append(f"doc-{i:08d}")
        spans_col.append(_doc_spans(rng, n_img, n_pdf, broken_frac, min_spans, max_spans))
    return pa.table({"doc_id": doc_ids, "spans": spans_col}, schema=DOC_SCHEMA)


def build_skew_documents(seed: int = 42, n_small: int = 1000, big_spans: int = 10_000) -> pa.Table:
    """Skew fixture: 1 doc with ``big_spans`` spans + one ~5 MB text span among
    ``n_small`` ordinary docs (exercises salted reassembly + size-capped batches)."""
    base = build_documents(n_docs=n_small, seed=seed)
    rng = random.Random(f"{seed}:skew")
    spans = []
    for j in range(big_spans):
        spans.append({"kind": "image", "text": "",
                      "media_ref": media_ref_img(rng.randrange(200)), "offset": j * 7 + 1})
    fat = " ".join(rng.choice(_WORDS) for _ in range(700_000))  # ~5 MB plain text span
    spans.append({"kind": "text", "text": fat, "media_ref": "", "offset": big_spans * 7 + 1})
    big = pa.table({"doc_id": ["doc-skew-big"], "spans": [spans]}, schema=DOC_SCHEMA)
    return pa.concat_tables([base, big]).combine_chunks()


def build_reference_shaped_doc(seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """F5: transliteration of ``inputs/short_input.txt`` semantics -- one doc,
    24 image spans over 10 distinct refs with the file's actual multiplicity
    3,3,3,3,3,3,2,2,1,1 (verified: the input has 24 non-empty lines -- the
    last line has no trailing newline, so ``wc -l`` undercounts to 23 -- and
    the golden ``outputs/short_output.html`` has exactly 24 <p> blocks;
    cardinality is conserved 1:1, matching the engine's exactly-once
    contract). Two of the refs are broken (errors-as-data path)."""
    multiplicity = [3, 3, 3, 3, 3, 3, 2, 2, 1, 1]  # 10 distinct refs, 24 lines
    refs = [media_ref_img(i) for i in range(8)] + [
        "mem://img/missing-000001", "mem://img/missing-000002"]
    lines = [r for r, m in zip(refs, multiplicity) for _ in range(m)]
    rng = random.Random(f"{seed}:ref-shaped")
    rng.shuffle(lines)  # input order is arbitrary; offsets define order
    spans = [{"kind": "image", "text": "", "media_ref": r, "offset": 10 * i} for i, r in enumerate(lines)]
    docs = pa.table({"doc_id": ["doc-short-input"], "spans": [spans]}, schema=DOC_SCHEMA)
    store = build_media_store(n_img=8, n_pdf=0, seed=seed, corrupt_frac=0.0)
    return docs, store


def write_corpus(
    out_dir: str, n_docs: int, seed: int = 42, n_img: int | None = None,
    n_pdf: int | None = None, rows_per_fragment: int = 2000, **doc_kwargs,
) -> tuple[str, str]:
    """Materialize a corpus as two Lance-style tables under ``out_dir``."""
    import os

    from .sources import lance_like

    n_img = n_img if n_img is not None else max(50, n_docs // 10)
    n_pdf = n_pdf if n_pdf is not None else max(25, n_docs // 20)
    docs = build_documents(n_docs=n_docs, n_img=n_img, n_pdf=n_pdf, seed=seed, **doc_kwargs)
    store = build_media_store(n_img=n_img, n_pdf=n_pdf, seed=seed)
    docs_dir = os.path.join(out_dir, "documents")
    media_dir = os.path.join(out_dir, "media_store")
    lance_like.write_table(docs, docs_dir, rows_per_fragment=rows_per_fragment)
    lance_like.write_table(store, media_dir, rows_per_fragment=10**6)
    return docs_dir, media_dir


def generator_content_id() -> str:
    """8-hex fingerprint of the wrap + media-store GENERATOR content, for
    content-keying /tmp corpus caches (bench.py, tools/) -- a name-only
    cache tag silently re-benches a stale corpus after a generator change.

    Probes one EVEN and one ODD doc id: the interleaved wrap emits pdf
    spans only for even ids and its broken-ref/corruption branches key off
    id arithmetic, so a single-parity probe would miss changes to the other
    parity's span plan (review finding, round 3). Also probes a
    corrupt_frac=1.0 store so changes to glyph.corrupt / minipdf.corrupt /
    the corruption-threshold arithmetic invalidate caches too — at the
    real 2% rate a 3-payload probe would near-certainly never take the
    corruption branch (second review finding, round 3)."""
    import hashlib
    import json

    from .sources import wrap

    probe = pa.table(
        {
            "doc_id": [120, 123],
            "text": [
                "alpha beta. gamma delta. epsilon zeta eta.",
                "alpha beta. gamma delta. epsilon.",
            ],
        }
    )
    wrapped = wrap.make_interleave_fn()(probe).to_pylist()
    store = build_media_store(n_img=2, n_pdf=1, seed=42)
    corrupted = build_media_store(n_img=1, n_pdf=1, seed=42, corrupt_frac=1.0)
    h = hashlib.md5(json.dumps(wrapped, sort_keys=True, default=str).encode("utf-8"))
    for tbl in (store, corrupted):
        for row in tbl.to_pylist():
            h.update(row["media_ref"].encode())
            h.update(row["payload"])
            h.update(row["truth"].encode())
    return h.hexdigest()[:8]
