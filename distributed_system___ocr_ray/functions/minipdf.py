"""Deterministic mini-PDF format + pdfminer-style reading-order reconstruction.

The north rule (BASELINE.json) mandates "pdfminer-style layout parsing with
reading-order reconstruction" for pdf-kind spans -- an axis-B generalization
with no direct reference analogue (the reference only OCRs images,
Worker.java:79-121). pdfminer is not installed in the sandbox, so fixtures use
a mini-PDF: positioned text blocks with x/y boxes, and the parser reconstructs
reading order the way pdfminer's LTPage analysis does -- group blocks into
columns, read columns left-to-right, blocks within a column top-to-bottom.

Wire format (``MPDF1``)::

    b"MPDF1" | utf-8 JSON {"blocks": [{"x": int, "y": int, "text": str}, ...]}

Column assignment is a fixed grid (``COLUMN_WIDTH`` px) so the layout
analysis is deterministic and oracle-checkable.
"""

from __future__ import annotations

import json

MAGIC = b"MPDF1"
COLUMN_WIDTH = 200


class PdfParseError(ValueError):
    pass


def encode(blocks: list[dict]) -> bytes:
    """Serialize layout blocks [{"x","y","text"}, ...] to mini-PDF bytes."""
    return MAGIC + json.dumps({"blocks": blocks}, sort_keys=True).encode("utf-8")


def decode_blocks(payload: bytes) -> list[dict]:
    if len(payload) < len(MAGIC) or payload[: len(MAGIC)] != MAGIC:
        raise PdfParseError("bad magic")
    try:
        doc = json.loads(payload[len(MAGIC) :].decode("utf-8"))
        blocks = doc["blocks"]
    # TypeError: valid JSON whose top level is not an object (doc["blocks"]
    # on a list/int) -- must surface as PdfParseError, not crash the batch
    # (the PNG struct/zlib normalization's sibling, ADVICE r4 class)
    except (ValueError, KeyError, UnicodeDecodeError, TypeError) as exc:
        raise PdfParseError(f"malformed body: {exc}") from exc
    if not isinstance(blocks, list):
        raise PdfParseError("blocks is not a list")
    for b in blocks:
        if not isinstance(b, dict) or not isinstance(b.get("text"), str):
            raise PdfParseError("block missing text")
        for coord in ("x", "y"):
            if not isinstance(b.get(coord, 0), (int, float)):
                raise PdfParseError(f"non-numeric {coord}")
    return blocks


def reading_order_text(payload: bytes) -> str:
    """Parse mini-PDF bytes -> reading-order text.

    Reading order: column = x // COLUMN_WIDTH; sort by (column, y, x);
    join block texts with newlines. Raises PdfParseError on malformed input
    (mapped to the "PDF parse error" sentinel by the extraction stage).
    """
    blocks = decode_blocks(payload)
    ordered = sorted(
        blocks, key=lambda b: (int(b.get("x", 0)) // COLUMN_WIDTH, int(b.get("y", 0)), int(b.get("x", 0)))
    )
    return "\n".join(b["text"] for b in ordered)


def corrupt(payload: bytes) -> bytes:
    """Deterministically corrupt a mini-PDF so parsing fails (fixture helper)."""
    return payload[: len(MAGIC)] + b"{not json" + payload[len(MAGIC) + 9 :]
