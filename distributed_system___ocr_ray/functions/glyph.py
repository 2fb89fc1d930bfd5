"""Synthetic 5x7 glyph font: render text -> bitmap bytes, and OCR-decode back.

Stands in for the reference's Tesseract engine (tess4j; loaded once per worker
at Worker.java:47-48, applied per record at Worker.java:145-153). The sandbox
has no OCR binary, so fixture images are deterministic bitmaps rendered from
known text with a fixed glyph font; the OCR stage performs real array work
(bit unpacking, cell slicing, table lookup) to recover the text, and is
exactly invertible so the oracle is trivial.

Wire format (``GLY1``)::

    b"GLY1" | uint16 height | uint16 width | packbits(bitmap row-major)

Each character cell is 5 columns x 7 rows plus a 1-column gap. The glyph
bitmap for a character is derived deterministically from sha256 of the
character, giving visually-meaningless but fixed, collision-free patterns
(a *font*, not an image model -- decode is exact-match table lookup; any
unrecognized cell raises, which the extraction stage converts to the
reference's "OCR operation error" sentinel, Worker.java:95).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

GLYPH_H = 7
GLYPH_W = 5
CELL_W = GLYPH_W + 1  # 1-column inter-glyph gap
MAGIC = b"GLY1"

# Character set the synthetic font covers. Truth strings in the corpus are
# drawn from this alphabet only.
ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 .,:;-'!?()"


def _glyph_bitmap(ch: str) -> np.ndarray:
    """Fixed 7x5 binary pattern for ``ch`` derived from sha256(ch)."""
    digest = hashlib.sha256(ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest[: (GLYPH_H * GLYPH_W + 7) // 8], dtype=np.uint8))
    return bits[: GLYPH_H * GLYPH_W].reshape(GLYPH_H, GLYPH_W)


class GlyphFont:
    """Render/decode table built once (per OCR actor, mirroring the
    once-per-worker Tesseract init at Worker.java:47-48)."""

    def __init__(self) -> None:
        self.render_table: dict[str, np.ndarray] = {c: _glyph_bitmap(c) for c in ALPHABET}
        # decode table keyed by the raw bytes of the 7x5 cell
        self.decode_table: dict[bytes, str] = {
            bm.tobytes(): c for c, bm in self.render_table.items()
        }
        assert len(self.decode_table) == len(ALPHABET), "glyph collision"

    def render(self, text: str) -> bytes:
        """Render ``text`` to GLY1 bitmap bytes. Unknown chars map to space."""
        n = max(len(text), 1)
        img = np.zeros((GLYPH_H, n * CELL_W), dtype=np.uint8)
        space = self.render_table[" "]
        for i, ch in enumerate(text or " "):
            img[:, i * CELL_W : i * CELL_W + GLYPH_W] = self.render_table.get(ch, space)
        packed = np.packbits(img.reshape(-1))
        return MAGIC + struct.pack("<HH", img.shape[0], img.shape[1]) + packed.tobytes()

    def decode(self, payload: bytes) -> str:
        """OCR: bitmap bytes -> text. Raises GlyphDecodeError on anything
        malformed (the extraction stage maps that to the OCR sentinel)."""
        if len(payload) < 8 or payload[:4] != MAGIC:
            raise GlyphDecodeError("bad magic")
        h, w = struct.unpack("<HH", payload[4:8])
        if h != GLYPH_H or w % CELL_W != 0 or w == 0:
            raise GlyphDecodeError("bad dimensions")
        nbits = h * w
        body = np.frombuffer(payload[8:], dtype=np.uint8)
        if len(body) * 8 < nbits:
            raise GlyphDecodeError("truncated payload")
        img = np.unpackbits(body)[:nbits].reshape(h, w)
        out = []
        for i in range(w // CELL_W):
            cell = np.ascontiguousarray(img[:, i * CELL_W : i * CELL_W + GLYPH_W])
            ch = self.decode_table.get(cell.tobytes())
            if ch is None:
                raise GlyphDecodeError(f"unrecognized glyph at cell {i}")
            out.append(ch)
        text = "".join(out)
        # a single-space render of "" decodes to " "; normalize exactly
        return "" if text == " " else text

    def dims(self, payload: bytes) -> tuple[int, int]:
        """Parse (height, width) metadata without decoding (multimodal path)."""
        if len(payload) < 8 or payload[:4] != MAGIC:
            raise GlyphDecodeError("bad magic")
        h, w = struct.unpack("<HH", payload[4:8])
        return h, w


class GlyphDecodeError(ValueError):
    pass


def corrupt(payload: bytes) -> bytes:
    """Deterministically corrupt a payload so decode fails (fixture helper)."""
    body = bytearray(payload)
    if len(body) > 9:
        body[9] ^= 0xFF  # flip bits inside the bitmap -> unrecognized glyph
    return bytes(body[: max(9, len(body) - 3)])
