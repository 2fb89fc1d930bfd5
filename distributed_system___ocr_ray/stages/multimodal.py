"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with
typed metadata extracted/attached by actor-pool ``map_batches`` stages. The
decode libraries (PIL/ffmpeg/etc.) are NOT in this container, so the pixel
decode paths are stubbed (SURVEY-mandated): the Ray-side plumbing -- schema,
batch sizing, actor signature, output layout -- is real and tested, and the
GLY1/MPDF1 formats (which we CAN parse) exercise the metadata path for real.

Batch-size note for 100 TB: payload columns dominate block bytes; callers
should pass small ``batch_size`` (e.g. 64) and rely on
``DataContext.target_max_block_size`` so a batch x concurrency of fat binary
rows fits the worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import glyph, minipdf

# import-gated real-decode upgrade: when Pillow is installed (not in this
# container), the real paths below activate with NO code changes -- the
# stubs are the fallback, not permanent residents.
try:  # pragma: no cover - exercised only where Pillow exists
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


class MediaMetadata:
    """Actor-pool stage: payload binary -> typed metadata columns.

    Output adds: media_kind (gly1|mpdf1|unknown), n_bytes, width, height,
    n_blocks. Unknown formats get nulls, never errors (errors-as-data).
    """

    def __init__(self) -> None:
        self.font = glyph.GlyphFont()  # parse tables built once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kind, nbytes, width, height, nblocks = [], [], [], [], []
        for p in payloads:
            p = p or b""
            nbytes.append(len(p))
            if p[:4] == glyph.MAGIC:
                try:
                    h, w = self.font.dims(p)
                    kind.append("gly1"); width.append(w); height.append(h); nblocks.append(None)
                    continue
                except glyph.GlyphDecodeError:
                    pass
            if p[:5] == minipdf.MAGIC:
                try:
                    blocks = minipdf.decode_blocks(p)
                    kind.append("mpdf1"); width.append(None); height.append(None)
                    nblocks.append(len(blocks))
                    continue
                except minipdf.PdfParseError:
                    pass
            if HAVE_PIL:  # pragma: no cover - real-format path, lib-gated
                try:
                    import io

                    with _PILImage.open(io.BytesIO(p)) as im:
                        kind.append(im.format.lower() if im.format else "image")
                        width.append(im.width); height.append(im.height)
                        nblocks.append(None)
                        continue
                except Exception:
                    pass
            kind.append("unknown"); width.append(None); height.append(None); nblocks.append(None)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "media_kind": pa.array(kind, pa.string()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "n_blocks": pa.array(nblocks, pa.int32()),
            }
        )


class ImageResize:
    """Actor-pool resize stage (STUB for real image formats).

    For GLY1 bitmaps the resize is real (nearest-neighbor on the unpacked
    array, re-packed). For real image formats the path is import-gated on
    Pillow: present -> actual decode/resize/re-encode; absent (this
    container) -> raises NotImplementedError unless ``fake=True``, in which
    case it emits a deterministic fake payload (format-tagged empty bitmap)
    so pipelines can be wired and tested.
    """

    def __init__(self, target: tuple[int, int] = (7, 42), fake: bool = True) -> None:
        self.font = glyph.GlyphFont()
        self.target = target
        self.fake = fake

    def _resize_gly1(self, p: bytes) -> bytes:
        import struct

        h, w = self.font.dims(p)
        nbits = h * w
        img = np.unpackbits(np.frombuffer(p[8:], dtype=np.uint8))[:nbits].reshape(h, w)
        th, tw = self.target
        rows = (np.arange(th) * h // th)
        cols = (np.arange(tw) * w // tw)
        out = img[rows][:, cols]
        return glyph.MAGIC + struct.pack("<HH", th, tw) + np.packbits(out.reshape(-1)).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            if p[:4] == glyph.MAGIC:
                try:
                    out.append(self._resize_gly1(p))
                    continue
                except Exception:
                    pass
            if HAVE_PIL:  # pragma: no cover - real-format path, lib-gated
                try:
                    import io

                    with _PILImage.open(io.BytesIO(p)) as im:
                        th, tw = self.target
                        buf = io.BytesIO()
                        im.resize((tw, th)).save(buf, format=im.format or "PNG")
                        out.append(buf.getvalue())
                        continue
                except Exception:
                    pass
            if not self.fake:
                raise NotImplementedError("real image decode unavailable in this container")
            out.append(b"FAKE0" + bytes(self.target))
        cols = {n: batch.column(n) for n in batch.column_names if n != "payload"}
        cols["payload"] = pa.array(out, pa.binary())
        return pa.table(cols)


class FrameSampler:
    """Actor-pool frame-sampling stage for video/audio payloads (STUB).

    Real decode needs ffmpeg/PIL (absent in this container); the Ray-side
    plumbing is real: opaque binary in, one row per sampled frame out
    (``media_ref, frame_idx, frame`` schema), small batches for fat payloads.
    With ``fake=True`` frames are deterministic byte slices of the payload
    (so pipelines and tests exercise the fan-out shape); with ``fake=False``
    it raises NotImplementedError at the decode point.
    """

    def __init__(self, n_frames: int = 4, fake: bool = True) -> None:
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, frames = [], [], []
        for ref, p in zip(batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()):
            p = p or b""
            if not self.fake:
                raise NotImplementedError("real video/audio decode unavailable in this container")
            step = max(1, len(p) // self.n_frames)
            for i in range(self.n_frames):
                refs.append(ref)
                idxs.append(i)
                frames.append(b"FRAME0" + p[i * step : i * step + min(step, 64)])
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_metadata(store_ds, batch_size: int = 64, concurrency=(1, 4)):
    """media store Dataset -> metadata Dataset (actor pool, small batches)."""
    return store_ds.map_batches(
        MediaMetadata, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
