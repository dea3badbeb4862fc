"""Host-side image decode/encode staging.

The reference decodes uploads with ``cv2.imdecode`` and base64-encodes
PNG previews with ``cv2.imencode`` (backend/app.py:433, 163-166). Here
decode/encode run on host (PIL's native C codecs — libjpeg-turbo/libpng
underneath) producing RGB uint8 arrays that are staged to device; the
data URL format matches the reference's ``data:image/png;base64,...``.
"""

from __future__ import annotations

import base64
import io as _io

import numpy as np

__all__ = ["decode_image_rgb", "encode_png", "png_data_url"]


def decode_image_rgb(data: bytes) -> np.ndarray:
    """Decode JPEG/PNG/... bytes → (H, W, 3) RGB uint8 (raises on failure)."""
    from PIL import Image

    img = Image.open(_io.BytesIO(data))
    img = img.convert("RGB")
    return np.asarray(img)


def encode_png(rgb: np.ndarray) -> bytes:
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(np.ascontiguousarray(rgb.astype(np.uint8))).save(
        buf, format="PNG"
    )
    return buf.getvalue()


def png_data_url(rgb: np.ndarray) -> str:
    return "data:image/png;base64," + base64.b64encode(encode_png(rgb)).decode("ascii")
