"""PLASMA colormap as a constant 256x3 LUT gather.

The reference colorizes depth previews with ``cv2.applyColorMap(img,
cv2.COLORMAP_PLASMA)`` (backend/app.py:153, 597). On TPU the colormap is a
single gather from a 256x3 uint8 constant that XLA keeps in VMEM; the LUT
below is byte-identical to OpenCV's PLASMA table (stored RGB; OpenCV
returns BGR channel order, see ``apply_colormap(..., bgr=True)``).
"""

from __future__ import annotations

import base64

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PLASMA_RGB", "apply_colormap"]

_PLASMA_B64 = (
    "DQiHEAeIEweJFgeKGQaMGwaNHQaOIAaPIgaQJAaRJgWRKAWSKgWTLAWULgWVLwWWMQWXMwWXNQSYNwSZOASaOgSaPASbPgScPwScQQSdQwOeRAOeRgOfSAOfSQOgSwOhTAKhTgKiUAKiUQKjUwKjVQKkVgGkWAGkWQGlWwGlXAGmXgGmYAGmYQCnYwCnZACnZgCnZwCoaQCoagCobACobgCobwCocQCocgGodAGodQGodwGoeAGoegKoewKofQOofgOogASogQSngwWnhAWnhgamhwemiAimigmliwqljQuljgykjw2kkQ6jkg+jlBCilRGhlhOhmBSgmRWfmhafnBeenRidnhmdoBqcoRuboh2aox6apR+ZpiCYpyGXqCKWqiOVqySUrCaUrSeTriiSsCmRsSqQsiuPsyyOtC6NtS+MtjCLtzGKuDKJujOIuzSIvDWHvTeGvjiFvzmEwDqDwTuCwjyBwz2AxD5/xUB+xkF9x0J8yEN7yUR6ykV6y0Z5zEd4zEl3zUp2zkt1z0x00E1z0U5y0k9x01Fx1FJw1VNv1VRu1lVt11Zs2Fdr2Vhq2lpq2ltp21xo3F1n3V5m3l9l3mFk32Jj4GNj4WRi4mVh4mZg42hf5Gle5Wpd5Wtd5mxc525b529a6HBZ6XFY6XJX6nRX63VW63ZV7HdU7XlT7XpS7ntR73xR735Q8H9P8IBO8YFN8YNM8oRL84VL84dK9IhJ9IlI9YtH9YxG9o1F9o9E95BE95FD95NC+JRB+JVA+Zc/+Zg++Zo++ps9+pw8+p47+586+6E5+6I4/KM4/KU3/KY2/Kg1/Kk0/asz/awz/a4y/a8x/bEw/bIv/bQv/bUu/rct/rgs/ros/rsr/r0q/r4q/sAp/cIp/cMo/cUn/cYn/cgn/com/csm/M0l/M4l/NAl/NIl+9Mk+9Uk+9ck+tgk+tok+dwk+d0l+N8l+OEl9+Il9+Ql9uYm9ugm9ekm9esn9O0n8+4n8/An8vIn8fQm8fUl8Pck8Pkh"
)

PLASMA_RGB: np.ndarray = np.frombuffer(
    base64.b64decode(_PLASMA_B64), dtype=np.uint8
).reshape(256, 3)


def apply_colormap(gray_u8: jax.Array, bgr: bool = False) -> jax.Array:
    """Map a uint8 (H, W) image through the PLASMA LUT → (H, W, 3) uint8.

    Set ``bgr=True`` to get OpenCV channel order (what
    ``cv2.applyColorMap`` returns and what the PNG encoder then flips).
    """
    lut = jnp.asarray(PLASMA_RGB[:, ::-1] if bgr else PLASMA_RGB)
    return lut[gray_u8.astype(jnp.int32)]
