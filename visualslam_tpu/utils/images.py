"""Host-side image IO and padding helpers.

The reference loads images with cv::imread and pads with
cv::copyMakeBorder(BORDER_REPLICATE) (GaussPyramid.cpp:133-141,
Diff_of_Gauss.cpp:571-580). Device-side padding here is jnp.pad in
'edge' mode; host-side loading uses PIL (cv2 only appears in tests as a
golden reference).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_gray(path: str, dtype=np.float32) -> np.ndarray:
    """Load an image file as grayscale float32 in [0, 1], shape [H, W]."""
    from PIL import Image

    img = Image.open(path).convert("L")
    return np.asarray(img, dtype=dtype) / 255.0


def replicate_pad(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-replicate padding on the last two axes (ref padOctave,
    GaussPyramid.cpp:133-141)."""
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, cfg, mode="edge")


def to_device_batch(imgs) -> jnp.ndarray:
    """Stack a list of [H, W] arrays to a [B, H, W] device array."""
    return jnp.stack([jnp.asarray(i) for i in imgs], axis=0)
