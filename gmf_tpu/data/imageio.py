"""Image loading / preprocessing.

Parity: GMF_PointDSC/utils/uio.py:17-106 ``process_image`` (resize / clip /
padding modes) and the loaders' imread + resize-to-(120,160) flow
(datasets/ThreeDMatch.py:119-133). Output layout is [H, W, C] float32
(NHWC without batch); the torch reference transposes to CHW — our models
take NHWC natively.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _resize(image: np.ndarray, aim_H: int, aim_W: int) -> np.ndarray:
    if _HAS_CV2:
        return np.asarray(
            cv2.resize(image, dsize=(aim_W, aim_H),
                       interpolation=cv2.INTER_LINEAR),
            dtype=np.float32)
    from PIL import Image  # fallback

    return np.asarray(
        Image.fromarray(
            (image * 255).astype(np.uint8) if image.dtype != np.uint8 else image
        ).resize((aim_W, aim_H), Image.BILINEAR),
        dtype=np.float32,
    ) / (255.0 if image.dtype != np.uint8 else 1.0)


def process_image(image, aim_H: int = 120, aim_W: int = 160,
                  mode: str = "resize", clip_mode: str = "center"):
    """Resize / clip / pad an [H, W, C] image to (aim_H, aim_W).

    Parity: utils/uio.py:17-106 (resize=bilinear; clip=center/normal/random
    crop with pyramid up/down scaling; padding=zero-pad bottom/right).
    """
    image = np.asarray(image)
    H, W, C = image.shape
    if H == aim_H and W == aim_W:
        return image

    if mode == "resize":
        return _resize(image, aim_H, aim_W)

    if mode == "clip":
        while H < aim_H or W < aim_W:
            image = _resize(image, H * 2, W * 2)
            H, W, C = image.shape
        if H > aim_H * 2 and W > aim_W * 2:
            image = _resize(image, H // 2, W // 2)
            H, W, C = image.shape
        if clip_mode == "center":
            top, left = (H - aim_H) // 2, (W - aim_W) // 2
        elif clip_mode == "normal":
            top, left = 0, 0
        elif clip_mode == "random":
            top = int(np.random.random() * (H - aim_H))
            left = int(np.random.random() * (W - aim_W))
        else:
            raise ValueError(clip_mode)
        return image[top: top + aim_H, left: left + aim_W]

    if mode == "padding":
        out = np.zeros((aim_H, aim_W, C), image.dtype)
        h, w = min(H, aim_H), min(W, aim_W)
        out[:h, :w] = image[:h, :w]
        return out

    raise ValueError(mode)


def load_image(path: str, aim_H: int = 120, aim_W: int = 160) -> np.ndarray:
    """imread + resize, returning [H, W, 3] float32 in [0, 1]."""
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if img.shape[0] != aim_H or img.shape[1] != aim_W:
        img = process_image(img, aim_H, aim_W)
    return img.astype(np.float32)
