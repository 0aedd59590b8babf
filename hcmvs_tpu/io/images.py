"""Image loading, grayscale conversion, resizing and pyramids.

Host-side analog of the reference's image layer (ref: frame_main/libs/IO/
Image*.cpp codecs behind CImage, and libs/MVS/Image.cpp ReloadImage /
RecomputeMaxResolution).  Decoding uses OpenCV (already a reference
dependency); everything after decode is numpy/JAX arrays, laid out
(H, W[, C]) float32 in [0, 1], which is the layout the device kernels use.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import cv2
import numpy as np


def load_image(path: str, gray: bool = False) -> np.ndarray:
    """Load an image as float32 in [0, 1]; RGB (H, W, 3) or gray (H, W)."""
    flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
    img = cv2.imread(path, flag)
    if img is None:
        raise FileNotFoundError(path)
    if not gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def to_gray(img: np.ndarray) -> np.ndarray:
    """RGB (H, W, 3) -> gray (H, W) with the BT.601 weights cv2 uses."""
    if img.ndim == 2:
        return img
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(img.dtype)


def compute_resolution_scale(width: int, height: int, resolution_level: int,
                             max_resolution: int, min_resolution: int
                             ) -> float:
    """Scale factor for a resolution level, matching the reference rule.

    Ref: frame_main/libs/MVS/Image.cpp RecomputeMaxResolution — halve the
    max dimension `resolution_level` times, clamp into
    [min_resolution, max_resolution], and return the resulting scale.
    """
    max_dim = max(width, height)
    target = max_dim >> resolution_level
    if max_resolution > 0:
        target = min(target, max_resolution)
    if min_resolution > 0:
        target = max(target, min(min_resolution, max_dim))
    return target / max_dim


def resize_image(img: np.ndarray, scale: float) -> np.ndarray:
    if scale == 1.0:
        return img
    h, w = img.shape[:2]
    new_w, new_h = max(1, round(w * scale)), max(1, round(h * scale))
    interp = cv2.INTER_AREA if scale < 1.0 else cv2.INTER_LINEAR
    return cv2.resize(img, (new_w, new_h), interpolation=interp)


def load_semantic_mask(path: str) -> np.ndarray:
    """Load a semantic-segmentation mask as an (H, W) int32 label map.

    The reference consumes per-image mask files named by Image::maskName
    (ref: frame_main/libs/MVS/Image.h:75-99, used by GenerateDepthPrior
    SceneDensify.cpp:1550-1950; the final hierarchy stage runs
    --use-semantic 1 — data/frame_main/resize1/run.py).  Accepted
    encodings: 8/16-bit single-channel label images, or color-coded masks
    (each distinct color becomes one label).
    """
    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(path)
    if raw.ndim == 2:
        return raw.astype(np.int32)
    # color-coded: map distinct colors to dense label ids (deterministic
    # by color value so every view of the same legend agrees)
    flat = raw.reshape(-1, raw.shape[2]).astype(np.int64)
    code = flat[:, 0]
    for c in range(1, raw.shape[2]):
        code = code * 256 + flat[:, c]
    _, labels = np.unique(code, return_inverse=True)
    return labels.reshape(raw.shape[:2]).astype(np.int32)


def resize_mask(mask: np.ndarray, shape_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize for label maps (labels must not blend)."""
    h, w = shape_hw
    if mask.shape == (h, w):
        return mask
    return cv2.resize(mask.astype(np.int32), (w, h),
                      interpolation=cv2.INTER_NEAREST)


def build_pyramid(img: np.ndarray, levels: int) -> List[np.ndarray]:
    """Half-resolution pyramid, level 0 = input."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(cv2.pyrDown(pyr[-1]))
    return pyr


def pad_to_multiple(img: np.ndarray, multiple: int,
                    value: float = 0.0) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Edge-pad H and W up to a multiple (TPU tiles want aligned shapes).

    Returns the padded image and the original (H, W) so outputs can be
    cropped back.
    """
    h, w = img.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return img, (h, w)
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="edge"), (h, w)


def list_images(directory: str) -> List[str]:
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".ppm"}
    names = sorted(n for n in os.listdir(directory)
                   if os.path.splitext(n)[1].lower() in exts)
    return [os.path.join(directory, n) for n in names]


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """Map values in [0, 1] to the classic jet colormap: (..., 3) uint8
    RGB (ref: the reference's debug exporters write jet-colored depth PNGs,
    DepthMap.cpp:2526 ExportDepthMap)."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def save_depth_png(path: str, depth: np.ndarray,
                   d_min: float = None, d_max: float = None) -> None:
    """Write a jet-colored depth visualization PNG (invalid = black) —
    the verbosity-gated debug artifact the reference dumps per stage."""
    valid = depth > 0
    if d_min is None:
        d_min = float(depth[valid].min()) if valid.any() else 0.0
    if d_max is None:
        d_max = float(depth[valid].max()) if valid.any() else 1.0
    x = (depth - d_min) / max(d_max - d_min, 1e-9)
    rgb = jet_colormap(x)
    rgb[~valid] = 0
    cv2.imwrite(path, rgb[..., ::-1])  # cv2 writes BGR
