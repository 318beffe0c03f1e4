"""Vision input preprocessing for multimodal calibration/serving.

Counterpart of the reference's awq/utils/qwen_vl_utils.py (smart_resize /
fetch_image / process_vision_info): resolution-constrained resize with
patch-aligned dimensions and image loading from paths / URLs / PIL objects.
Pure numpy output ([3, H, W] float32, CLIP-style normalization by default)
so it feeds the JAX vision tower directly.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

IMAGE_FACTOR = 28
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 16384 * 28 * 28
MAX_RATIO = 200

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def round_by_factor(x: float, factor: int) -> int:
    return round(x / factor) * factor


def ceil_by_factor(x: float, factor: int) -> int:
    return math.ceil(x / factor) * factor


def floor_by_factor(x: float, factor: int) -> int:
    return math.floor(x / factor) * factor


def smart_resize(height: int, width: int, factor: int = IMAGE_FACTOR,
                 min_pixels: int = MIN_PIXELS,
                 max_pixels: int = MAX_PIXELS) -> Tuple[int, int]:
    """Pick output (h, w): divisible by ``factor``, total pixels within
    [min_pixels, max_pixels], aspect ratio preserved as closely as possible
    (reference: qwen_vl_utils.py:61)."""
    if max(height, width) / min(height, width) > MAX_RATIO:
        raise ValueError(
            f"aspect ratio must be < {MAX_RATIO}, got "
            f"{max(height, width) / min(height, width):.1f}")
    h_bar = max(factor, round_by_factor(height, factor))
    w_bar = max(factor, round_by_factor(width, factor))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, floor_by_factor(height / beta, factor))
        w_bar = max(factor, floor_by_factor(width / beta, factor))
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = ceil_by_factor(height * beta, factor)
        w_bar = ceil_by_factor(width * beta, factor)
    return h_bar, w_bar


def fetch_image(image: Any, size: Optional[Tuple[int, int]] = None,
                factor: int = IMAGE_FACTOR,
                normalize: bool = True) -> np.ndarray:
    """path / URL / PIL.Image / array -> float32 [3, H, W].

    URLs require network; local paths and in-memory images work offline.
    """
    from PIL import Image

    if isinstance(image, np.ndarray):
        img = Image.fromarray(image.astype(np.uint8))
    elif isinstance(image, Image.Image):
        img = image
    elif isinstance(image, str) and image.startswith(("http://", "https://")):
        import io
        import urllib.request

        with urllib.request.urlopen(image) as r:
            img = Image.open(io.BytesIO(r.read()))
    elif isinstance(image, str):
        path = image[len("file://"):] if image.startswith("file://") else image
        img = Image.open(path)
    else:
        raise TypeError(f"unsupported image source {type(image)}")
    img = img.convert("RGB")
    if size is None:
        size = smart_resize(img.height, img.width, factor)
    img = img.resize((size[1], size[0]))  # PIL takes (w, h)
    arr = np.asarray(img, np.float32) / 255.0
    if normalize:
        arr = (arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    return arr.transpose(2, 0, 1).astype(np.float32)


def process_vision_info(
    messages: Sequence[Dict[str, Any]],
    size: Optional[Tuple[int, int]] = None,
) -> List[np.ndarray]:
    """Extract and preprocess every image from a chat-style message list
    (reference: qwen_vl_utils.py:392). Video inputs are not supported yet."""
    images: List[np.ndarray] = []
    for msg in messages:
        content = msg.get("content", [])
        if isinstance(content, str):
            continue
        for item in content:
            if item.get("type") == "image" or "image" in item:
                images.append(fetch_image(item.get("image", item.get("url")),
                                          size=size))
            elif item.get("type") == "video" or "video" in item:
                raise NotImplementedError("video inputs not supported yet")
    return images
