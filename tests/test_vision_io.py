"""Vision IO preprocessing (qwen_vl_utils analogue)."""

import numpy as np
import pytest

from autoawq_tpu.utils.vision_io import (
    fetch_image,
    process_vision_info,
    smart_resize,
)


def test_smart_resize_bounds():
    h, w = smart_resize(1000, 700)
    assert h % 28 == 0 and w % 28 == 0
    assert 4 * 28 * 28 <= h * w <= 16384 * 28 * 28
    # tiny image scales UP to min_pixels
    h, w = smart_resize(10, 10)
    assert h * w >= 4 * 28 * 28
    with pytest.raises(ValueError):
        smart_resize(10, 4000)


def test_fetch_image_array(rng):
    pytest.importorskip("PIL")
    img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
    out = fetch_image(img, size=(28, 56))
    assert out.shape == (3, 28, 56)
    assert out.dtype == np.float32


def test_process_vision_info(rng):
    pytest.importorskip("PIL")
    img = rng.integers(0, 255, (30, 30, 3)).astype(np.uint8)
    msgs = [{"role": "user",
             "content": [{"type": "text", "text": "hi"},
                         {"type": "image", "image": img}]}]
    imgs, vids = process_vision_info(msgs, size=(28, 28))
    assert len(imgs) == 1 and imgs[0].shape == (3, 28, 28)
    assert vids == []
