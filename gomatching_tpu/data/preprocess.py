"""Host-side frame preprocessing for inference.

Parity targets:
  - detectron2 ``ResizeShortestEdge`` semantics used by the reference predictors
    (``GoMBatchPredictor`` inherits DefaultPredictor's
    ResizeShortestEdge(MIN_SIZE_TEST, MAX_SIZE_TEST); text_track_visualizer.py:295)
  - ``EfficientDetResizeCropTransform`` test mode (scale=(1,1);
    gomatching/data/transforms/custom_transform.py:29-84) for CUSTOM_AUG pipelines.

Frames arrive BGR uint8 (cv2); INPUT.FORMAT=RGB flips channels. Normalization is
(x - PIXEL_MEAN) / PIXEL_STD. Output is NHWC float32 plus the pre-pad (h, w).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def resize_shortest_edge(img: np.ndarray, short: int, max_size: int) -> np.ndarray:
    """Scale so the shorter edge == short, capped so the longer edge <= max_size."""
    h, w = img.shape[:2]
    scale = short / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        s = max_size / max(newh, neww)
        newh, neww = newh * s, neww * s
    newh = int(newh + 0.5)
    neww = int(neww + 0.5)
    if (newh, neww) == (h, w):
        return img
    return np.asarray(Image.fromarray(img).resize((neww, newh), Image.BILINEAR))


def efficientdet_resize_crop_test(img: np.ndarray, size: int, h: int = -1, w: int = -1):
    """Test-mode EfficientDetResizeCrop (scale factor 1, no random offset)."""
    target = (size, size) if (h < 0 and w < 0) else (h, w)
    ih, iw = img.shape[:2]
    img_scale = min(target[0] / ih, target[1] / iw)
    scaled_h, scaled_w = int(ih * img_scale), int(iw * img_scale)
    out = np.asarray(Image.fromarray(img).resize((scaled_w, scaled_h), Image.BILINEAR))
    return out, img_scale


def compute_test_size(h: int, w: int, short: int, max_size: int) -> Tuple[int, int]:
    """ResizeShortestEdge output size (d2 rounding): shorter edge -> ``short``,
    capped so the longer edge <= ``max_size``."""
    scale = short / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        s = max_size / max(newh, neww)
        newh, neww = newh * s, neww * s
    return int(newh + 0.5), int(neww + 0.5)


def device_preprocess(raw_u8, target_hw, pixel_mean, pixel_std, input_format="RGB"):
    """On-device preprocessing: uint8 BGR (B, H, W, 3) -> normalized f32 batch.

    Why on device: a tunneled TPU moves host bytes at tens of MB/s, so shipping
    fp32 resized frames (~21 MB each at 1000px) costs ~1 s/batch; raw 720p uint8 is
    2.7 MB/frame, and bilinear resize + normalize are effectively free on the VPU.
    jax.image 'bilinear' uses half-pixel centers like PIL/cv2. PIL BILINEAR
    *antialiases on downscale* (the triangle filter support is scaled by the
    inverse scale factor) — jax.image.resize(antialias=True) applies the same
    scaled-support convention, and for upscale antialias has no effect on a
    linear kernel, so antialias=True matches PIL in both regimes (>=1080p
    datasets like DSText/BOVText DOWNSCALE to MIN_SIZE_TEST=1000).
    """
    import jax
    import jax.numpy as jnp

    if input_format == "RGB":
        raw_u8 = raw_u8[..., ::-1]
    x = raw_u8.astype(jnp.float32)
    B = x.shape[0]
    h, w = target_hw
    if (x.shape[1], x.shape[2]) != (h, w):
        x = jax.image.resize(x, (B, h, w, 3), method="bilinear", antialias=True)
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    return (x - mean) / std


def encode_i420(batch_u8: np.ndarray) -> np.ndarray:
    """HOST: BGR uint8 (B, H, W, 3) -> planar I420 (B, H*3//2, W) uint8.

    Halves the host->device byte volume (1.5 B/px vs 3): through a tunneled
    TPU moving ~35 MB/s, raw-frame upload is the e2e wall, and video sources
    are 4:2:0 at origin anyway (the extracted frames came out of H.264), so
    chroma subsampling re-drops information the camera pipeline already
    dropped. cv2's BGR2YUV_I420 (studio-swing BT.601); ``decode_i420`` is its
    measured inverse (mean |err| ~1.4 LSB, max 9 — identical to cv2's own
    YUV2BGR_I420 roundtrip). Requires even H, W.
    """
    import cv2

    return np.stack(
        [cv2.cvtColor(np.ascontiguousarray(f), cv2.COLOR_BGR2YUV_I420)
         for f in batch_u8]
    )


def decode_i420(yuv_u8):
    """DEVICE: planar I420 (B, H*3//2, W) uint8 -> BGR float (B, H, W, 3).

    Inverse of cv2's studio-swing BT.601 with nearest (2x-duplicate) chroma
    upsampling — the same convention as cv2.COLOR_YUV2BGR_I420, which bounds
    the roundtrip error at sharp chroma edges (bilinear upsampling smears
    them: measured max |err| 89 vs 9). Returns values in [0, 255] (rounded),
    ready for ``device_preprocess``-style normalization.
    """
    import jax.numpy as jnp

    B, h32, W = yuv_u8.shape
    H = h32 * 2 // 3
    y = yuv_u8[:, :H].astype(jnp.float32)
    # split the chroma region by BYTES, not buffer rows: for H % 4 != 0 (e.g.
    # 718) the U plane ends mid-row of the (H*3/2, W) I420 buffer
    nc = H * W // 4
    chroma = yuv_u8[:, H:].reshape(B, 2 * nc)
    u = chroma[:, :nc].reshape(B, H // 2, W // 2).astype(jnp.float32)
    v = chroma[:, nc:].reshape(B, H // 2, W // 2).astype(jnp.float32)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    yf = 1.1644 * (y - 16.0)
    r = yf + 1.5960 * v
    g = yf - 0.3918 * u - 0.8130 * v
    b = yf + 2.0172 * u
    return jnp.clip(jnp.round(jnp.stack([b, g, r], axis=-1)), 0.0, 255.0)


def preprocess_frames(
    frames,
    pixel_mean,
    pixel_std,
    input_format: str = "RGB",
    min_size_test: int = 1000,
    max_size_test: int = 3000,
    pad_multiple: int = 1,
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """BGR uint8 frames (same resolution) -> normalized padded batch.

    Returns (batch (B, Hp, Wp, 3) float32, image_hw (B, 2) true sizes, orig_hw).
    """
    orig_h, orig_w = frames[0].shape[:2]
    out = []
    for f in frames:
        if input_format == "RGB":
            f = f[:, :, ::-1]
        f = resize_shortest_edge(np.ascontiguousarray(f), min_size_test, max_size_test)
        out.append(f.astype(np.float32))
    h, w = out[0].shape[:2]
    hp = -(-h // pad_multiple) * pad_multiple
    wp = -(-w // pad_multiple) * pad_multiple
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    batch = np.zeros((len(out), hp, wp, 3), np.float32)
    for i, f in enumerate(out):
        batch[i, :h, :w] = (f - mean) / std
    image_hw = np.tile(np.asarray([[h, w]], np.int32), (len(out), 1))
    return batch, image_hw, (orig_h, orig_w)
