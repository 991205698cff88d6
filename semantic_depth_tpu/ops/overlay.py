"""On-device segmentation overlay composition.

The reference composes overlays on the host with PIL: it builds an RGBA mask
image (color with alpha 64 where the class fires) and pastes it onto the
frame (semantic_depth.py:555-569). PIL ``paste(im, mask=im)`` alpha-blends

    out = round(frame * (255 - a) / 255 + color * a / 255)

per channel, where a is the mask's alpha (64 or 0). Here that blend is a pair
of fused elementwise ops inside the jitted program; road is pasted first,
fence second (fence wins where both fire), matching the paste order.

Channel-order note: the reference loads frames with cv2 (BGR) and pastes RGB
tuples onto them without conversion — a deliberate quirk we preserve by
working on whatever channel order the caller supplies.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _paste(frame: jnp.ndarray, mask: jnp.ndarray, rgba: Tuple[int, int, int, int]) -> jnp.ndarray:
    color = jnp.asarray(rgba[:3], jnp.float32)
    alpha = jnp.float32(rgba[3]) / 255.0
    blended = frame * (1.0 - alpha) + color[None, None, :] * alpha
    # PIL materializes uint8 after EVERY paste, so the second paste reads
    # integers; rounding only once at the end drifts 1 LSB exactly on the
    # road∧fence overlap pixels where the paste-order quirk matters.
    blended = jnp.clip(jnp.round(blended), 0.0, 255.0)
    out = jnp.where(mask[:, :, None], blended, frame)
    return out


def segmentation_overlay(
    frame: jnp.ndarray,
    road_mask: jnp.ndarray,
    fence_mask: jnp.ndarray,
    road_rgba: Tuple[int, int, int, int],
    fence_rgba: Tuple[int, int, int, int],
) -> jnp.ndarray:
    """frame: (H, W, 3) float 0..255; masks: (H, W) bool. Returns f32 0..255
    rounded to integers after each paste, like PIL's uint8 math."""
    out = jnp.clip(jnp.round(frame.astype(jnp.float32)), 0.0, 255.0)
    out = _paste(out, road_mask, road_rgba)
    out = _paste(out, fence_mask, fence_rgba)
    return out


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2GRAY weights (used for the masked gray sanity images,
    semantic_depth.py:172-174)."""
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    return jnp.clip(jnp.round(rgb.astype(jnp.float32) @ w), 0.0, 255.0)
