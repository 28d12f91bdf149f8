"""Visualization helpers for the CLI apps.

Counterpart of the PIL rendering in `sample/feature_detection.py:216-299` and
`sample/image_matching.py:151-218`: keypoints colored by score with a jet-style
colormap, and side-by-side match rendering.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw


def _jet(v: float):
    """Jet-style colormap for v in [0, 1] -> (r, g, b) uint8."""
    v = float(np.clip(v, 0.0, 1.0))
    r = int(255 * np.clip(1.5 - abs(4 * v - 3), 0, 1))
    g = int(255 * np.clip(1.5 - abs(4 * v - 2), 0, 1))
    b = int(255 * np.clip(1.5 - abs(4 * v - 1), 0, 1))
    return (r, g, b)


def visualize_keypoints(image_rgb: Image.Image, keypoints: np.ndarray,
                        radius: int = 3) -> Image.Image:
    """Draw (y, x, score) keypoints colored by normalized score."""
    out = image_rgb.copy()
    draw = ImageDraw.Draw(out)
    if keypoints.shape[0]:
        smin = float(keypoints[:, 2].min())
        smax = float(keypoints[:, 2].max())
        span = max(smax - smin, 1e-12)
        for y, x, s in keypoints:
            color = _jet((float(s) - smin) / span)
            draw.ellipse([x - radius, y - radius, x + radius, y + radius],
                         outline=color, width=2)
    return out


def visualize_matches(image1_rgb: Image.Image, image2_rgb: Image.Image,
                      matched_kpts1: np.ndarray, matched_kpts2: np.ndarray,
                      scores: np.ndarray | None = None) -> Image.Image:
    """Side-by-side images with match lines colored by score."""
    w1, h1 = image1_rgb.size
    w2, h2 = image2_rgb.size
    canvas = Image.new("RGB", (w1 + w2, max(h1, h2)), (0, 0, 0))
    canvas.paste(image1_rgb, (0, 0))
    canvas.paste(image2_rgb, (w1, 0))
    draw = ImageDraw.Draw(canvas)
    n = len(matched_kpts1)
    if scores is None:
        scores = np.ones(n, np.float32)
    smin = float(scores.min()) if n else 0.0
    span = max((float(scores.max()) - smin) if n else 1.0, 1e-12)
    for (y1, x1), (y2, x2), s in zip(matched_kpts1, matched_kpts2, scores):
        color = _jet((float(s) - smin) / span)
        draw.line([x1, y1, x2 + w1, y2], fill=color, width=1)
        draw.ellipse([x1 - 2, y1 - 2, x1 + 2, y1 + 2], fill=color)
        draw.ellipse([x2 + w1 - 2, y2 - 2, x2 + w1 + 2, y2 + 2], fill=color)
    return canvas
