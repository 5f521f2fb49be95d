"""Colormap helpers for depth visualization
(reference /root/reference/splat_trainer/util/colorize.py:5-24)."""

import numpy as np


def colorize(values, colormap: str = "turbo"):
    """(H, W) values in [0,1] -> (H, W, 3) uint8 via cv2 colormap."""
    import cv2
    v = np.asarray(values)
    v = np.clip(v, 0.0, 1.0)
    v8 = (v * 255).astype(np.uint8)
    cmap = getattr(cv2, f"COLORMAP_{colormap.upper()}", cv2.COLORMAP_TURBO)
    out = cv2.applyColorMap(v8, cmap)
    return cv2.cvtColor(out, cv2.COLOR_BGR2RGB)
