"""Color palette helpers for visualization.

Parity with reference detectron2/utils/colormap.py: a fixed qualitative
palette (``colormap``), and random color draws (``random_color`` /
``random_colors``). The palette here is generated procedurally (golden-ratio
hue walk through HSV space) rather than a hard-coded table — same role, same
shape of API.
"""

import colorsys

import numpy as np

__all__ = ["colormap", "random_color", "random_colors"]


def _build_palette(n: int = 80) -> np.ndarray:
    """Deterministic qualitative palette: golden-ratio hue spacing with
    alternating saturation/value so neighbouring entries stay distinguishable."""
    golden = 0.61803398875
    colors = []
    h = 0.0
    for i in range(n):
        h = (h + golden) % 1.0
        s = (0.95, 0.65, 0.8)[i % 3]
        v = (0.95, 0.8, 0.65)[i % 3]
        colors.append(colorsys.hsv_to_rgb(h, s, v))
    return np.asarray(colors, dtype=np.float32)


_COLORS = _build_palette(80)


def colormap(rgb: bool = False, maximum: int = 255) -> np.ndarray:
    """Return the full palette as an ``(N, 3)`` float array.

    Args:
        rgb: if False, return BGR order (matching the reference's OpenCV
            convention).
        maximum: 255 or 1, the value scale.
    """
    assert maximum in (255, 1), maximum
    c = _COLORS * maximum
    if not rgb:
        c = c[:, ::-1]
    return c


def random_color(rgb: bool = False, maximum: int = 255) -> np.ndarray:
    """Draw one random color from the palette."""
    idx = np.random.randint(0, len(_COLORS))
    ret = _COLORS[idx] * maximum
    if not rgb:
        ret = ret[::-1]
    return ret


def random_colors(N: int, rgb: bool = False, maximum: int = 255) -> np.ndarray:
    """Draw ``N`` random colors (with replacement beyond palette size)."""
    indices = np.random.randint(0, len(_COLORS), size=N)
    ret = _COLORS[indices] * maximum
    if not rgb:
        ret = ret[:, ::-1]
    return ret
