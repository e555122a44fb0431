"""Color reconstruction from a DAVIS346color Bayer event stream.

Capability parity with the reference's color path
(/root/reference/e2vid/utils/inference_utils.py:341-429 ``shift_image``,
``upsample_color_image``, ``merge_channels_into_color_image``; enabled by
``--color``, options/inference_options.py:55-57). The reference ESS fork
ships the merge utilities but leaves the per-channel inference loop
commented out (image_reconstructor.py:96-127); this is the working path.

A DAVIS346color sensor has an RGBW Bayer mosaic: pixel (2i+r, 2j+s) sees
color [R W; G B][r][s] — so slicing the (normalized) full-resolution voxel
grid at the four 2x2 phases yields one half-resolution event stream per
color. Each runs through the SAME grayscale E2VID network with its own
recurrent state; TPU-first, the four color channels run as ONE batch of 4
(a single jitted forward per window) instead of the reference's sequential
per-channel loop. The merge (bilinear x2 upsample, origin shifts, RGBW ->
BGR, LAB lightness replacement from the full-res grayscale reconstruction)
is cheap host-side numpy/cv2 post-processing.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# Bayer phase of each color channel: channel -> (row offset, col offset).
# Matches the reference's slices events[:, :, 0::2, 0::2] = R,
# (0::2, 1::2) = G, (1::2, 0::2) = W, (1::2, 1::2) = B
# (image_reconstructor.py:97-100).
BAYER_PHASES = {"R": (0, 0), "G": (0, 1), "W": (1, 0), "B": (1, 1)}


def bayer_split(grid: np.ndarray) -> Dict[str, np.ndarray]:
    """(H, W, C) voxel grid -> {'R','G','W','B': (H/2, W/2, C)} phases."""
    return {ch: grid[r::2, s::2] for ch, (r, s) in BAYER_PHASES.items()}


def shift_image(x: np.ndarray, dx: int, dy: int) -> np.ndarray:
    """Roll by (dy, dx) with edge-replicated borders
    (inference_utils.py:341-352 semantics)."""
    x = np.roll(x, dy, axis=0)
    x = np.roll(x, dx, axis=1)
    if dy > 0:
        x[:dy, :] = x[dy, :][None]
    elif dy < 0:
        x[dy:, :] = x[dy, :][None]
    if dx > 0:
        x[:, :dx] = x[:, dx][:, None]
    elif dx < 0:
        x[:, dx:] = x[:, dx][:, None]
    return x


def upsample_color_image(
    grayscale_highres: np.ndarray, color_lowres_bgr: np.ndarray,
    colorspace: str = "LAB",
) -> np.ndarray:
    """Replace the lightness of an upsampled color image with a high-res
    grayscale image (inference_utils.py:356-387)."""
    import cv2

    assert grayscale_highres.ndim == 2
    assert color_lowres_bgr.ndim == 3 and color_lowres_bgr.shape[2] == 3
    if colorspace == "LAB":
        lab = cv2.cvtColor(color_lowres_bgr, cv2.COLOR_BGR2LAB)
        lab[:, :, 0] = grayscale_highres
        return cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)
    if colorspace == "HSV":
        hsv = cv2.cvtColor(color_lowres_bgr, cv2.COLOR_BGR2HSV)
        hsv[:, :, 2] = grayscale_highres
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    if colorspace == "HLS":
        hls = cv2.cvtColor(color_lowres_bgr, cv2.COLOR_BGR2HLS)
        hls[:, :, 1] = grayscale_highres
        return cv2.cvtColor(hls, cv2.COLOR_HLS2BGR)
    raise ValueError(f"unknown colorspace {colorspace!r}")


def merge_channels_into_color_image(channels: Dict[str, np.ndarray]) -> np.ndarray:
    """Full-res grayscale + four half-res RGBW reconstructions -> full-res
    BGR uint8 image (inference_utils.py:389-429 semantics: bilinear x2
    upsample per channel, origin shifts B(1,1)/G(1,0)/W(0,1), green =
    mean(G, W), LAB lightness replacement)."""
    import cv2

    for key in ("R", "G", "W", "B", "grayscale"):
        assert key in channels, key
    up = {
        ch: cv2.resize(channels[ch], dsize=None, fx=2, fy=2,
                       interpolation=cv2.INTER_LINEAR)
        for ch in ("R", "G", "W", "B")
    }
    up["B"] = shift_image(up["B"], dx=1, dy=1)
    up["G"] = shift_image(up["G"], dx=1, dy=0)
    up["W"] = shift_image(up["W"], dx=0, dy=1)

    green = cv2.addWeighted(src1=up["G"], alpha=0.5, src2=up["W"], beta=0.5,
                            gamma=0.0, dtype=cv2.CV_8U)
    reconstruction_bgr = np.dstack([up["B"], green, up["R"]])
    return upsample_color_image(channels["grayscale"], reconstruction_bgr)


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[0, 1] float reconstruction -> uint8."""
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
