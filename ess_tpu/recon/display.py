"""Live display of reconstructed frames (the e2vid interactive window).

Capability parity with ImageDisplay + make_event_preview
(/root/reference/e2vid/utils/inference_utils.py:18-42, :210-258): an
optional cv2 window named 'Reconstruction' ('Events | Reconstruction' when
the event preview is shown), outer-border crop, configurable waitKey time,
and the red-blue / grayscale event preview hstacked left of the frame.

``compose`` is pure (testable headless); ``__call__`` adds the cv2 window.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def make_event_preview(events_chw: np.ndarray, mode: str = "red-blue",
                       num_bins_to_show: int = -1) -> np.ndarray:
    """(C, H, W) voxel grid -> uint8 preview (inference_utils.py:18-42)."""
    assert mode in ("red-blue", "grayscale")
    bins = events_chw if num_bins_to_show < 0 else events_chw[-num_bins_to_show:]
    sum_events = np.sum(bins, axis=0)
    if mode == "red-blue":
        prev = np.zeros(sum_events.shape + (3,), np.uint8)
        prev[:, :, 0][sum_events > 0] = 255   # positive -> blue (BGR)
        prev[:, :, 2][sum_events < 0] = 255   # negative -> red
        return prev
    m, big = -10.0, 10.0
    return np.clip((255.0 * (sum_events - m) / (big - m)).astype(np.uint8),
                   0, 255)


class ImageDisplay:
    """Optional interactive display of the reconstruction stream."""

    def __init__(self, *, display: bool = False, show_events: bool = False,
                 event_display_mode: str = "red-blue",
                 num_bins_to_show: int = -1, border: int = 0,
                 wait_time: int = 1):
        self.display = display
        self.show_events = show_events
        self.event_display_mode = event_display_mode
        self.num_bins_to_show = num_bins_to_show
        self.border = border
        self.wait_time = wait_time
        self.window_name = ("Events | Reconstruction" if show_events
                            else "Reconstruction")
        self._cv2 = None
        if display:
            import cv2
            self._cv2 = cv2
            cv2.namedWindow(self.window_name, cv2.WINDOW_NORMAL)

    def crop_outer_border(self, img: np.ndarray) -> np.ndarray:
        b = self.border
        return img if b == 0 else img[b:-b, b:-b]

    def compose(self, img: np.ndarray,
                events_chw: Optional[np.ndarray] = None) -> np.ndarray:
        """Pure frame assembly: border crop + optional event preview."""
        img = self.crop_outer_border(img)
        if not self.show_events:
            return img
        assert events_chw is not None
        preview = self.crop_outer_border(make_event_preview(
            events_chw, mode=self.event_display_mode,
            num_bins_to_show=self.num_bins_to_show))
        if preview.ndim == 3 and img.ndim == 2:
            img = np.dstack([img] * 3)
        elif img.ndim == 3 and preview.ndim == 2:
            preview = np.dstack([preview] * 3)
        return np.hstack([preview, img])

    def __call__(self, img: np.ndarray,
                 events_chw: Optional[np.ndarray] = None) -> None:
        if not self.display:
            return
        frame = self.compose(img, events_chw)
        self._cv2.imshow(self.window_name, frame)
        self._cv2.waitKey(self.wait_time)
