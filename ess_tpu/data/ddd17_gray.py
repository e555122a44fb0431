"""DDD17 grayscale-frame image dataset (sensor-A variant).

Capability parity with the reference's 'DDD17_gray' sensor-A option
(config/settings.py:64-71 routes it through the same grayscale front-end as
Cityscapes; frames live in each recording's ``imgs/`` directory alongside
``segmentation_masks/``, see ddd17_events_loader.py:187-213 which pairs them
at validation). Used for image-domain training on DDD17's own frames, and —
combined with CityscapesGray via ``ConcatImages`` — for the
'DDD17_Cityscapes_gray' mixed image domain.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List

import numpy as np

from ess_tpu.data.ddd17 import RESIZED_SHAPE, get_split_dirs


class DDD17Gray:
    """(image, label) pairs from DDD17 recordings' grayscale frames."""

    def __init__(self, root: str, split: str = "train",
                 height: int = RESIZED_SHAPE[0], width: int = RESIZED_SHAPE[1]):
        data_dirs = sorted(glob.glob(os.path.join(root, "dir*")))
        assert data_dirs, f"no DDD17 'dir*' folders under {root}"
        self.height, self.width = height, width
        self.pairs: List[tuple[str, str]] = []
        for d in get_split_dirs(data_dirs, split):
            for mask in sorted(glob.glob(os.path.join(d, "segmentation_masks", "*.png"))):
                fid = os.path.basename(mask).split("_")[-1]
                for name in (f"img_{fid}", fid.zfill(14)):
                    img = os.path.join(d, "imgs", name)
                    if os.path.exists(img):
                        self.pairs.append((img, mask))
                        break
        assert self.pairs, "no paired DDD17 frames found (imgs/ missing?)"

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        img_path, mask_path = self.pairs[idx]
        img = cv2.imread(img_path, 0)
        label = cv2.imread(mask_path, 0)
        # same geometry as the event branch: resize to 352 wide, crop the 60
        # bottom rows (ddd17_events_loader.py:120-123, :173)
        img = cv2.resize(img, (self.width, 260))[: self.height]
        label = cv2.resize(label, (self.width, self.height),
                           interpolation=cv2.INTER_NEAREST)
        return {
            "image": (img.astype(np.float32) / 255.0)[..., None],
            "label": label.astype(np.uint8),
        }


class ConcatImages:
    """Concatenate image datasets (the 'DDD17_Cityscapes_gray' combo,
    settings.py:103-106)."""

    def __init__(self, *datasets):
        self.datasets = datasets
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        di = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[di][idx - int(self._offsets[di])]
