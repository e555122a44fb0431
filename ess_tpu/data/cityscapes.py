"""Cityscapes grayscale still-image dataset (sensor A, host ingest).

Capability parity with CityscapesGray
(/root/reference/datasets/cityscapes_loader.py:11-126): leftImg8bit frames ->
grayscale, gtFine labelIds -> 6/11-class trainIds via the LUT remap
(ess_tpu.core.labels), two geometry modes —
- random_crop (DDD17 pairing): resize to 256x512, keep the top ``height``
  rows, then augment/crop to (height, width) (:20-29, :98-106)
- full-frame (DSEC pairing): resize directly to (height, width)
— and the reference's train augmentation stack (:40-74): horizontal flip,
up-scale 0..50% + shift, pad+random crop, gaussian noise, perspective,
brightness/contrast, sharpen/blur/motion-blur. Augmentations run before the
trainId remap so geometric border fill (id 0 = 'unlabeled') lands on
ignore=255 through the LUT, exactly like the reference.

Implementation is numpy/cv2 (albumentations is not vendored here); each
transform mirrors the corresponding A.* op's sampling ranges.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ess_tpu.core import labels as labels_mod


class CityscapesGray:
    def __init__(
        self,
        root: str,
        height: int,
        width: int,
        split: str = "train",
        semseg_num_classes: int = 6,
        augmentation: bool = False,
        random_crop: bool = True,
        standardization: bool = False,
        seed: int = 6,
    ):
        self.height, self.width = height, width
        self.split = split
        self.num_classes = semseg_num_classes
        self.augmentation = augmentation
        self.random_crop = random_crop
        # per-image min-max rescale to the full 8-bit range
        # (cityscapes_loader.py:35-38, :94-98)
        self.standardization = standardization
        self.resize_hw: Tuple[int, int] = (256, 512) if random_crop else (height, width)
        self.seed = seed
        # per-(index, pass) generators: BatchLoader maps __getitem__ over a
        # thread pool and np.random.Generator is not thread-safe; a seeded
        # per-call generator is safe AND reproducible regardless of thread
        # scheduling (the n-th access of a sample always draws the same augs)
        import threading
        self._pass_lock = threading.Lock()
        self._pass_count: dict = {}

        img_dir = os.path.join(root, "leftImg8bit", split)
        self.images: List[str] = sorted(
            glob.glob(os.path.join(img_dir, "*", "*_leftImg8bit.png")))
        assert self.images, f"no Cityscapes images under {img_dir}"
        self.labels = [
            p.replace(os.sep + "leftImg8bit" + os.sep, os.sep + "gtFine" + os.sep)
            .replace("_leftImg8bit.png", "_gtFine_labelIds.png")
            for p in self.images
        ]

    def __len__(self) -> int:
        return len(self.images)

    # ---------------- augmentations (host, cv2) ----------------

    def _rng_for(self, index: int) -> np.random.Generator:
        with self._pass_lock:
            n = self._pass_count.get(index, 0)
            self._pass_count[index] = n + 1
        return np.random.default_rng((self.seed, index, n))

    def _augment(self, img: np.ndarray, label: np.ndarray, rng: np.random.Generator):
        import cv2

        if rng is None:  # a fixed fallback rng would silently repeat draws
            raise ValueError("_augment requires a per-sample rng "
                             "(use _rng_for(idx))")
        h, w = self.height, self.width

        if rng.random() < 0.5:  # HorizontalFlip
            img, label = img[:, ::-1], label[:, ::-1]

        if rng.random() < 0.5:  # ShiftScaleRotate(scale 0..0.5, shift 0.1, rot 0)
            scale = 1.0 + rng.uniform(0.0, 0.5)
            shift_lim = 0.1 if self.random_crop else 0.0
            tx = rng.uniform(-shift_lim, shift_lim) * img.shape[1]
            ty = rng.uniform(-shift_lim, shift_lim) * img.shape[0]
            m = np.array([[scale, 0, tx + (1 - scale) * img.shape[1] / 2],
                          [0, scale, ty + (1 - scale) * img.shape[0] / 2]],
                         np.float32)
            size = (img.shape[1], img.shape[0])
            img = cv2.warpAffine(img, m, size, flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_CONSTANT, borderValue=0)
            label = cv2.warpAffine(label, m, size, flags=cv2.INTER_NEAREST,
                                   borderMode=cv2.BORDER_CONSTANT, borderValue=0)

        # PadIfNeeded + RandomCrop to (h, w)
        ph, pw = max(h - img.shape[0], 0), max(w - img.shape[1], 0)
        if ph or pw:
            img = np.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))
            label = np.pad(label, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))
        y0 = rng.integers(0, img.shape[0] - h + 1)
        x0 = rng.integers(0, img.shape[1] - w + 1)
        img = img[y0: y0 + h, x0: x0 + w]
        label = label[y0: y0 + h, x0: x0 + w]

        if rng.random() < 0.2:  # GaussNoise
            img = np.clip(
                img.astype(np.float32) + rng.normal(0, 10, img.shape), 0, 255
            ).astype(np.uint8)

        if rng.random() < 0.2:  # Perspective(scale 0.05..0.1)
            s = rng.uniform(0.05, 0.1)
            jitter = rng.uniform(-s, s, (4, 2)).astype(np.float32) * [w, h]
            src = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
            dst = src + jitter
            m = cv2.getPerspectiveTransform(src, dst)
            img = cv2.warpPerspective(img, m, (w, h), flags=cv2.INTER_LINEAR,
                                      borderMode=cv2.BORDER_CONSTANT, borderValue=0)
            label = cv2.warpPerspective(label, m, (w, h), flags=cv2.INTER_NEAREST,
                                        borderMode=cv2.BORDER_CONSTANT, borderValue=0)

        if rng.random() < 0.5:  # RandomBrightnessContrast
            alpha = 1.0 + rng.uniform(-0.2, 0.2)
            beta = rng.uniform(-0.2, 0.2) * 255
            img = np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)

        if rng.random() < 0.5:  # OneOf(Sharpen, Blur, MotionBlur)
            choice = rng.integers(0, 3)
            if choice == 0:
                blur = cv2.GaussianBlur(img, (0, 0), 1.0)
                img = np.clip(
                    img.astype(np.float32) * 1.5 - blur.astype(np.float32) * 0.5,
                    0, 255).astype(np.uint8)
            elif choice == 1:
                img = cv2.blur(img, (3, 3))
            else:
                k = np.zeros((3, 3), np.float32)
                if rng.random() < 0.5:
                    k[1, :] = 1 / 3
                else:
                    k[:, 1] = 1 / 3
                img = cv2.filter2D(img, -1, k)

        return img, label

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        img = cv2.imread(self.images[idx], 0)  # grayscale
        label = cv2.imread(self.labels[idx], 0)
        rh, rw = self.resize_hw
        img = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
        label = cv2.resize(label, (rw, rh), interpolation=cv2.INTER_NEAREST)

        if self.standardization:
            lo, hi = int(img.min()), int(img.max())
            img = (255.0 * (img.astype(np.float32) - lo)
                   / max(hi - lo, 1)).astype(np.uint8)

        if self.random_crop:
            img = img[: self.height]
            label = label[: self.height]
            if self.augmentation and self.split == "train":
                img, label = self._augment(img, label, self._rng_for(idx))
            else:  # center crop to (height, width)
                x0 = max((img.shape[1] - self.width) // 2, 0)
                img = img[:, x0: x0 + self.width]
                label = label[:, x0: x0 + self.width]
        elif self.augmentation and self.split == "train":
            img, label = self._augment(img, label, self._rng_for(idx))

        label = labels_mod.id_to_train_id(label, self.num_classes)
        return {
            "image": (img.astype(np.float32) / 255.0)[..., None],
            "label": label.astype(np.uint8),
        }
