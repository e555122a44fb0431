"""Cityscapes label taxonomy and trainId remaps (6-class and 11-class).

Capability parity with the reference's Label tables and remap helpers
(/root/reference/utils/labels.py:40-139) and the class-name/color tables baked
into its Settings object (/root/reference/config/settings.py:179-205).

Rebuilt TPU-first: instead of a Python loop over 34 ids per image
(labels.py:129-133), remaps are 256-entry uint8 lookup tables applied with a
single vectorized gather — usable from numpy on the host ingest path and from
jax.numpy on device.
"""

from __future__ import annotations

import numpy as np

IGNORE_LABEL = 255

# Cityscapes ids 0..33 -> 6-class trainIds.
# Classes: 0 flat, 1 background, 2 object, 3 vegetation, 4 human, 5 vehicle.
_SIX = {
    7: 0, 8: 0,                    # road, sidewalk -> flat
    11: 1, 12: 1, 13: 1, 23: 1,    # building, wall, fence, sky -> background
    17: 2, 19: 2, 20: 2,           # pole, traffic light, traffic sign -> object
    21: 3, 22: 3,                  # vegetation, terrain -> vegetation
    24: 4, 25: 4,                  # person, rider -> human
    26: 5, 27: 5, 28: 5, 31: 5, 32: 5, 33: 5,  # car..bicycle -> vehicle
}

# Cityscapes ids 0..33 -> 11-class trainIds.
# Classes: 0 background(sky), 1 building, 2 fence, 3 person, 4 pole, 5 road,
# 6 sidewalk, 7 vegetation, 8 car, 9 wall, 10 traffic sign.
_ELEVEN = {
    23: 0,
    11: 1,
    13: 2,
    24: 3, 25: 3,
    17: 4,
    7: 5,
    8: 6,
    21: 7, 22: 7,
    26: 8, 27: 8, 28: 8, 31: 8, 32: 8, 33: 8,
    12: 9,
    19: 10, 20: 10,
}


def _build_lut(mapping: dict[int, int]) -> np.ndarray:
    lut = np.full((256,), IGNORE_LABEL, dtype=np.uint8)
    for cs_id, train_id in mapping.items():
        lut[cs_id] = train_id
    return lut


ID_TO_TRAINID_6 = _build_lut(_SIX)
ID_TO_TRAINID_11 = _build_lut(_ELEVEN)

CLASS_NAMES_6 = ["flat", "background", "object", "vegetation", "human", "vehicle"]
CLASS_NAMES_11 = [
    "background", "building", "fence", "person", "pole", "road",
    "sidewalk", "vegetation", "car", "wall", "traffic sign",
]

# RGB color maps matching /root/reference/config/settings.py:183-205.
COLOR_MAP_6 = np.array(
    [
        [128, 64, 128],
        [70, 70, 70],
        [220, 220, 0],
        [107, 142, 35],
        [220, 20, 60],
        [0, 0, 142],
    ],
    dtype=np.uint8,
)
COLOR_MAP_11 = np.array(
    [
        [0, 0, 0],
        [70, 70, 70],
        [190, 153, 153],
        [220, 20, 60],
        [153, 153, 153],
        [128, 64, 128],
        [244, 35, 232],
        [107, 142, 35],
        [0, 0, 142],
        [102, 102, 156],
        [220, 220, 0],
    ],
    dtype=np.uint8,
)


def class_names(num_classes: int) -> list[str]:
    if num_classes == 6:
        return CLASS_NAMES_6
    if num_classes == 11:
        return CLASS_NAMES_11
    # e.g. the 19-class DSEC streaming eval: no named taxonomy in the
    # reference either (only 6/11 live in settings.py:179-205)
    return [f"class_{i}" for i in range(num_classes)]


def color_map(num_classes: int) -> np.ndarray:
    if num_classes == 6:
        return COLOR_MAP_6
    if num_classes == 11:
        return COLOR_MAP_11
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (num_classes, 3)).astype(np.uint8)


def id_to_train_id(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Remap raw Cityscapes ids to trainIds via LUT gather (vectorized)."""
    lut = ID_TO_TRAINID_6 if num_classes == 6 else ID_TO_TRAINID_11
    return lut[labels.astype(np.int64)]


def shift_up(labels: np.ndarray) -> np.ndarray:
    """Shift labels up by one so 0 can serve as a padding value through
    augmentation libraries that fill masks with 0 (reference labels.py:136-139
    protects ignore=255 this way: 255 -> 0 mod 256 on uint8 wrap)."""
    return (labels.astype(np.int64) + 1).astype(labels.dtype)


def shift_down(labels: np.ndarray) -> np.ndarray:
    """Inverse of :func:`shift_up`; augmentation fill value 0 maps to ignore."""
    out = labels.astype(np.int64)
    out = np.where(out == 0, 256, out) - 1
    return out.astype(np.uint8) if labels.dtype == np.uint8 else out.astype(labels.dtype)
