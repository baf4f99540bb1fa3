"""Data transformer: crop / mirror / mean-subtract / scale.

Reference: `DataTransformer<Dtype>::Transform`
(`src/caffe/data_transformer.cpp`): random crop + horizontal mirror at TRAIN,
center crop at TEST, mean (per-pixel or per-channel) subtraction, scaling.
NHWC instead of the reference's CHW.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class TransformParams:
    crop_size: int = 0
    mirror: bool = False
    scale: float = 1.0
    mean_value: Optional[Tuple[float, ...]] = None  # per-channel
    mean_image: Optional[np.ndarray] = None  # per-pixel [H,W,C]
    phase: str = "train"


class DataTransformer:
    def __init__(self, params: TransformParams, seed: int = 0):
        self.p = params
        self.rng = np.random.default_rng(seed)

    def __call__(self, batch):
        out = dict(batch)
        x = np.asarray(batch["data"], np.float32)
        n, h, w, c = x.shape
        p = self.p
        if p.mean_image is not None:
            x = x - p.mean_image[None]
        elif p.mean_value is not None:
            x = x - np.asarray(p.mean_value, np.float32)
        if p.scale != 1.0:
            x = x * p.scale
        if p.crop_size:
            cs = p.crop_size
            if p.phase == "train":
                oy = self.rng.integers(0, h - cs + 1)
                ox = self.rng.integers(0, w - cs + 1)
            else:  # center crop (data_transformer.cpp:64-66)
                oy, ox = (h - cs) // 2, (w - cs) // 2
            x = x[:, oy : oy + cs, ox : ox + cs, :]
        if p.mirror and p.phase == "train" and self.rng.random() < 0.5:
            x = x[:, :, ::-1, :]
        out["data"] = np.ascontiguousarray(x)
        return out
