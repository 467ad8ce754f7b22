"""Mesh construction over ICI/DCN.

Axis convention (scaling-book style):
    "data"  — batch/data parallel; rides DCN across hosts when needed.
    "model" — tensor parallel; must ride ICI (contiguous device dims).

``build_mesh`` lays the model axis over the innermost (ICI-contiguous)
device dimensions via ``mesh_utils.create_device_mesh`` so per-layer
all-reduces stay on ICI (BASELINE north star: TP over ICI with overlap).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model

    @classmethod
    def auto(cls, num_devices: Optional[int] = None,
             max_model: int = 8) -> "MeshConfig":
        """Prefer TP up to ``max_model``, then scale DP (SNIPPETS.md [3])."""
        n = num_devices or len(jax.devices())
        model = 1
        for cand in (8, 4, 2, 1):
            if cand <= max_model and n % cand == 0:
                model = cand
                break
        return cls(data=n // model, model=model)


def build_mesh(cfg: MeshConfig | None = None,
               devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg or MeshConfig.auto(len(devices))
    if cfg.num_devices != len(devices):
        raise ValueError(f"mesh {cfg} needs {cfg.num_devices} devices, "
                         f"have {len(devices)}")
    if len(devices) == 1:
        dev_array = np.asarray(devices).reshape(1, 1)
    else:
        dev_array = mesh_utils.create_device_mesh(
            (cfg.data, cfg.model), devices=devices)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return build_mesh(MeshConfig(1, 1), devices=jax.devices()[:1])
