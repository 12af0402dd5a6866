"""Device mesh construction (SURVEY.md §2.3).

The reference is single-process single-GPU; parallelism here is first-class:
a 2-axis mesh ``(data, model)`` where DP shards the batch (grad reduction = XLA
``psum`` over ICI) and the optional model axis carries the vocab-dim TP seam for
the embedding / output projection (SURVEY.md §2.3 table: "TP ... design seams
left in, off by default").
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from vidcap_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              num_data: Optional[int] = None,
              num_model: Optional[int] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    nm = num_model if num_model is not None else cfg.num_model
    nd = num_data if num_data is not None else cfg.num_data
    if nd == -1:
        nd = len(devices) // nm
    if nd * nm != len(devices):
        raise ValueError(
            f"mesh {nd}x{nm} does not cover {len(devices)} devices")
    arr = np.asarray(devices).reshape(nd, nm)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))
