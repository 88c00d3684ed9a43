"""Device mesh construction for multi-chip / multi-host training.

The reference has no working distributed path (a dead ``--distributed`` flag,
reference ``train.py:44`` / ``training_config.py:69-70`` — see SURVEY §2.12).
Here parallelism is first-class, with the rendering-workload analogs of the
classic axes:

- ``data``  — view/data parallelism: the camera batch shards across chips.
- ``model`` — the TP/SP-analog axis, used twice per step:
    phase 1 (TP-analog): gaussian projection + SH eval computed on a 1/m
      slice of the gaussian axis per chip, then ``all_gather`` of the compact
      screen-space tensors over ICI;
    phase 2 (SP/CP-analog): image tile-rows (bands) shard across the same
      axis — each chip rasterizes its band against all gaussians.
  Per-gaussian parameter gradients come back via the transposes XLA inserts
  (``psum_scatter`` for the gather, ``psum`` for replicated params).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` —
``jax.devices()`` then spans hosts and the same named-axis code scales over
DCN, per the GSPMD model.
"""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"mesh ({data}x{model}) needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
