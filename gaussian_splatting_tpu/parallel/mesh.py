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

import logging
import os

import numpy as np

import jax
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def init_multihost(coordinator: str = None, num_processes: int = None,
                   process_id: int = None) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize`` before any mesh /
    device use, so ``jax.devices()`` spans all hosts (collectives then ride
    ICI within a slice and DCN across hosts). Args fall back to the standard
    env vars (``COORDINATOR_ADDRESS``, ``NUM_PROCESSES``, ``PROCESS_ID``) and
    to TPU-pod auto-detection when none are set. Returns the process index.

    The reference's ``--distributed`` flag is dead code (reference
    ``train.py:44``, never read); this is its working TPU counterpart.
    """
    kw = {}
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator:
        kw["coordinator_address"] = coordinator
    n = num_processes or os.environ.get("NUM_PROCESSES")
    if n:
        kw["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)
    log.info("multi-host initialized: process %d/%d, %d global devices",
             jax.process_index(), jax.process_count(), len(jax.devices()))
    return jax.process_index()


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"mesh ({data}x{model}) needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
