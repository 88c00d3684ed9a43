"""TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of the reference pipeline
(ShayManor/3d-gaussian-splatting) for TPU hardware:

- ``core``     — cameras, quaternions, spherical harmonics, activations.
- ``ops``      — projection, tiling, the pure-JAX oracle rasterizer, and the
                 Pallas forward/backward splatting kernels.
- ``models``   — fixed-capacity gaussian parameter pytrees + densification.
- ``training`` — jitted train step, Adam with moment splicing, losses,
                 checkpoints with resume, PLY export.
- ``parallel`` — device mesh, shard_map rasterization, multi-host scaling.
- ``video``    — video ingestion + incremental SfM bootstrap (host-side).
- ``utils``    — metrics logging (JSONL + optional W&B), profiling helpers.
"""

__version__ = "0.1.0"
