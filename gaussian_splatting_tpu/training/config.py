"""Training configuration — the single dataclass of all knobs, mirroring the
reference ``training_config.py:5-93`` (same field names and defaults where the
semantics carried over; TPU-specific fields documented inline)."""

import dataclasses
from typing import List, Optional


@dataclasses.dataclass
class TrainingConfig:
    # --- video processing (reference :15-18) ---
    frame_stride: int = 30
    image_scale: float = 1.0
    cache_dir: str = "./cache"
    matcher: str = "sift"          # sift | orb

    # --- gaussians (reference :21-26) ---
    initial_gaussians: int = 100_000
    # Initial opacity (reference hardcodes 0.005, trainer.py:167; the original
    # 3DGS paper uses 0.1 — with the 1/255 alpha cutoff, 0.005 leaves most
    # gaussians gradient-dead for thousands of iterations).
    init_opacity: float = 0.005
    max_gaussians: int = 10_000_000
    densify_interval: int = 100
    densify_from_iteration: int = 5000   # reference trainer.py:793 (iter > 5000)
    opacity_reset_interval: int = 5000

    # --- densify thresholds (reference :28-44) ---
    densify_grads_threshold: float = 5e-4
    # > 0: replace the absolute threshold with a rank threshold — densify
    # the top fraction of alive gaussians by accumulated grad norm each
    # event. Scale-free where the reference's 5e-4 is calibrated to one
    # scene's gradient magnitude (see models/densify.py).
    densify_topk_fraction: float = 0.0
    densify_min_opacity: float = 0.005
    densify_clone_extent_ratio: float = 0.1
    densify_prune_extent_ratio: float = 2.0
    scale_clamp_ratio: float = 0.2
    scale_reg_max_ratio: float = 10.0
    scale_reg_weight: float = 0.1

    # --- SH warmup (reference :46-51) ---
    sh_degree_max: int = 3
    sh_increment_interval: int = 1000

    # --- optimization (reference :54-60 and trainer.py:331-340) ---
    iterations: int = 300_000
    batch_size: int = 4
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-7
    position_lr_max_steps: int = 300_000
    lr_features_dc: float = 2.5e-3
    lr_features_rest: float = 1.25e-4
    lr_opacity: float = 0.05
    lr_scaling: float = 5e-3
    lr_rotation: float = 1e-3
    adam_eps: float = 1e-15
    adam_b1: float = 0.9
    adam_b2: float = 0.999

    # --- losses (reference :73) ---
    lambda_dssim: float = 0.2
    # AMP-analog (reference trains under torch autocast, trainer.py:31,468):
    # "bfloat16" runs the L1/SSIM image math in bf16 with f32 scalars.
    # Measured on config 2 (see BENCH.md round 4): within noise on TPU —
    # the hot path (kernels + sorts) is f32 by design, and the loss maps
    # are a sub-ms fraction of the step. Kept as an option, off by default.
    loss_dtype: str = "float32"

    # --- TPU execution ---
    tile_size: int = 16
    raster_chunk: int = 256
    # Static cap on tiles covered per gaussian (the sort size is
    # N * max_tiles_per_gaussian; overflow is counted, not silently lost).
    max_tiles_per_gaussian: int = 16
    # Measure the init population's screen footprint and raise the cap to its
    # p95 (bounded below by max_tiles_per_gaussian, above by the sort-size
    # budget). Sparse SfM clouds produce huge kNN-init scales whose
    # footprints a fixed cap of 16 would truncate to corner smears.
    auto_max_tiles: bool = True
    # Upper bound on N * max_t (sort entries) the auto mode may choose.
    max_sort_entries: int = 32_000_000
    # Compact footprint-class binning (ops/tiling.py): per-class gaussian
    # budgets for caps (1, 2, 4, ..., max_tiles_per_gaussian). None = dense
    # N*max_t slots. "auto" binning measures the init population's class
    # histogram and sets minimal budgets (trimmed under a pow2 sort boundary
    # when close); overflow is counted every step (stats/n_budget_dropped)
    # and rebudgeted with escalating headroom.
    binning: str = "auto"              # auto | compact | dense
    # >0 packs (tile << bits | quantized depth) into ONE int32 sort key
    # (cheaper compare; blend order of nearly-equal depths quantizes).
    sort_depth_bits: int = 0
    # >0 (power of two): route the BINNING sort through the Pallas bucket
    # partition + B per-bucket sorts (ops/partition.py) — lax.sort runs
    # ~5x cheaper per entry at rows <= 1M than at the flat 4M+ length
    # (BENCH.md). Per-chunk quantum overflow is counted, never silent.
    # Ignores sort_depth_bits (bucket sorts use the exact two-key compare).
    sort_buckets: int = 0
    partition_headroom: float = 1.5
    # >1: band-split binning — K independent per-screen-band (tile, depth)
    # sorts concatenated in band order (lax.sort is strongly superlinear in
    # row length; bands ride the short-sort rate with no partition kernel).
    # class_budgets are shared across bands (sized for the heaviest band).
    # Exclusive with sort_buckets.
    sort_bands: int = 0
    # >1: the gradient-reduce sorts K static slices separately and adds the
    # per-slice segsums (sums are associative; order is irrelevant) —
    # drop-free, no partition kernel, rides the same small-sort rate.
    reduce_slices: int = 0
    class_budgets: Optional[tuple] = None
    # Gradient-buffer capacity as a fraction of the exact bound (the sort
    # slot count). The gid payload sort over this buffer is the costliest
    # backward stage and scales ~linearly with its static length, while the
    # measured occupancy (early-terminated chunks are dropped in-kernel) is
    # typically ~55-75% of the bound. 1.0 = exact, can never drop. Below 1,
    # the trainer probes exact occupancy (rasterize_grad_meta) every
    # val_interval and raises the frac when a probe shows drops or >92%
    # occupancy (hysteresis recompile, like class rebudgets).
    grad_buffer_frac: float = 1.0
    backend: str = "auto"              # auto | pallas | ref
    # --- camera pose refinement (capability the reference lacks: its SfM
    # poses are frozen; measured on the synthetic-orbit benchmark the SfM
    # pose error caps PSNR at ~16 dB where exact poses reach 47 dB) ---
    # Optimize a per-train-view se(3) delta jointly with the gaussians
    # (core/se3.py; validation views stay unrefined).
    optimize_poses: bool = False
    pose_lr_init: float = 1e-3
    pose_lr_final: float = 1e-5
    pose_start_iter: int = 0           # let the gaussians settle first
    # Test-time pose alignment at validation (BARF/CamP eval protocol):
    # once train poses are refined, the model's gauge drifts from the SfM
    # gauge the held-out views were posed in, so raw val PSNR conflates
    # reconstruction error with camera error. With steps > 0, validation
    # additionally optimizes ONE se(3) delta per val view (gaussians
    # frozen) and reports `val/psnr_aligned` next to the raw `val/psnr`.
    val_pose_align_steps: int = 0
    val_pose_align_lr: float = 3e-3
    # "antialiased" multiplies opacity by the covariance compensation factor
    # (gsplat rasterize_mode="antialiased" parity); "classic" matches the
    # reference's default gsplat call (gsplat_backend.py:83-97).
    rasterize_mode: str = "classic"    # classic | antialiased
    capacity_headroom: float = 1.5     # buffer capacity / population target
    donate_step_buffers: bool = True

    # --- parallelism (new first-class components; reference had a dead
    # `distributed` flag, see SURVEY §2.12) ---
    mesh_data: int = 1                 # view/data-parallel axis size
    mesh_tile: int = 1                 # image-tile (SP-analog) axis size

    # --- logging / validation (reference :78-87) ---
    log_scalar_interval: int = 10
    log_image_interval: int = 2000
    log_hist_interval: int = 5000
    val_interval: int = 1000
    val_fraction: float = 0.1
    val_max_views: int = 16
    val_seed: int = 42
    checkpoint_interval: int = 10000

    # --- observability (W&B-compatible; JSONL always written) ---
    wandb_project: str = "3d-gaussian-splatting-tpu"
    wandb_entity: Optional[str] = None
    wandb_mode: str = "disabled"
    wandb_run_name: Optional[str] = None
    wandb_tags: Optional[List[str]] = None

    # --- eval ---
    eval_num_views: int = 12

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)
