"""Persistent XLA compilation cache. The rasterization pipeline's variadic
sort + Pallas modules cost minutes to compile on TPU; the cache makes that a
once-per-shape cost across processes and restarts."""

import logging
import os

log = logging.getLogger(__name__)

_DEFAULT = os.path.expanduser("~/.cache/gaussian_splatting_tpu/xla")


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # non-fatal: just slower compiles
        log.warning("compilation cache unavailable: %s", e)
