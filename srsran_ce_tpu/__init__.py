"""srsran_ce_tpu — TPU-native 5G NR SRS/PUSCH channel-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pjookim/srsran-ce-pytorch (see SURVEY.md): LS pilot de-spreading, CFO
estimation/compensation, CDM interference averaging, raised-cosine MMSE-style
frequency smoothing with virtual-pilot edge extrapolation, IFFT power-delay-profile
time alignment, linear / CNN-inpainting interpolation to the full resource grid, and
noise-variance / RSRP / EPRE measurement — batched, jitted, and sharded over TPU
device meshes.
"""
import os as _os


def _enable_persistent_compile_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache (off: SRSCE_NO_CACHE=1).

    Compiles dominate wall time in this environment (5-52 s per bench row; the
    batch-128 NR BG1 Z=384 decoder alone ~20 min) and are identical across runs —
    the cache turns every repeat into a disk read. Respects an externally
    configured `jax_compilation_cache_dir` / JAX_COMPILATION_CACHE_DIR."""
    if _os.environ.get("SRSCE_NO_CACHE") == "1":
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir or _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR"
        ):
            return  # already configured — don't fight the environment
        cache_dir = _os.environ.get(
            "SRSCE_JAX_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "srsran_ce_tpu", "jax"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took non-trivial compile time, however small
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # never let cache plumbing break the import


_enable_persistent_compile_cache()

from .config import (
    NRE,
    EstimatorConfig,
    HopConfig,
    baseline_config,
    cnn_config,
    make_config,
    normal_cp_durations_ms,
    tensorized_config,
)

__version__ = "0.1.0"

__all__ = [
    "NRE",
    "EstimatorConfig",
    "HopConfig",
    "baseline_config",
    "cnn_config",
    "make_config",
    "normal_cp_durations_ms",
    "tensorized_config",
]
