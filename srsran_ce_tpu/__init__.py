"""srsran_ce_tpu — TPU-native 5G NR SRS/PUSCH channel-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pjookim/srsran-ce-pytorch (see SURVEY.md): LS pilot de-spreading, CFO
estimation/compensation, CDM interference averaging, raised-cosine MMSE-style
frequency smoothing with virtual-pilot edge extrapolation, IFFT power-delay-profile
time alignment, linear / CNN-inpainting interpolation to the full resource grid, and
noise-variance / RSRP / EPRE measurement — batched, jitted, and sharded over TPU
device meshes.
"""
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
