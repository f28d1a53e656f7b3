"""Serving front-end: plan-bucketed batching over heterogeneous problem streams.

The reference processes one (grid, pilots, config) problem per Python call. A
production estimator serves *streams* of problems from many cells/UEs/slots whose
configurations differ — but TPU executables are per-configuration (static shapes).
This module is the piece in between:

  1. group incoming problems by plan signature (hop1, hop2, config, n_layers) —
     identical signatures share one compiled executable (models/plan.make_plan
     lru cache + estimator._build_ri_cached);
  2. pack each group into fixed-size batches (padding the tail batch by repetition
     so no shape ever compiles twice);
  3. run the batched ri-layout executable per bucket and scatter results back into
     submission order.

This is the SURVEY.md §2.3 "batched front-end over (cell, UE, port, slot) problem
tuples" component and the BASELINE.json "4096 concurrent estimations" use case as
an API. Pure host-side orchestration — the compute path is exactly
estimator.build_ri.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import EstimatorConfig, HopConfig
from .models import estimator

try:  # native multithreaded batch packer (C++, srsran_ce_tpu/native)
    from .native import loader as _native
except Exception:  # pragma: no cover - no compiler available
    _native = None


def _assemble(arrays) -> np.ndarray:
    """B scattered complex problems -> one contiguous (B, 2, ...) f32 ri batch."""
    if _native is not None:
        try:
            return _native.assemble_batch_ri(arrays)
        except Exception:
            pass
    return np.stack([estimator.split_ri(np.asarray(a).astype(np.complex64)) for a in arrays])


@dataclass
class Problem:
    """One estimation request (mirrors the reference call signature,
    ce_rule_baseline.py:761-768)."""

    received_rg: np.ndarray  # (n_sc, n_sym) complex
    pilots: np.ndarray  # (n_re, n_dsym, n_layers) complex
    beta: float
    hop1: HopConfig
    hop2: Optional[HopConfig]
    config: EstimatorConfig

    def signature(self) -> Tuple:
        hop2 = None if (self.hop2 is not None and self.hop2.is_empty) else self.hop2
        return (self.hop1, hop2, self.config, int(self.pilots.shape[-1]))


@dataclass
class ServeResult:
    """Host-side per-problem result (complex channel grid, reference layout)."""

    channel_est_rg: np.ndarray  # (n_sc, n_sym, n_layers) complex64
    noise_est: float
    rsrp: float
    epre: float
    time_alignment: float
    cfo_hz: float


def process(
    problems: List[Problem],
    batch_size: int = 128,
    matmul_precision: Optional[str] = "high",
) -> List[ServeResult]:
    """Estimate a heterogeneous list of problems; results in submission order.

    Problems are bucketed by plan signature; each bucket runs in fixed
    `batch_size` chunks (the tail chunk is padded by repeating its last problem,
    so each signature compiles exactly one executable). `matmul_precision`
    overrides every problem's config precision for serving (None keeps each
    config's own setting).
    """
    import dataclasses as _dc

    buckets: Dict[Tuple, List[int]] = {}
    for i, p in enumerate(problems):
        buckets.setdefault(p.signature(), []).append(i)

    results: List[Optional[ServeResult]] = [None] * len(problems)
    for sig, idxs in buckets.items():
        hop1, hop2, config, n_layers = sig
        if matmul_precision is not None:
            config = _dc.replace(config, matmul_precision=matmul_precision)
        fn = estimator.build_ri(
            hop1, hop2, config, n_layers, batched=True, out_layout="serve"
        )
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            pad = batch_size - len(chunk) if len(idxs) > batch_size else 0
            take = chunk + [chunk[-1]] * pad  # repeat-pad the tail chunk
            rg_b = _assemble([problems[i].received_rg for i in take])
            pil_b = _assemble([problems[i].pilots for i in take])
            beta = np.asarray([problems[i].beta for i in take], np.float32)
            out = fn(rg_b, pil_b, jnp.asarray(beta))
            ch = np.asarray(out.channel_est_rg)  # (B, 2, nL, n_sym, n_sc)
            noise = np.asarray(out.noise_est)
            rsrp = np.asarray(out.rsrp)
            epre = np.asarray(out.epre)
            ta = np.asarray(out.time_alignment)
            cfo = np.asarray(out.cfo_hz)
            for k, i in enumerate(chunk):
                grid = estimator.merge_ri(ch[k])  # (nL, n_sym, n_sc) complex
                results[i] = ServeResult(
                    channel_est_rg=np.moveaxis(grid, (0, 1, 2), (2, 1, 0)),
                    noise_est=float(noise[k]),
                    rsrp=float(rsrp[k]),
                    epre=float(epre[k]),
                    time_alignment=float(ta[k]),
                    cfo_hz=float(cfo[k]),
                )
    return results  # type: ignore[return-value]
