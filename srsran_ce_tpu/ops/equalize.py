"""MMSE equalization — the downstream consumer of the channel estimates.

The reference stops at the channel estimate (srs_channel_estimator returns the
grid + measurements, ce_rule_baseline.py:761-768); an actual receiver then
equalizes the data REs with it. This module closes that loop, and is the
showcase for the factored (rank-1) output layout:

  * `mmse_equalize` — dense-grid path: per-RE MMSE filter
      x̂ = (H^H H + σ²/β² I)^(-1) H^H y / β
    over (n_rx, n_layers) with batched small solves, vectorized over (sc, sym).
  * `mmse_equalize_factored` — factored path: when the channel is
    H[sc, sym] = P[sc] · r[sym] with |r| = 1 (exactly what
    `estimator.FactoredResult` returns for time_interp="none"), the Gram matrix
    P^H P is TIME-INVARIANT, so the MMSE filter is computed once per subcarrier
    instead of once per RE — an n_sym-fold (14x) cheaper filter construction —
    and the rotation is undone as a per-symbol scalar:
      x̂[sc, sym] = conj(r[sym]) · W[sc] y[sc, sym].

Both return the post-equalization noise-normalized symbol estimates and the
per-(sc[, sym], layer) post-equalization SINR (the standard MMSE
1/diag((G+σ̃²I)^(-1)σ̃²) - 1 form), jittable and batchable with vmap.

Shapes (single problem): y (n_rx, n_sc, n_sym); H (n_rx, n_sc, n_sym, nL) dense
or P (n_rx, nL, n_sc) factored + r (n_sym,). n_rx == 1 recovers the
single-port case the estimator serves per antenna port.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _hermitian_inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of a (..., nL, nL) Hermitian positive-definite matrix.

    nL is tiny (≤4 layers) and static, so for nL ∈ {1, 2} the adjugate form is
    used: elementwise VPU math instead of `linalg.inv`'s batched LU, which XLA
    lowers to a per-matrix loop that serializes the (n_sc·n_sym)-sized batch.
    Larger nL falls back to `jnp.linalg.inv`.
    """
    nL = a.shape[-1]
    if nL == 1:
        return 1.0 / a
    if nL == 2:
        a00 = a[..., 0, 0]
        a11 = a[..., 1, 1]
        a01 = a[..., 0, 1]
        det = a00 * a11 - a01 * jnp.conj(a01)
        row0 = jnp.stack([a11, -a01], axis=-1)
        row1 = jnp.stack([-jnp.conj(a01), a00], axis=-1)
        return jnp.stack([row0, row1], axis=-2) / det[..., None, None]
    return jnp.linalg.inv(a)


def _mmse_inv(h: jnp.ndarray, noise_over_beta2: jnp.ndarray):
    """(..., n_rx, nL) channel -> (inv, hh): the regularized Gram inverse
    (G + σ̃²I)^(-1) (..., nL, nL) and H^H (..., nL, n_rx). The MMSE filter is
    inv @ hh; the post-MMSE SINR comes from diag(inv) — computed once, shared."""
    nL = h.shape[-1]
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))  # (..., nL, n_rx)
    gram = hh @ h  # (..., nL, nL)
    eye = jnp.eye(nL, dtype=h.dtype)
    return _hermitian_inverse(gram + noise_over_beta2.astype(h.dtype) * eye), hh


def _sinr_from_inv(inv: jnp.ndarray, noise_over_beta2: jnp.ndarray) -> jnp.ndarray:
    """Per-layer post-MMSE SINR: 1/diag((G + σ̃²I)^(-1)) / σ̃² - 1 (real)."""
    d = jnp.real(jnp.diagonal(inv, axis1=-2, axis2=-1))
    s = noise_over_beta2.real
    return jnp.maximum(1.0 / jnp.maximum(d * s, 1e-30) - 1.0, 0.0)


def mmse_equalize(
    received: jnp.ndarray,
    channel: jnp.ndarray,
    noise_var: jnp.ndarray,
    beta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense-grid MMSE equalization.

    received: (n_rx, n_sc, n_sym) complex; channel: (n_rx, n_sc, n_sym, nL)
    complex (e.g. per-port estimator outputs stacked on a leading rx axis);
    noise_var: scalar noise variance (estimator noise_est); beta: data-RE
    amplitude scale. Returns (x_hat (n_sc, n_sym, nL), sinr (n_sc, n_sym, nL)).
    """
    h = jnp.moveaxis(channel, 0, 2)  # (n_sc, n_sym, n_rx, nL)
    y = jnp.moveaxis(received, 0, -1)[..., None]  # (n_sc, n_sym, n_rx, 1)
    s = jnp.asarray(noise_var) / (beta * beta)
    inv, hh = _mmse_inv(h, s)
    x = (inv @ (hh @ y))[..., 0] / beta  # (n_sc, n_sym, nL)
    return x, _sinr_from_inv(inv, s)


def mmse_equalize_factored(
    received: jnp.ndarray,
    profiles: jnp.ndarray,
    sym_rot: jnp.ndarray,
    noise_var: jnp.ndarray,
    sym_start: int,
    n_alloc_syms: int,
    beta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factored-channel MMSE equalization for ONE hop's symbol range.

    received: (n_rx, n_sc, n_sym) complex (full grid; only the hop's symbols
    [sym_start, sym_start + n_alloc_syms) are equalized);
    profiles: (n_rx, nL, n_sc) — one hop row of FactoredResult.profiles per RX
    port; sym_rot: (n_sym,) unit-modulus rotation (shared by all ports: the CFO
    is a property of the UE's transmission).

    The filter is built ONCE per subcarrier (the unit-modulus rotation cancels
    in H^H H), then applied to every symbol with the rotation undone as a
    scalar — the n_sym x cheaper construction the factored layout exists for.
    Returns (x_hat (n_sc, n_alloc, nL), sinr (n_sc, nL)) for the hop's symbols.
    """
    # profiles (n_rx, nL, n_sc) -> per-sc (n_sc, n_rx, nL)
    h = jnp.transpose(profiles, (2, 0, 1))  # (n_sc, n_rx, nL)
    s = jnp.asarray(noise_var) / (beta * beta)
    inv, hh = _mmse_inv(h, s)
    w = inv @ hh  # (n_sc, nL, n_rx)
    rot = jax.lax.slice_in_dim(sym_rot, sym_start, sym_start + n_alloc_syms, axis=0)
    y = jax.lax.slice_in_dim(received, sym_start, sym_start + n_alloc_syms, axis=2)
    y = jnp.moveaxis(y, 0, -1)  # (n_sc, n_alloc, n_rx)
    # x[sc, t, l] = conj(rot[t]) * sum_r w[sc, l, r] y[sc, t, r]
    x = jnp.einsum("slr,str->stl", w, y) * jnp.conj(rot)[None, :, None] / beta
    return x, _sinr_from_inv(inv, s)
