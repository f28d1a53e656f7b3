"""In-kernel (Mosaic-lowerable) emulations of the three transcendental /
control-flow-ish ops the estimator front needs and this environment's Mosaic
lowering lacks: `atan2`, the phase-unwrap running sum (`cumsum`), and
first-maximum `argmax`.

Round 3 declared the fused Pallas estimator front "blocked outright" on these
three ops; each has a standard elementwise formulation (ARCHITECTURE.md /
round-3 verdict item 2):

  atan2   — Cephes-style two-range polynomial on min/max ratio + quadrant
            fix-up, all selects (float32 accuracy ~2 ulp);
  cumsum  — log2(n) shift-and-add doubling passes (static slices + pad, no
            scatter/gather);
  argmax  — reduce-max, then min over an iota masked to the arg positions
            (reproduces jnp.argmax's first-maximum tie rule).

All functions are pure jnp on values (no refs), so they run identically inside
Pallas kernel bodies, in interpret mode, and in plain traced code — the parity
tests compare them against the jnp originals elementwise.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Cephes atanf polynomial coefficients (single precision, |t| <= tan(pi/8))
_ATAN_P = (8.05374449538e-2, -1.38776856032e-1, 1.99777106478e-1, -3.33329491539e-1)
_TAN_PI_8 = 0.4142135623730950  # tan(pi/8)
_PI = float(np.pi)
_PI_2 = float(np.pi / 2)
_PI_4 = float(np.pi / 4)


def _atan01(t: jnp.ndarray) -> jnp.ndarray:
    """atan(t) for t in [0, 1] — Cephes two-range polynomial, select-based."""
    dt = t.dtype
    hi = t > jnp.asarray(_TAN_PI_8, dt)
    # second range reduction: atan(t) = pi/4 + atan((t-1)/(t+1)) for t > tan(pi/8)
    tr = jnp.where(hi, (t - 1.0) / (t + 1.0), t)
    base = jnp.where(hi, jnp.asarray(_PI_4, dt), jnp.asarray(0.0, dt))
    z = tr * tr
    p = jnp.asarray(_ATAN_P[0], dt)
    for c in _ATAN_P[1:]:
        p = p * z + jnp.asarray(c, dt)
    return base + p * z * tr + tr


def atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise atan2(y, x) from min/max-ratio atan + quadrant fix-up.

    Matches jnp.arctan2 to ~2 ulp in float32 on finite inputs, including the
    axes (x==0 or y==0), signed zeros (atan2(-0.0, x<0) = -pi) and the
    (+-0, +0) -> +-0 convention (the sign selects ride jnp.signbit, which
    Mosaic lowers as a bitcast+compare)."""
    dt = jnp.result_type(y, x)
    y = y.astype(dt)
    x = x.astype(dt)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.where(mx > 0, mx, jnp.asarray(1.0, dt))  # (0,0) -> 0
    r = _atan01(t)
    r = jnp.where(ay > ax, jnp.asarray(_PI_2, dt) - r, r)
    r = jnp.where(jnp.signbit(x), jnp.asarray(_PI, dt) - r, r)
    return jnp.where(jnp.signbit(y), -r, r)


def cumsum_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along the LAST axis via log2(n) doubling passes
    (static slices + zero-pad; no scatter). Mosaic-friendly for any axis
    length; exact same association as the sequential sum is NOT guaranteed
    (it is a balanced-tree association, like lax.associative_scan)."""
    n = x.shape[-1]
    shift = 1
    while shift < n:
        z = jnp.zeros(x.shape[:-1] + (shift,), x.dtype)
        x = x + jnp.concatenate(
            [z, jax.lax.slice_in_dim(x, 0, n - shift, axis=-1)], axis=-1
        )
        shift *= 2
    return x


def unwrap_last(ph: jnp.ndarray) -> jnp.ndarray:
    """Phase unwrap along the last axis (numpy.unwrap semantics, period 2pi):
    wrap successive differences to [-pi, pi) (pi maps to pi, matching numpy's
    ddmod convention), then add the running correction."""
    dt = ph.dtype
    two_pi = jnp.asarray(2.0 * _PI, dt)
    d = ph[..., 1:] - ph[..., :-1]
    # ddmod = (d + pi) mod 2pi - pi, with the numpy convention that a wrapped
    # value of -pi with positive d maps to +pi
    dd = d - two_pi * jnp.floor((d + jnp.asarray(_PI, dt)) / two_pi)
    dd = jnp.where((dd == -jnp.asarray(_PI, dt)) & (d > 0), jnp.asarray(_PI, dt), dd)
    corr = dd - d
    # small diffs need no correction (numerical noise guard like np.unwrap's
    # discont=pi: |d| < pi => correction exactly 0 by construction above)
    corr_cum = cumsum_last(corr)
    z = jnp.zeros(ph.shape[:-1] + (1,), dt)
    return ph + jnp.concatenate([z, corr_cum], axis=-1)


def argmax_last(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """First-maximum argmax along the last axis as max + masked-iota min
    (jnp.argmax tie semantics), returned as int32."""
    m = jnp.max(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    big = jnp.asarray(n, jnp.int32)
    return jnp.min(jnp.where(x == m, iota, big), axis=-1, keepdims=keepdims)
