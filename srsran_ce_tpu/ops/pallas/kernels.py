"""Pallas TPU kernels — the fused perf tier of the estimator.

The XLA tier (ops/dsp.py + models/estimator.py) is the default and the correctness
reference; these kernels fuse the memory-bound tail of the pipeline so each output
byte is written exactly once from VMEM:

  fused_fill_rotate : interp-matmul (MXU) + symbol broadcast + CFO phase rotation +
                      grid write, one pass. Replaces matmul -> broadcast ->
                      dynamic_update_slice -> complex multiply (2-3 HBM passes).
  rc_smooth         : batched K-tap RC FIR over the pilot axis in VMEM (the
                      reference's per-layer python conv loop, ce_rule_baseline.py:
                      661-676, as one vectorized stencil).
  inpaint_stack     : the CNN denoiser's partial-conv iteration stack (ce_dl_cnn.py:
                      473-508) run entirely in VMEM — the "jitted Pallas conv stack"
                      tier for moderate iteration counts (deep counts use the exact
                      linear-operator matmul, see ops/dsp.inpaint_operator).

All kernels operate on ri-layout real arrays (complex never crosses a kernel
boundary) and run in interpret mode on CPU for tests.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    import jax

    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# fused interp + broadcast + rotate + write
# ---------------------------------------------------------------------------


def _fill_rotate_kernel(h_ref, w_ref, rot_ref, out_ref, *, n_sym: int, n_layers: int):
    """One (batch, sc-tile) program.

    h_ref:   (2, n_layers, n_re)      pilot-position estimates (ri)
    w_ref:   (n_re, TILE_SC)          interpolation operator tile
    rot_ref: (2, n_sym)               per-symbol CFO rotation (ri)
    out_ref: (2, TILE_SC, n_sym, n_layers)
    """
    hr = h_ref[0, 0]  # (nL, n_re)
    hi = h_ref[0, 1]
    w = w_ref[:]  # (n_re, T)
    # Precision.HIGHEST keeps the MXU in multi-pass f32 mode — default bf16 passes
    # cost ~1e-2 relative error, far outside the estimator's conformance bounds.
    fr = jnp.dot(hr, w, preferred_element_type=hr.dtype, precision=jax.lax.Precision.HIGHEST)
    fi = jnp.dot(hi, w, preferred_element_type=hr.dtype, precision=jax.lax.Precision.HIGHEST)
    rr = rot_ref[0, 0]  # (n_sym,)
    ri = rot_ref[0, 1]
    # out[s, t, y, l] = full[l, t] * rot[y]  (complex multiply), laid out ri-first
    fr_t = fr.T  # (T, nL)
    fi_t = fi.T
    out_re = fr_t[:, None, :] * rr[None, :, None] - fi_t[:, None, :] * ri[None, :, None]
    out_im = fr_t[:, None, :] * ri[None, :, None] + fi_t[:, None, :] * rr[None, :, None]
    out_ref[0, 0] = out_re
    out_ref[0, 1] = out_im


def fused_fill_rotate(
    h_ri: jnp.ndarray,  # (B, 2, n_layers, n_re)
    w: jnp.ndarray,  # (n_re, n_sc)
    rot_ri: jnp.ndarray,  # (B, 2, n_sym)
    tile_sc: int = 256,
) -> jnp.ndarray:
    """(B, 2, n_sc, n_sym, n_layers) interpolated, symbol-broadcast, CFO-rotated
    channel block, written in a single pass."""
    B, _, nL, n_re = h_ri.shape
    n_sc = w.shape[1]
    n_sym = rot_ri.shape[2]
    tile_sc = min(tile_sc, n_sc)
    # pad n_sc to a tile multiple; caller slices back
    n_tiles = -(-n_sc // tile_sc)
    pad = n_tiles * tile_sc - n_sc
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))

    out = pl.pallas_call(
        functools.partial(_fill_rotate_kernel, n_sym=n_sym, n_layers=nL),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 2, nL, n_re), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_re, tile_sc), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n_sym), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, tile_sc, n_sym, nL), lambda b, t: (b, 0, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, n_tiles * tile_sc, n_sym, nL), h_ri.dtype),
        interpret=_interpret(),
    )(h_ri, w, rot_ri)
    return out[:, :, :n_sc]


def serve_fill_geometry(
    n_re: int,
    n_sc: int,
    n_alloc_syms: int,
    n_layers: int,
    n_lc: int,
    tile_sc: int = 512,
    block_b: int = 8,
    itemsize: int = 4,
) -> Tuple[int, int, int]:
    """Single source of truth for `fused_fill_rotate_serve`'s tiling and VMEM
    working set. Both the kernel (tile choice) and the estimator's eligibility
    predicate (`models/estimator._serve_pallas_deferred_ok`) call THIS function,
    so a kernel-side tile change can never silently desynchronize the gate
    (round-3 verdict item: the predicate used to mirror the math by hand).

    Returns (tile_sc, block_b, vmem_bytes):
      tile_sc     — the subcarrier tile the kernel will use: the full axis when
                    it fits, else capped and rounded down to a 128 multiple
                    (Mosaic lane-dim blocks must be 128-divisible or span the
                    full axis);
      block_b     — the batch-block UPPER BOUND (the kernel only ever shrinks
                    it, halving until it divides the runtime batch, which
                    shrinks the working set too — budgeting at this bound is
                    conservative for every batch);
      vmem_bytes  — the double-buffered per-program working set: the operator
                    tile (1, n_re, tile_sc) + the staged h
                    (block_b, 2, n_layers, n_re), rot (block_b, 2, n_alloc) and
                    output (block_b, 2, n_lc, n_alloc, tile_sc) blocks, all x2
                    for the Pallas pipeline's double buffering.
    """
    tile = min(tile_sc, n_sc)
    if tile < n_sc:
        tile = max(128, (tile // 128) * 128)
    w_bytes = n_re * tile * itemsize
    out_bytes = block_b * 2 * n_lc * n_alloc_syms * tile * itemsize
    h_bytes = block_b * 2 * n_layers * n_re * itemsize
    rot_bytes = block_b * 2 * n_alloc_syms * itemsize
    vmem = 2 * (w_bytes + out_bytes + h_bytes + rot_bytes)
    return tile, block_b, vmem


def _dot_f32x3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3-pass bf16 emulation of f32 matmul at XLA's Precision.HIGH (Mosaic only
    lowers DEFAULT/HIGHEST dots; HIGHEST costs 6 passes): split both operands
    into bf16 hi+lo and sum hi@hi + hi@lo + lo@hi in f32."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(a.dtype)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(b.dtype)).astype(jnp.bfloat16)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=a.dtype)
    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def _fill_rotate_serve_kernel(
    h_ref, w_ref, rot_ref, out_ref, *, n_sym: int, layer_slices, block_b: int, precision
):
    """One (sc-tile, batch-block) program, SERVE layout (subcarrier-last).

    h_ref:   (block_b, 2, n_layers, n_re)   pilot-position estimates (ri)
    w_ref:   (n_cdm, n_re, TILE_SC)         per-CDM-group interp operator tiles
    rot_ref: (block_b, 2, n_sym)            per-symbol CFO rotation (ri)
    out_ref: (block_b, 2, n_layers, n_sym, TILE_SC) — minor axis is the long
             frequency axis, so every write fills full 128-lane tiles (the whole
             point of the serve layout; cf. _fill_rotate_kernel where the
             n_layers<=4 minor axis starves the lanes).

    All CDM groups of a hop are written by the SAME program (layer_slices is the
    static (l0, l1) per group), so the hop's grid block leaves the kernel in one
    pass — no per-group concat afterwards. Each group's interp matmul stacks all
    block_b problems' layers into one (2*block_b*n_l_c, n_re) @ (n_re, TILE_SC)
    product so the MXU sees a tall M dim; the rotate is one batched broadcast-FMA
    pair over the whole block.
    """
    n_re = h_ref.shape[-1]
    rot = rot_ref[:]  # (block_b, 2, n_sym)
    rr = rot[:, 0][:, None, :, None]  # (block_b, 1, n_sym, 1)
    ri = rot[:, 1][:, None, :, None]
    for c, (l0, l1) in enumerate(layer_slices):
        n_lc = l1 - l0
        # (block_b, 2, n_lc, n_re) -> (block_b*2*n_lc, n_re): one MXU pass
        h_c = h_ref[:, :, l0:l1].reshape(block_b * 2 * n_lc, n_re)
        w = w_ref[c]  # (n_re, T)
        if precision == "f32x3":
            f = _dot_f32x3(h_c, w)
        else:
            f = jnp.dot(h_c, w, preferred_element_type=h_c.dtype, precision=precision)
        f = f.reshape(block_b, 2, n_lc, 1, w.shape[-1])
        fr = f[:, 0]  # (block_b, n_lc, 1, T)
        fi = f[:, 1]
        # out[b, l, y, t] = full[b, l, t] * rot[b, y] (complex multiply), freq minor
        out_ref[:, 0, l0:l1] = fr * rr - fi * ri
        out_ref[:, 1, l0:l1] = fr * ri + fi * rr


def _fill_rotate_serve_kernel3(
    h_ref, w_ref, rot_ref, out_ref, *, block_b: int, n_lc: int, precision
):
    """3-D-grid variant: one (cdm-group, sc-tile, batch-block) program writing
    its group's FULL (block_b, 2, n_lc, n_sym, TILE_SC) block — no sliced
    STORES (measured ~2.5x slower than full-block stores). The caller reshapes
    h to (B, 2, n_cdm, n_lc, n_re) so the CDM group is a leading BlockSpec axis
    the index map selects — the round-2 in-kernel `pl.ds(c * n_lc, n_lc)` read
    on the sublane-adjacent layer axis failed Mosaic alignment on real TPUs
    ("cannot statically prove that index in dimension 2 is a multiple of 4",
    BENCH_r02.json) because a dynamic sublane offset of 2 in an nL=4 axis is
    unprovable; blocking the group axis makes every in-kernel access static.

    h_ref: (block_b, 2, 1, n_lc, n_re); w_ref: (1, n_re, TILE_SC);
    rot_ref: (block_b, 2, n_sym); out_ref: (block_b, 2, n_lc, n_sym, TILE_SC).
    """
    h_c = h_ref[:, :, 0].reshape(block_b * 2 * n_lc, h_ref.shape[-1])
    w = w_ref[0]
    if precision == "f32x3":
        f = _dot_f32x3(h_c, w)
    else:
        f = jnp.dot(h_c, w, preferred_element_type=h_c.dtype, precision=precision)
    f = f.reshape(block_b, 2, n_lc, 1, w.shape[-1])
    fr = f[:, 0]
    fi = f[:, 1]
    rot = rot_ref[:]
    rr = rot[:, 0][:, None, :, None]
    ri = rot[:, 1][:, None, :, None]
    out_ref[:, 0] = fr * rr - fi * ri
    out_ref[:, 1] = fr * ri + fi * rr


def fused_fill_rotate_serve(
    h_ri: jnp.ndarray,  # (B, 2, n_layers, n_re)
    w: jnp.ndarray,  # (n_re, n_sc) or (n_cdm, n_re, n_sc)
    rot_ri: jnp.ndarray,  # (B, 2, n_sym)
    tile_sc: int = 512,
    block_b: int = 8,
    precision=jax.lax.Precision.HIGHEST,
    layer_slices=None,  # static ((l0, l1), ...) per CDM group; default one group
) -> jnp.ndarray:
    """(B, 2, n_layers, n_sym, n_sc) interpolated, symbol-broadcast, CFO-rotated
    channel block in serve layout, written in a single pass.

    Grid order is (sc_tile, batch) with the BATCH INNERMOST: the operator tile's
    block index is then constant across consecutive programs, so Pallas fetches
    each (n_re, tile_sc) tile once per sc-tile instead of once per problem (the
    round-1 (batch, tile) order re-fetched the operator per problem — ~400 MB of
    redundant HBM traffic per batch-128 at 106 PRB, which is why the XLA tier won
    then). block_b problems share one program so the interp matmul's M dim is
    2*block_b*n_l_c rows (MXU-efficient) and per-program overhead amortizes."""
    B, _, nL, n_re = h_ri.shape
    if precision == jax.lax.Precision.HIGH or precision == "high":
        # Mosaic has no HIGH dot; use the equivalent 3-pass bf16 split on TPU
        # f32 (interpret mode / f64 conformance runs fall back to exact HIGHEST).
        precision = (
            "f32x3"
            if (not _interpret() and h_ri.dtype == jnp.float32)
            else jax.lax.Precision.HIGHEST
        )
    if w.ndim == 2:
        w = w[None]
    if layer_slices is None:
        layer_slices = ((0, nL),)
    assert len(layer_slices) == w.shape[0] and layer_slices[-1][1] == nL
    n_sc = w.shape[-1]
    n_sym = rot_ri.shape[2]
    # tile choice lives in serve_fill_geometry (shared with the eligibility
    # predicate — see its docstring)
    tile_sc, _, _ = serve_fill_geometry(
        n_re, n_sc, n_sym, nL, nL, tile_sc=tile_sc, block_b=block_b
    )
    n_tiles = -(-n_sc // tile_sc)
    pad = n_tiles * tile_sc - n_sc
    if pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad)))
    while B % block_b:
        block_b //= 2
    n_blocks = B // block_b
    n_cdm = w.shape[0]

    n_lc = nL // n_cdm
    if tuple(layer_slices) == tuple((c * n_lc, (c + 1) * n_lc) for c in range(n_cdm)):
        # Equal-size contiguous groups: CDM group as a grid dim, every store a
        # full block (the common nL in {1, 2, 4} case). h is reshaped so the
        # group is a blockable leading axis (see _fill_rotate_serve_kernel3).
        h_g = h_ri.reshape(B, 2, n_cdm, n_lc, n_re)
        out = pl.pallas_call(
            functools.partial(
                _fill_rotate_serve_kernel3, block_b=block_b, n_lc=n_lc, precision=precision
            ),
            grid=(n_cdm, n_tiles, n_blocks),
            in_specs=[
                pl.BlockSpec(
                    (block_b, 2, 1, n_lc, n_re),
                    lambda c, t, b: (b, 0, c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_re, tile_sc), lambda c, t, b: (c, 0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block_b, 2, n_sym), lambda c, t, b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (block_b, 2, n_lc, n_sym, tile_sc),
                lambda c, t, b: (b, 0, c, 0, t),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, 2, nL, n_sym, n_tiles * tile_sc), h_ri.dtype),
            interpret=_interpret(),
        )(h_g, w, rot_ri)
        return out[..., :n_sc]

    out = pl.pallas_call(
        functools.partial(
            _fill_rotate_serve_kernel,
            n_sym=n_sym,
            layer_slices=tuple((int(a), int(b)) for a, b in layer_slices),
            block_b=block_b,
            precision=precision,
        ),
        grid=(n_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (block_b, 2, nL, n_re), lambda t, b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_cdm, n_re, tile_sc), lambda t, b: (0, 0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block_b, 2, n_sym), lambda t, b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, 2, nL, n_sym, tile_sc),
            lambda t, b: (b, 0, 0, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, nL, n_sym, n_tiles * tile_sc), h_ri.dtype),
        interpret=_interpret(),
    )(h_ri, w, rot_ri)
    return out[..., :n_sc]


# ---------------------------------------------------------------------------
# fused estimator FRONT: LS de-spread -> CFO -> time-avg -> fused smoothing
# (pair-average + virtual pilots + RC matrices) -> TA -> noise/RSRP/EPRE,
# one VMEM-resident pass per problem block
# ---------------------------------------------------------------------------
#
# Round 3 declared this fusion "blocked outright: Mosaic lacks atan2, argmax,
# cumsum" (ARCHITECTURE.md). All three have standard in-kernel emulations
# (ops/pallas/mathx): polynomial atan2 with quadrant fix-up, max + iota-select
# argmax, log-doubling unwrap cumsum. This kernel is the measurement that
# replaces the assertion: the whole per-hop front (everything between the
# pilot-RE gather and the grid fill — in XLA ~60 small fused VPU kernels) runs
# as ONE Pallas program per batch block, with the smoothing/TA matmuls on the
# MXU and every intermediate VMEM-resident.


# default batch block of the fused front: the measured v5e sweep was
# block_b 2 / 4 / 8 / 16 -> 0.352 / 0.231 / 0.201 / 0.150 ms per batch-128 at
# the c2 geometry (per-program constant refetch amortizes with block size);
# 16 fits VMEM because the constants are small (n_pils is the RC half-span,
# single digits — not n_re/2)
FRONT_BLOCK_B = 16

# Per-program working-set budget for `fused_front` (half the ~16 MB scoped-VMEM
# limit, same margin rule as the LDPC layout model). `fused_front` halves its
# batch block until `front_vmem_bytes` fits this budget, and the eligibility
# gate (models/estimator._front_pallas_ok) tests the SAME budget at the
# smallest block the kernel can shrink to — one constant, no predicate/kernel
# desync (ADVICE r04: the gate used to model block_b=4 while the kernel ran 16).
FRONT_VMEM_BUDGET = 8 * 1024 * 1024


def _front_kernel(
    rx_ref,      # (block_b, 2, n_cdm, n_dsym, n_re)
    pil_ref,     # (block_b, 2, nL, n_dsym, n_re)
    beta_ref,    # (1, block_b, 1) — batch pre-tiled to a leading grid axis so
                 # the block's LAST TWO dims equal the array dims, and the
                 # per-problem scalar stays SUBLANE-resident ((block_b, 1)):
                 # Mosaic cannot shape-cast a lane vector onto sublanes, so
                 # every per-problem scalar in this kernel lives as a
                 # (block_b, 1) column and broadcasts via the same
                 # slice+unit-insert pattern the serve-fill kernel uses
    pair_l_ref,  # (n_re, n_pils)
    pair_rf_ref, # (n_re, n_pils)  pair_r with flipped output columns
    vp_ref,      # (n_pils, n_pils) transposed fit matrix (or (1,1) dummy)
    sm_ref,      # (n_re, n_re)
    svb_ref,     # (n_pils, n_re)
    svef_ref,    # (n_pils, n_re)  smooth_ve with flipped input rows
    ta_c_ref,    # (k_ta, 2*half_cp)
    ta_s_ref,    # (k_ta, 2*half_cp)
    h_out_ref,   # (block_b, 2, nL, n_re) smoothed profiles
    sc_out_ref,  # (1, block_b, 8) scalar columns [cfo, ta, noise, rsrp, epre, 0, 0, 0]
    *,
    block_b: int,
    n_cdm: int,
    nL: int,
    n_dsym: int,
    n_pils: int,
    sst_d,        # tuple of n_dsym floats (symbol start times) or None
    n_samples: float,
    half_cp_len: int,
    fft_size: int,
    scs_hz: float,
    cfo_possible: bool,
    cfo_compensate: bool,
    k_ta: int,
    precision: str,
):
    from . import mathx

    n_re = rx_ref.shape[-1]
    dt = rx_ref.dtype
    if precision == "f32x3":
        dot = _dot_f32x3
    else:
        dot = lambda a, b: jnp.dot(
            a, b, preferred_element_type=dt, precision=jax.lax.Precision.HIGHEST
        )

    # MERGED (row, n_re) working layout: all heavy elementwise tensors carry
    # their (layer/cdm, dmrs-symbol) pair as ONE sublane axis of nL*n_dsym
    # (or n_cdm*n_dsym) rows. With the 4-D (.., nL, n_dsym, n_re) layout the
    # tiled dims are (n_dsym=2..4, n_re) and every VPU op runs at 25-50%
    # sublane occupancy; merged, the same op measured 1.7x faster on v5e
    # (66 -> 39 us/pass at (4,4,636) vs (16,636)). Row r = l*n_dsym + d;
    # per-(l) blocks are contiguous sublane slices, per-(d) selections are
    # single-row slices + concat, and per-row scalar coefficients are concats
    # of (block_b, 1) columns — all layout-friendly ops.
    nd = n_dsym
    rx_r = rx_ref[:, 0].reshape(block_b, n_cdm * nd, n_re)
    rx_i = rx_ref[:, 1].reshape(block_b, n_cdm * nd, n_re)
    pil_r = pil_ref[:, 0].reshape(block_b, nL * nd, n_re)
    pil_i = pil_ref[:, 1].reshape(block_b, nL * nd, n_re)
    beta2 = beta_ref[0]  # (block_b, 1), sublane-resident
    b3 = beta2[:, :, None]  # (block_b, 1, 1)

    def lane_sum(x):  # (..., n) -> (..., 1)
        return jnp.sum(x, axis=-1, keepdims=True)

    def rowsel(x, d):  # fixed-d rows of the (l, d) frame -> (block_b, nL, n_re)
        return jnp.concatenate(
            [x[:, l * nd + d : l * nd + d + 1] for l in range(nL)], axis=1
        )

    def percol(cols):  # per-(l, d) scalar columns -> (block_b, nL*nd, 1)
        return jnp.concatenate(
            [cols[d] for _l in range(nL) for d in range(nd)], axis=1
        )[:, :, None]

    epre = lane_sum(jnp.sum(rx_r * rx_r + rx_i * rx_i, axis=1))  # (block_b, 1)

    # layer-expanded received REs (cdm_of_layer = l // 2; contiguous slices)
    cdm_of_layer = [min(l // 2, n_cdm - 1) for l in range(nL)]
    rxl_r = jnp.concatenate(
        [rx_r[:, c * nd : (c + 1) * nd] for c in cdm_of_layer], axis=1
    )
    rxl_i = jnp.concatenate(
        [rx_i[:, c * nd : (c + 1) * nd] for c in cdm_of_layer], axis=1
    )
    # LS de-spread: rec = rx * conj(pil)
    rec_r = rxl_r * pil_r + rxl_i * pil_i  # (block_b, nL*nd, n_re)
    rec_i = rxl_i * pil_r - rxl_r * pil_i

    cfo = jnp.zeros((block_b, 1), dt)
    if cfo_possible:
        a_r, a_i = rowsel(rec_r, 0), rowsel(rec_i, 0)  # (block_b, nL, n_re)
        e_r, e_i = rowsel(rec_r, 1), rowsel(rec_i, 1)
        in_r = jnp.sum(a_r * e_r + a_i * e_i, axis=-1)  # conj(rec0) * rec1
        in_i = jnp.sum(a_r * e_i - a_i * e_r, axis=-1)  # (block_b, nL)
        acc = jnp.zeros((block_b, 1), dt)
        for c in range(n_cdm):
            pr = in_r[:, 2 * c : 2 * c + 1]  # (block_b, 1)
            pi = in_i[:, 2 * c : 2 * c + 1]
            if 2 * c + 1 < nL:
                pr = pr + in_r[:, 2 * c + 1 : 2 * c + 2]
                pi = pi + in_i[:, 2 * c + 1 : 2 * c + 2]
            acc = acc + mathx.atan2(pi, pr)
        cfo = acc / (2.0 * np.pi * n_samples) / n_cdm
        if cfo_compensate:
            # per-DM-RS-symbol phases from STATIC scalars (kernels cannot
            # capture array constants); cos/sin evaluated once per d on
            # (block_b, 1) columns, then laid out per (l, d) row
            pc = [jnp.cos((-2.0 * np.pi * float(s)) * cfo) for s in sst_d]
            ps = [jnp.sin((-2.0 * np.pi * float(s)) * cfo) for s in sst_d]
            crm = percol(pc)  # (block_b, nL*nd, 1)
            cim = percol(ps)
            rec_r, rec_i = rec_r * crm - rec_i * cim, rec_r * cim + rec_i * crm

    # time average (ce_rule_baseline.py:625): per-l contiguous row blocks
    hp_r = jnp.concatenate(
        [
            jnp.sum(rec_r[:, l * nd : (l + 1) * nd], axis=1, keepdims=True)
            for l in range(nL)
        ],
        axis=1,
    ) / b3 / nd  # (block_b, nL, n_re)
    hp_i = jnp.concatenate(
        [
            jnp.sum(rec_i[:, l * nd : (l + 1) * nd], axis=1, keepdims=True)
            for l in range(nL)
        ],
        axis=1,
    ) / b3 / nd

    # fused smoothing: pair-average + virtual pilots + RC conv as matrices.
    # Rows packed (block_b, [re rows | im rows]) -> (block_b*2*nL, n_re): the
    # matrices are real, so re/im ride the same MXU pass.
    H = jnp.concatenate([hp_r, hp_i], axis=1).reshape(block_b * 2 * nL, n_re)
    e_l = dot(H, pair_l_ref[...])    # (rows, n_pils) == h_avg[:, :n_pils]
    e_rf = dot(H, pair_rf_ref[...])  # right-edge tail, already flipped

    def virtual(e):
        if n_pils == 1:
            return e  # n==1 fit degenerates to constant extrapolation
        er = e.reshape(block_b, 2, nL, n_pils)
        vr, vi = er[:, 0], er[:, 1]  # (block_b, nL, n_pils)
        amp = jnp.sqrt(vr * vr + vi * vi)
        ph = mathx.unwrap_last(mathx.atan2(vi, vr))
        M = vp_ref[...]
        v_amp = dot(amp.reshape(block_b * nL, n_pils), M)
        v_ph = dot(ph.reshape(block_b * nL, n_pils), M)
        vb_r = v_amp * jnp.cos(v_ph)
        vb_i = v_amp * jnp.sin(v_ph)
        return jnp.concatenate(
            [
                vb_r.reshape(block_b, 1, nL, n_pils),
                vb_i.reshape(block_b, 1, nL, n_pils),
            ],
            axis=1,
        ).reshape(block_b * 2 * nL, n_pils)

    vb = virtual(e_l)
    vef = virtual(e_rf)
    Hs = dot(H, sm_ref[...]) + dot(vb, svb_ref[...]) + dot(vef, svef_ref[...])
    hs4 = Hs.reshape(block_b, 2, nL, n_re)
    h_out_ref[...] = hs4
    hs_r = hs4[:, 0]  # (block_b, nL, n_re)
    hs_i = hs4[:, 1]

    # time alignment: direct DFT of the LAST CDM group's RE lattice -> PDP ->
    # first-max argmax over the +-half-CP window (ce_rule_baseline.py:684-710)
    Hk = jnp.concatenate(
        [hs_r[:, :, :k_ta], hs_i[:, :, :k_ta]], axis=1
    ).reshape(block_b * 2 * nL, k_ta)
    C = ta_c_ref[...]
    S = ta_s_ref[...]
    tc = dot(Hk, C).reshape(block_b, 2, nL, 2 * half_cp_len)
    ts = dot(Hk, S).reshape(block_b, 2, nL, 2 * half_cp_len)
    re = tc[:, 0] - ts[:, 1]  # hr@C - hi@S
    im = ts[:, 0] + tc[:, 1]  # hr@S + hi@C
    pdp = jnp.sum(re * re + im * im, axis=1)  # (block_b, 2*half_cp)
    head = pdp[:, :half_cp_len]
    tail = pdp[:, half_cp_len:]
    i_d = mathx.argmax_last(head, keepdims=True)  # (block_b, 1)
    i_a = mathx.argmax_last(tail, keepdims=True)
    hm = jnp.max(head, axis=-1, keepdims=True)
    tm = jnp.max(tail, axis=-1, keepdims=True)
    i_max = jnp.where(
        hm >= tm, i_d.astype(dt), -(half_cp_len - i_a).astype(dt)
    )
    ta = i_max / float(fft_size) / float(scs_hz)  # (block_b, 1)

    # reconstruct expected RX pilots; noise / RSRP (ce_rule_baseline.py:713-746)
    # — merged (l, d)-row layout throughout (see the layout note above)
    if cfo_possible and cfo_compensate:
        p2c = [jnp.cos((2.0 * np.pi * float(s)) * cfo) for s in sst_d]
        p2s = [jnp.sin((2.0 * np.pi * float(s)) * cfo) for s in sst_d]
        c2m = percol(p2c)  # (block_b, nL*nd, 1)
        s2m = percol(p2s)
    else:
        c2m = jnp.ones((block_b, 1, 1), dt)
        s2m = jnp.zeros((block_b, 1, 1), dt)
    # h_s rows broadcast over the d positions of each layer's row block
    hsr_m = jnp.concatenate(
        [jnp.broadcast_to(hs_r[:, l : l + 1], (block_b, nd, n_re)) for l in range(nL)],
        axis=1,
    )
    hsi_m = jnp.concatenate(
        [jnp.broadcast_to(hs_i[:, l : l + 1], (block_b, nd, n_re)) for l in range(nL)],
        axis=1,
    )
    hph_r = hsr_m * c2m - hsi_m * s2m  # (block_b, nL*nd, n_re)
    hph_i = hsr_m * s2m + hsi_m * c2m
    con_r = b3 * (pil_r * hph_r - pil_i * hph_i)
    con_i = b3 * (pil_r * hph_i + pil_i * hph_r)
    noise_l = jnp.zeros((block_b, n_re), dt)
    for c in range(n_cdm):
        l0, l1 = 2 * c, min(2 * c + 2, nL)
        # sum the group's layers at matching d: contiguous nd-row blocks
        est_r = con_r[:, l0 * nd : (l0 + 1) * nd]
        est_i = con_i[:, l0 * nd : (l0 + 1) * nd]
        for l in range(l0 + 1, l1):
            est_r = est_r + con_r[:, l * nd : (l + 1) * nd]
            est_i = est_i + con_i[:, l * nd : (l + 1) * nd]
        d_r = rx_r[:, c * nd : (c + 1) * nd] - est_r  # (block_b, nd, n_re)
        d_i = rx_i[:, c * nd : (c + 1) * nd] - est_i
        noise_l = noise_l + jnp.sum(d_r * d_r + d_i * d_i, axis=1)
    noise = lane_sum(noise_l)  # (block_b, 1)
    rsrp = (
        (beta2 * beta2)
        * lane_sum(jnp.sum(hs_r * hs_r + hs_i * hs_i, axis=1))
        * n_dsym
    )

    zero3 = jnp.zeros((block_b, 3), dt)
    sc_out_ref[0] = jnp.concatenate(
        [cfo, ta, noise, rsrp, epre, zero3], axis=1
    )


def front_vmem_bytes(
    n_re: int, n_pils: int, half_cp_len: int, k_ta: int, n_cdm: int, nL: int,
    n_dsym: int, block_b: int = FRONT_BLOCK_B, itemsize: int = 4,
) -> int:
    """Rough per-program working set of `fused_front` (constants + streamed
    blocks + the dominant intermediates; Mosaic's actual stack allocation runs
    ~2x naive models — see the LDPC layout model — so callers budget half the
    16 MB VMEM)."""
    consts = (
        2 * n_re * n_pils          # pair mats
        + n_pils * n_pils          # vp fit
        + n_re * n_re              # smooth
        + 2 * n_pils * n_re        # smooth_vb / _ve
        + 2 * k_ta * 2 * half_cp_len  # TA DFT
    )
    per_block = block_b * (
        2 * n_cdm * n_dsym * n_re      # rx
        + 2 * nL * n_dsym * n_re       # pil
        + 6 * nL * n_dsym * n_re       # rec / rotated / contrib intermediates
        + 4 * nL * n_re                # h_p, h_s
        + 2 * nL * n_re                # smoothing row blocks
    )
    return (consts + 2 * per_block) * itemsize


def fused_front(
    rx_ri: jnp.ndarray,   # (B, 2, n_cdm, n_dsym, n_re)
    pil_ri: jnp.ndarray,  # (B, 2, nL, n_dsym, n_re)
    beta: jnp.ndarray,    # (B,)
    mats: dict,           # plan matrices, see _front_kernel's refs
    *,
    sst_d,
    n_samples: float,
    half_cp_len: int,
    fft_size: int,
    scs_hz: float,
    cfo_possible: bool,
    cfo_compensate: bool,
    block_b: int = None,
    precision=jax.lax.Precision.HIGHEST,
):
    """One fused Pallas pass over the estimator front for a batch of problems.

    Returns (h_s_ri (B, 2, nL, n_re), scalars (B, 8)) where scalars columns are
    [cfo_hop, ta_inc, noise_inc, rsrp_inc, epre_inc, 0, 0, 0] — the same
    per-hop increments `models/estimator._process_hop` produces; the caller
    does the cross-hop combine/normalization (exact reference bookkeeping).
    """
    if block_b is None:
        block_b = FRONT_BLOCK_B
    B, _, n_cdm, n_dsym, n_re = rx_ri.shape
    nL = pil_ri.shape[2]
    n_pils = mats["pair_l"].shape[1]
    k_ta = mats["ta_c"].shape[0]
    half_cp = mats["ta_c"].shape[1] // 2
    assert half_cp == half_cp_len
    while B % block_b:
        block_b //= 2
    # shrink for VMEM too, against the same budget the eligibility gate tests
    # (ADVICE r04: gate modeled block 4 while the kernel ran 16 — a wide
    # geometry could pass the gate yet blow the Mosaic compile at runtime).
    # The floor is 2, NOT 1: block_b == 1 does not lower (Mosaic rejects the
    # 1-sublane lane_sum reduction, "unsupported output implicit dimension" —
    # hit on chip by unbatched builds), so shrinking to 1 would just bounce
    # back to 2 and re-enter the over-budget configuration the loop rejected;
    # the gate (_front_pallas_ok) therefore tests block_b=2 as well.
    while block_b > 2 and front_vmem_bytes(
        n_re, n_pils, half_cp_len, k_ta, n_cdm, nL, n_dsym, block_b=block_b
    ) > FRONT_VMEM_BUDGET:
        block_b //= 2
    # odd/unbatched B forced block 1 through the divisibility loop: pad the
    # batch to a multiple of 2 instead of ever running a 1-sublane block
    pad_b = 0
    if block_b == 1:
        block_b = 2
        pad_b = (-B) % 2
        if pad_b:
            rx_ri = jnp.concatenate([rx_ri, rx_ri[-1:]], axis=0)
            pil_ri = jnp.concatenate([pil_ri, pil_ri[-1:]], axis=0)
            beta = jnp.concatenate([beta, beta[-1:]], axis=0)
            B += pad_b
    n_blocks = B // block_b
    dt = rx_ri.dtype
    # Mosaic lowers only DEFAULT/HIGHEST dots; HIGH runs as the 3-pass bf16
    # split on TPU f32 (interpret/f64 fall back to exact HIGHEST), mirroring
    # fused_fill_rotate_serve's precision handling.
    if precision == jax.lax.Precision.HIGH or precision == "high":
        prec_k = "f32x3" if (not _interpret() and dt == jnp.float32) else "highest"
    else:
        prec_k = "highest"
    vp = mats["vp"] if mats["vp"] is not None else np.zeros((1, 1))
    const_in = [
        jnp.asarray(mats["pair_l"], dt),
        jnp.asarray(mats["pair_r_flipped"], dt),
        jnp.asarray(vp, dt),
        jnp.asarray(mats["smooth"], dt),
        jnp.asarray(mats["smooth_vb"], dt),
        jnp.asarray(mats["smooth_ve_flipped"], dt),
        jnp.asarray(mats["ta_c"], dt),
        jnp.asarray(mats["ta_s"], dt),
    ]
    cshapes = [c.shape for c in const_in]
    grid = (n_blocks,)
    h_out, sc_out = pl.pallas_call(
        functools.partial(
            _front_kernel,
            block_b=block_b,
            n_cdm=n_cdm,
            nL=nL,
            n_dsym=n_dsym,
            n_pils=n_pils,
            sst_d=tuple(float(s) for s in sst_d) if sst_d is not None else None,
            n_samples=float(n_samples),
            half_cp_len=half_cp_len,
            fft_size=fft_size,
            scs_hz=scs_hz,
            cfo_possible=cfo_possible,
            cfo_compensate=cfo_compensate,
            k_ta=k_ta,
            precision=prec_k,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, 2, n_cdm, n_dsym, n_re),
                lambda b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, 2, nL, n_dsym, n_re),
                lambda b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, block_b, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(s, (lambda b, _n=len(s): (0,) * _n), memory_space=pltpu.VMEM)
            for s in cshapes
        ],
        out_specs=(
            pl.BlockSpec(
                (block_b, 2, nL, n_re), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, block_b, 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 2, nL, n_re), dt),
            jax.ShapeDtypeStruct((n_blocks, block_b, 8), dt),
        ),
        interpret=_interpret(),
    )(rx_ri, pil_ri, beta.reshape(n_blocks, block_b, 1), *const_in)
    if pad_b:
        return h_out[: B - pad_b], sc_out.reshape(B, 8)[: B - pad_b]
    return h_out, sc_out.reshape(B, 8)


# ---------------------------------------------------------------------------
# batched RC smoothing FIR
# ---------------------------------------------------------------------------


def _rc_smooth_kernel(x_ref, out_ref, *, taps: Tuple[float, ...]):
    """x_ref: (2*nL, n_ext); out_ref: (2*nL, n_out) valid convolution."""
    K = len(taps)
    n_out = out_ref.shape[-1]
    x = x_ref[0]
    acc = taps[K - 1] * jax.lax.slice_in_dim(x, 0, n_out, axis=-1)
    for k in range(1, K):
        acc = acc + taps[K - 1 - k] * jax.lax.slice_in_dim(x, k, k + n_out, axis=-1)
    out_ref[0] = acc


def rc_smooth(x_ext_ri: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Valid K-tap convolution along the last axis.

    x_ext_ri: (B, C, n_ext) real (the caller stacks re/im and layers into C).
    Returns (B, C, n_ext - K + 1).
    """
    B, C, n_ext = x_ext_ri.shape
    K = int(np.asarray(taps).size)
    n_out = n_ext - K + 1
    out = pl.pallas_call(
        functools.partial(_rc_smooth_kernel, taps=tuple(float(t) for t in np.asarray(taps))),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, n_ext), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, n_out), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, n_out), x_ext_ri.dtype),
        interpret=_interpret(),
    )(x_ext_ri)
    return out


# ---------------------------------------------------------------------------
# CNN partial-conv inpainting stack
# ---------------------------------------------------------------------------


def _inpaint_kernel(x_ref, known_ref, trans_ref, out_ref, *, n_transient: int, steady: int):
    """x_ref/out_ref: (1, C, n) — C = 2*n_layers ri channels; whole chain in VMEM.

    known_ref: (1, n) 0/1 pinning mask; trans_ref: (n_transient, 2, n) per-iteration
    (validity mask, reciprocal denominator) pairs — Pallas kernels cannot capture
    array constants, so the static schedule rides in as inputs.

    Follows dsp.cnn_inpaint exactly: unrolled transient iterations, then `steady`
    fixed-point iterations, then a 2-pass low-pass, with known positions pinned.
    """
    eps = 1e-12
    n = x_ref.shape[-1]
    known_j = known_ref[0][None, :] > 0.5
    x0 = x_ref[0]
    x = x0

    def conv3(v):
        # reflect padding: v[:, 1], v, v[:, -2]
        left = v[:, 1:2]
        right = v[:, n - 2 : n - 1]
        vp = jnp.concatenate([left, v, right], axis=-1)
        return (
            0.25 * jax.lax.slice_in_dim(vp, 0, n, axis=-1)
            + 0.5 * jax.lax.slice_in_dim(vp, 1, n + 1, axis=-1)
            + 0.25 * jax.lax.slice_in_dim(vp, 2, n + 2, axis=-1)
        )

    for t in range(n_transient):
        m_j = trans_ref[t, 0][None, :]
        inv = trans_ref[t, 1][None, :]
        x = jnp.where(known_j, x0, conv3(x * m_j) * inv)
    if steady > 0:
        inv_c = jnp.asarray(1.0 / (1.0 + eps), dtype=x0.dtype)
        x = jax.lax.fori_loop(
            0, steady, lambda _, xc: jnp.where(known_j, x0, conv3(xc) * inv_c), x
        )
    # final low-pass, 2 passes, applied to unknowns only
    x_lp = conv3(conv3(x))
    out_ref[0] = jnp.where(known_j, x0, x_lp)


def inpaint_stack(
    x_ri: jnp.ndarray,  # (B, C, n) sparse ri values (zeros at unknown)
    known_mask: np.ndarray,
    n_iters: int,
    schedule=None,
) -> jnp.ndarray:
    """Pallas conv-stack inpainting; exact parity with dsp.cnn_inpaint."""
    from .. import dsp

    known = np.asarray(known_mask, dtype=bool).reshape(-1)
    if schedule is None:
        schedule = dsp.make_inpaint_schedule(known, n_iters)
    transient, steady = schedule
    B, C, n = x_ri.shape
    eps = 1e-12
    n_transient = len(transient)
    trans = np.stack(
        [np.stack([m, 1.0 / (d + eps)]) for m, d in transient]
    ).astype(x_ri.dtype) if n_transient else np.zeros((0, 2, n), x_ri.dtype)
    known_f = known.astype(x_ri.dtype)[None, :]
    out = pl.pallas_call(
        functools.partial(_inpaint_kernel, n_transient=n_transient, steady=int(steady)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_transient, 1), 2, n), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, n), x_ri.dtype),
        interpret=_interpret(),
    )(x_ri, jnp.asarray(known_f), jnp.asarray(trans if n_transient else np.zeros((1, 2, n), x_ri.dtype)))
    return out


# ---------------------------------------------------------------------------
# VMEM-resident QC-LDPC min-sum decoder
# ---------------------------------------------------------------------------


def _ldpc_kernel(
    llr_ref, out_ref, *, edges, rows, nb, z, n_iters, norm, z_axis, schedule, group=1
):
    """One batch-tile program: ALL `n_iters` flooding sweeps in VMEM.

    The XLA tier round-trips every message array through HBM once per
    iteration (~30 MB/iter at n=976 x batch 512 — measured HBM-bound within
    10% of the roofline); here the channel LLRs are read once, the c2v
    messages live as loop-carried VMEM values, and the posterior is written
    once. Two layouts, selected by z_axis:

      z_axis=0 ("sublane-z"): per-edge arrays (z, B_TILE=128) — batch on the
        lanes, Z on the sublanes, every QC shift a static sublane roll
        (slices + concat). The fast layout; live set scales with Z.
      z_axis=1 ("lane-z"): per-edge arrays (B_SUB, z) — Z on the lanes,
        a small batch tile on the sublanes. Rolls become lane-axis
        slices+concat (costlier), but the live set shrinks by
        128/B_SUB x, which is what lets NR-BG1-scale codes (Z=384,
        ~316 edges) stay VMEM-resident at all.

    llr_ref/out_ref: (1, nb, *tile) — the batch is pre-tiled into a leading
    grid axis so the minor dim equals the full block (smaller-than-128 lane
    blocks are rejected by the Mosaic lowering). `edges` is LdpcPlan.edges;
    `rows` maps check row -> tuple of edge ids (static, so every loop below
    unrolls; the two-min fold replicates jnp.argmin's first-minimum tie
    semantics elementwise, keeping the Pallas tier bit-identical to the XLA
    tier)."""
    ch = [llr_ref[0, j] for j in range(nb)]  # each (z, B) or (B_SUB, z)
    shape = ch[0].shape
    dtype = ch[0].dtype
    big = jnp.asarray(_LDPC_BIG, dtype)

    def roll(x, s):
        s = s % z
        if s == 0:
            return x
        if z_axis == 0:
            return jnp.concatenate([x[z - s :], x[: z - s]], axis=0)
        return jnp.concatenate([x[:, z - s :], x[:, : z - s]], axis=1)

    def row_update(v2c):
        """Row-extrinsic min-sum messages for one check row's v2c list —
        two-min fold with first-min index (== jnp.argmin tie semantics)."""
        mags = [jnp.abs(v) for v in v2c]
        negs = [v < 0 for v in v2c]
        m1 = mags[0]
        m2 = jnp.full(shape, big, dtype)
        i1 = jnp.zeros(shape, jnp.int32)
        par = negs[0]
        for t_, m in enumerate(mags[1:], start=1):
            less = m < m1
            m2 = jnp.where(less, m1, jnp.minimum(m2, m))
            i1 = jnp.where(less, t_, i1)
            m1 = jnp.where(less, m, m1)
            par = par ^ negs[t_]
        out = []
        for t_ in range(len(v2c)):
            ext_mag = jnp.where(i1 == t_, m2, m1)
            # extrinsic sign = total sign * own sign (xor of the bools)
            neg_ext = par ^ negs[t_]
            sgn = 1.0 - 2.0 * neg_ext.astype(dtype)
            out.append(norm * sgn * ext_mag)
        return out

    def sweep_flooding(_, c2v):
        acc = list(ch)
        for e, (i, t, j, s) in enumerate(edges):
            acc[j] = acc[j] + roll(c2v[e], s)
        new = [None] * len(edges)
        for i, eids in enumerate(rows):
            v2c = [roll(acc[edges[e][2]], -edges[e][3]) - c2v[e] for e in eids]
            upd = row_update(v2c)
            for t_, e in enumerate(eids):
                new[e] = upd[t_]
        return tuple(new)

    def sweep_layered(_, state):
        # Row-layered (serial) schedule: the posterior updates after every
        # GROUP of `group` check rows, so later groups in the same sweep see
        # fresher beliefs — ~2x faster convergence per sweep than flooding at
        # group=1 (the classic layered-decoding property). group>1 computes
        # the whole group's updates from one posterior snapshot before
        # applying them: it interpolates toward flooding, trading a little
        # convergence for G-way ILP — the round-3 verdict's row-group remedy
        # for the lane-z layout, where the strictly serial row chain
        # underutilizes the narrow batch tile.
        L, c2v = list(state[0]), list(state[1])
        for g0 in range(0, len(rows), group):
            chunk = range(g0, min(g0 + group, len(rows)))
            upds = {}
            for i in chunk:
                eids = rows[i]
                v2c = [roll(L[edges[e][2]], -edges[e][3]) - c2v[e] for e in eids]
                upds[i] = row_update(v2c)
            for i in chunk:
                for t_, e in enumerate(rows[i]):
                    j, s = edges[e][2], edges[e][3]
                    L[j] = L[j] + roll(upds[i][t_] - c2v[e], s)
                    c2v[e] = upds[i][t_]
        return tuple(L), tuple(c2v)

    c2v0 = tuple(jnp.zeros(shape, dtype) for _ in edges)
    if schedule == "layered":
        L, _ = jax.lax.fori_loop(
            0, n_iters, sweep_layered, (tuple(ch), c2v0), unroll=False
        )
        for j in range(nb):
            out_ref[0, j] = L[j]
    else:
        c2v = jax.lax.fori_loop(0, n_iters, sweep_flooding, c2v0, unroll=False)
        acc = list(ch)
        for e, (i, t, j, s) in enumerate(edges):
            acc[j] = acc[j] + roll(c2v[e], s)
        for j in range(nb):
            out_ref[0, j] = acc[j]


def _ldpc_stream_kernel(
    tbl_ref,  # SMEM int32 (5, mb_pad*d): [var_j | shift_plus | shift_minus | edge_id | valid]
    ch_ref,   # (1, nb, block_b, z_pad) channel LLR tile (lane-z layout)
    out_ref,  # (1, nb, block_b, z_pad) posterior — doubles as the live L workspace
    c2v_ref,  # VMEM scratch (n_edges + 1, block_b, z_pad); row n_edges = dummy for pads
    *,
    mb_pad: int,
    nb: int,
    d: int,
    z: int,
    z_pad: int,
    n_iters: int,
    norm: float,
    block_b: int,
    group: int,
):
    """Row-STREAMED layered min-sum: program size O(d), not O(edges).

    The static-unroll tiers (XLA rolls, the in-body Pallas edge sweep) blow
    past this environment's compile budget at NR-BG1 scale (316 edges x
    Z=384 -> >9 min); this kernel instead walks the check rows with a
    `fori_loop`, reading each slot's (variable block, shift, edge id) from a
    scalar-prefetched SMEM table and rotating with `pltpu.roll`'s DYNAMIC
    shift — so the program contains one d-slot row body regardless of code
    size, while the full c2v live set and the posterior stay VMEM-resident
    across all sweeps (the HBM-traffic property that makes the unrolled
    Pallas tier 3.7-7.7x over XLA on small codes).

    Lifting sizes that are NOT a whole number of 128-lane registers run on a
    z_pad = ceil(z/128)*128 lane axis (this Mosaic's dynamic lane rotation
    compiles only at whole-register lengths — the round-4 z%128 gate left
    most large NR Z values on the 3 Mb/s gather tier). `_roll_mod_z` builds
    the TRUE cyclic rotation over z from two padded-axis rotations + a lane
    select; pad lanes carry garbage that never contaminates a valid lane
    (every valid output lane reads only valid input lanes — proof in the
    helper), and the wrapper slices the posterior back to z.

    Schedule is row-layered with optional GROUPS of `group` rows (the
    lane-z ILP remedy — see _ldpc_kernel's sweep_layered): all rows in a
    group compute their min-sum updates from one posterior snapshot, then
    apply together. Mirrors ops/ldpc.decode_reference(schedule="layered",
    layered_group=group) exactly: same row order, same two-min/first-min tie
    semantics, same update association. The c2v scratch may be bfloat16
    (min-sum is scale-invariant; the live set halves, enabling a 2x batch
    tile) — L stays f32 and stays exactly consistent with the ROUNDED stored
    messages (delta uses the round-tripped value).
    NR rows never contain two edges to one variable block, so the
    read-modify-write of L per slot has no intra-row aliasing hazard."""
    dt = ch_ref.dtype
    cdt = c2v_ref.dtype
    big = jnp.asarray(_LDPC_BIG, dt)
    out_ref[...] = ch_ref[...]
    c2v_ref[...] = jnp.zeros(c2v_ref.shape, cdt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_b, z_pad), 1)

    def roll_mod_z(x, t):
        """y[i] = x[(i - t) mod z] on lanes [0, z), t traced in [0, z).
        Exact on the valid region: for i in [t, z) the plain rotation reads
        x[i - t] (valid); for i in [0, t) the z-offset rotation reads
        x[i - t + z] (in [z - t, z), valid). Pad output lanes are garbage."""
        if z == z_pad:
            return pltpu.roll(x, t, 1)
        a = pltpu.roll(x, t, 1)
        b = pltpu.roll(x, t + (z_pad - z), 1)
        return jnp.where(lane < t, b, a)

    def group_body(g, _):
        # pass 1: all `group` rows' extrinsic updates from ONE L snapshot
        upds = []      # per (gi, t): rounded stored message (cdt)
        deltas = []    # per (gi, t): upd_roundtrip - c2v_old, masked (dt)
        for gi in range(group):
            i = g * group + gi
            v2c = []
            c2v_old = []
            valid_f = []
            m1 = jnp.full((block_b, z_pad), big, dt)
            m2 = jnp.full((block_b, z_pad), big, dt)
            i1 = jnp.zeros((block_b, z_pad), jnp.int32)
            par = jnp.zeros((block_b, z_pad), jnp.bool_)
            for t in range(d):
                j = tbl_ref[0, i * d + t]
                s_m = tbl_ref[2, i * d + t]
                e = tbl_ref[3, i * d + t]
                vld = tbl_ref[4, i * d + t]
                vf = (vld > 0).astype(dt)
                L_j = out_ref[0, j]
                cv = c2v_ref[e].astype(dt)
                v = roll_mod_z(L_j, s_m) - cv  # roll by (z - s) == roll by -s
                v2c.append(v)
                c2v_old.append(cv)
                valid_f.append(vf)
                mag = jnp.where(vld > 0, jnp.abs(v), big)
                neg = (v < 0) & (vld > 0)
                less = mag < m1
                m2 = jnp.where(less, m1, jnp.minimum(m2, mag))
                i1 = jnp.where(less, t, i1)
                m1 = jnp.where(less, mag, m1)
                par = par ^ neg
            row_upd = []
            row_delta = []
            for t in range(d):
                ext_mag = jnp.where(i1 == t, m2, m1)
                neg_ext = par ^ (v2c[t] < 0)
                sgn = 1.0 - 2.0 * neg_ext.astype(dt)
                # invalid slots store 0, not norm*big: an all-pad row (group
                # padding) would otherwise write ±7.5e29 (inf in bf16) to the
                # dummy c2v row and poison later deltas with inf-inf = NaN
                upd = (norm * sgn * ext_mag * valid_f[t]).astype(cdt)
                row_upd.append(upd)
                row_delta.append(valid_f[t] * (upd.astype(dt) - c2v_old[t]))
            upds.append(row_upd)
            deltas.append(row_delta)
        # pass 2: apply the whole group's updates (snapshot semantics == the
        # float64 mirror's layered_group association)
        for gi in range(group):
            i = g * group + gi
            for t in range(d):
                j = tbl_ref[0, i * d + t]
                s_p = tbl_ref[1, i * d + t]
                e = tbl_ref[3, i * d + t]
                c2v_ref[e] = upds[gi][t]
                out_ref[0, j] = out_ref[0, j] + roll_mod_z(deltas[gi][t], s_p)
        return 0

    def iter_body(_, carry):
        return jax.lax.fori_loop(0, mb_pad // group, group_body, carry, unroll=False)

    jax.lax.fori_loop(0, n_iters, iter_body, 0, unroll=False)


def ldpc_stream_posterior(
    llr_vzb: jnp.ndarray,  # (nb, z, B) batch-last variable frame
    slot_var: np.ndarray,  # (mb, d) int32
    slot_shift: np.ndarray,
    slot_valid: np.ndarray,
    n_edges: int,
    z: int,
    n_iters: int,
    norm: float,
    block_b: int = 8,
    group: int = 1,
    c2v_dtype=None,
) -> jnp.ndarray:
    """Streamed layered posterior (see _ldpc_stream_kernel). Same frame
    contract as `ldpc_posterior`: B must be a multiple of block_b. Z is
    padded to whole 128-lane registers internally (any lifting size works);
    `group` rows update per posterior snapshot (layered_group semantics);
    `c2v_dtype` (default: the LLR dtype) may be jnp.bfloat16 to halve the
    VMEM-resident message set."""
    nb, zz, B = llr_vzb.shape
    mb, d = slot_var.shape
    assert zz == z and B % block_b == 0, (llr_vzb.shape, block_b)
    group = max(1, min(int(group), mb))
    mb_pad = -(-mb // group) * group
    z_pad = -(-z // 128) * 128
    # slot -> packed edge id (row-major over valid slots); pads -> dummy row
    eid = np.full((mb_pad, d), n_edges, np.int32)
    valid_p = np.zeros((mb_pad, d), bool)
    valid_p[:mb] = slot_valid
    eid[valid_p] = np.arange(n_edges, dtype=np.int32)
    var_p = np.zeros((mb_pad, d), np.int32)
    var_p[:mb] = np.asarray(slot_var, np.int32)
    shift_p = np.zeros((mb_pad, d), np.int32)
    shift_p[:mb] = np.asarray(slot_shift, np.int32) % z
    tbl = np.stack(
        [
            var_p.reshape(-1),
            shift_p.reshape(-1),
            (z - shift_p.reshape(-1)) % z,
            eid.reshape(-1),
            valid_p.reshape(-1).astype(np.int32),
        ]
    )
    n_tiles = B // block_b
    # lane-z tiling: (nb, z, B) -> (n_tiles, nb, block_b, z) [-> pad lanes]
    tiled = jnp.transpose(llr_vzb.reshape(nb, z, n_tiles, block_b), (2, 0, 3, 1))
    if z_pad != z:
        tiled = jnp.pad(tiled, ((0, 0), (0, 0), (0, 0), (0, z_pad - z)))
    cdt = llr_vzb.dtype if c2v_dtype is None else jnp.dtype(c2v_dtype)
    out = pl.pallas_call(
        functools.partial(
            _ldpc_stream_kernel,
            mb_pad=mb_pad,
            nb=nb,
            d=d,
            z=z,
            z_pad=z_pad,
            n_iters=int(n_iters),
            norm=float(norm),
            block_b=block_b,
            group=group,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, nb, block_b, z_pad), lambda b, tbl: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nb, block_b, z_pad), lambda b, tbl: (b, 0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((n_edges + 1, block_b, z_pad), cdt)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, nb, block_b, z_pad), llr_vzb.dtype),
        interpret=_interpret(),
    )(jnp.asarray(tbl), tiled)
    out = out[..., :z]
    return jnp.transpose(out, (1, 3, 0, 2)).reshape(nb, z, B)


_LDPC_BIG = 1e30


def ldpc_posterior(
    llr_vzb: jnp.ndarray,
    edges,
    nb: int,
    z: int,
    n_iters: int,
    norm: float,
    block_b: int = 128,
    z_axis: int = 0,
    schedule: str = "flooding",
    group: int = 1,
) -> jnp.ndarray:
    """Flooding normalized-min-sum posterior, all iterations VMEM-resident.

    llr_vzb: (nb, z, B) channel LLRs in the decoder's batch-last variable
    frame; B must be a multiple of `block_b` (the ops/ldpc wrapper pads).
    Returns the posterior in the same frame, bit-identical to the XLA tier
    (same edge order, same summation association, same tie semantics).

    z_axis selects the tile layout (see _ldpc_kernel): 0 = (z, 128) sublane-z
    (fast; live set scales with Z), 1 = (block_b, z) lane-z (batch tile on
    the sublanes — block_b is 8/16/32 here — which shrinks the live set so
    large-Z codes fit VMEM)."""
    n_vb, zz, B = llr_vzb.shape
    assert (n_vb, zz) == (nb, z) and B % block_b == 0, (llr_vzb.shape, block_b)
    mb = max(i for i, _, _, _ in edges) + 1
    rows = tuple(
        tuple(e for e, (i, _, _, _) in enumerate(edges) if i == r) for r in range(mb)
    )
    n_tiles = B // block_b
    # Pre-tile the batch into a leading grid axis: a block whose minor dims
    # equal the FULL array minor dims is always legal, whereas sub-128 lane
    # blocks are rejected by the Mosaic lowering.
    if z_axis == 0:
        tiled = jnp.moveaxis(llr_vzb.reshape(nb, z, n_tiles, block_b), 2, 0)
        tile = (1, nb, z, block_b)
    else:
        # (nb, z, B) -> (n_tiles, nb, block_b, z): batch on sublanes, z on lanes
        tiled = jnp.transpose(
            llr_vzb.reshape(nb, z, n_tiles, block_b), (2, 0, 3, 1)
        )
        tile = (1, nb, block_b, z)
    out = pl.pallas_call(
        functools.partial(
            _ldpc_kernel,
            edges=tuple(edges),
            rows=rows,
            nb=nb,
            z=z,
            n_iters=int(n_iters),
            norm=float(norm),
            z_axis=z_axis,
            schedule=schedule,
            group=group,
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(tile, lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(tile, lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles,) + tile[1:], llr_vzb.dtype),
        interpret=_interpret(),
    )(tiled)
    if z_axis == 0:
        return jnp.moveaxis(out, 0, 2).reshape(nb, z, B)
    return jnp.transpose(out, (1, 3, 0, 2)).reshape(nb, z, B)
