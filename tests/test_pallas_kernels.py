"""Pallas kernel parity tests (interpret mode on the CPU test platform).

Each kernel must match its XLA-tier equivalent exactly (same math, VMEM-fused);
SURVEY.md §5 prescribes interpret-mode Pallas tests as the kernel sanitizer.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srsran_ce_tpu.ops import dsp
from srsran_ce_tpu.ops.pallas import kernels


def test_fused_fill_rotate_matches_reference_math():
    rng = np.random.default_rng(0)
    B, nL, n_re, n_sc, n_sym = 3, 2, 48, 96, 14
    h = rng.standard_normal((B, nL, n_re)) + 1j * rng.standard_normal((B, nL, n_re))
    rot = np.exp(1j * rng.standard_normal((B, n_sym)))
    # simple interp operator: 2 nnz per column
    w = np.zeros((n_re, n_sc))
    for j in range(n_sc):
        a = min(j // 2, n_re - 1)
        b = min(a + 1, n_re - 1)
        al = (j / 2) - a
        w[a, j] += 1 - al
        w[b, j] += al

    h_ri = np.stack([h.real, h.imag], axis=1)  # (B, 2, nL, n_re)
    rot_ri = np.stack([rot.real, rot.imag], axis=1)  # (B, 2, n_sym)
    out = np.asarray(kernels.fused_fill_rotate(jnp.asarray(h_ri), jnp.asarray(w), jnp.asarray(rot_ri), tile_sc=32))
    got = out[:, 0] + 1j * out[:, 1]  # (B, n_sc, n_sym, nL)

    full = np.einsum("blr,rs->bls", h, w)  # (B, nL, n_sc)
    want = np.transpose(full, (0, 2, 1))[:, :, None, :] * rot[:, None, :, None]
    np.testing.assert_allclose(got, np.transpose(want, (0, 1, 2, 3)), atol=1e-10)


def test_rc_smooth_matches_conv_valid():
    rng = np.random.default_rng(1)
    B, C, n_ext, K = 4, 6, 80, 15
    taps = rng.standard_normal(K)
    x = rng.standard_normal((B, C, n_ext))
    got = np.asarray(kernels.rc_smooth(jnp.asarray(x), taps))
    want = np.asarray(dsp.conv_valid(jnp.asarray(x), taps))
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("n,comb", [(48, 2), (96, 4)])
def test_inpaint_stack_matches_dsp(n, comb):
    rng = np.random.default_rng(n)
    known = np.zeros(n, dtype=bool)
    known[::comb] = True
    n_iters = max(6, n // 8)
    B, nL = 2, 2
    vals = rng.standard_normal((B, nL, n)) + 1j * rng.standard_normal((B, nL, n))
    sparse = np.where(known[None, None, :], vals, 0.0)

    # XLA tier
    want = np.asarray(dsp.cnn_inpaint(jnp.asarray(sparse), known, n_iters))

    # Pallas tier on ri channels
    x_ri = np.concatenate([sparse.real, sparse.imag], axis=1)  # (B, 2*nL, n)
    out = np.asarray(kernels.inpaint_stack(jnp.asarray(x_ri), known, n_iters))
    got = out[:, :nL] + 1j * out[:, nL:]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_pallas_tier_estimator_end_to_end():
    """Full estimator with kernels='pallas' (interpret mode) matches the XLA tier."""
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.utils import synthetic

    for kwargs in (
        dict(n_prbs=24, n_layers=2, comb=2),
        dict(n_prbs=24, n_layers=1, comb=2, interp="cnn"),
    ):
        case = synthetic.make_case(seed=55, snr_db=30.0, **kwargs)
        nL = case.pilots.shape[2]
        rg = estimator.split_ri(case.received_rg)
        pil = estimator.split_ri(case.pilots)
        out_x = estimator.build_ri(case.hop1, case.hop2, case.config, nL, kernels="xla")(
            rg, pil, case.beta
        )
        out_p = estimator.build_ri(case.hop1, case.hop2, case.config, nL, kernels="pallas")(
            rg, pil, case.beta
        )
        ch_x = np.asarray(out_x.channel_est_rg)
        ch_p = np.asarray(out_p.channel_est_rg)
        scale = np.abs(ch_x).max() + 1e-30
        assert np.max(np.abs(ch_x - ch_p)) / scale < 1e-10, kwargs
        np.testing.assert_allclose(float(out_p.noise_est), float(out_x.noise_est), rtol=1e-10)


def test_fused_fill_rotate_serve_matches_xla():
    rng = np.random.default_rng(4)
    B, nL, n_re, n_sc, n_sym = 3, 2, 48, 96, 14
    h = rng.standard_normal((B, nL, n_re)) + 1j * rng.standard_normal((B, nL, n_re))
    rot = np.exp(1j * rng.standard_normal((B, n_sym)))
    w = rng.standard_normal((n_re, n_sc)) * 0.1
    h_ri = np.stack([h.real, h.imag], axis=1).astype(np.float32)
    rot_ri = np.stack([rot.real, rot.imag], axis=1).astype(np.float32)
    out = np.asarray(kernels.fused_fill_rotate_serve(
        jnp.asarray(h_ri), jnp.asarray(w.astype(np.float32)), jnp.asarray(rot_ri), tile_sc=64
    ))  # (B, 2, nL, n_sym, n_sc)
    full = np.einsum("blr,rs->bls", h, w)  # (B, nL, n_sc)
    want = full[:, :, None, :] * rot[:, None, :, None]  # (B, nL, n_sym, n_sc)
    got = out[:, 0] + 1j * out[:, 1]
    np.testing.assert_allclose(got, want.astype(np.complex64), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nL,n_cdm", [(4, 2), (2, 2), (4, 1)])
def test_fused_fill_rotate_serve_multigroup(nL, n_cdm):
    """Multi-CDM-group serve fill through the equal-contiguous-group (3-D grid)
    dispatch — the flagship c2 shape (nL=4, 2 CDM groups, n_lc=2) is exactly the
    geometry whose round-2 dynamic layer slice aborted Mosaic on real TPUs."""
    rng = np.random.default_rng(7)
    B, n_re, n_sc, n_sym = 16, 104, 1272, 14
    n_lc = nL // n_cdm
    h = rng.standard_normal((B, nL, n_re)) + 1j * rng.standard_normal((B, nL, n_re))
    rot = np.exp(1j * rng.standard_normal((B, n_sym)))
    w = rng.standard_normal((n_cdm, n_re, n_sc)).astype(np.float64) * 0.1
    h_ri = np.stack([h.real, h.imag], axis=1).astype(np.float32)
    rot_ri = np.stack([rot.real, rot.imag], axis=1).astype(np.float32)
    layer_slices = tuple((c * n_lc, (c + 1) * n_lc) for c in range(n_cdm))
    out = np.asarray(
        kernels.fused_fill_rotate_serve(
            jnp.asarray(h_ri),
            jnp.asarray(w.astype(np.float32)),
            jnp.asarray(rot_ri),
            tile_sc=512,
            layer_slices=layer_slices,
        )
    )  # (B, 2, nL, n_sym, n_sc)
    got = out[:, 0] + 1j * out[:, 1]
    want = np.empty((B, nL, n_sym, n_sc), np.complex128)
    for c, (l0, l1) in enumerate(layer_slices):
        full = np.einsum("blr,rs->bls", h[:, l0:l1], w[c])
        want[:, l0:l1] = full[:, :, None, :] * rot[:, None, :, None]
    np.testing.assert_allclose(got, want.astype(np.complex64), rtol=1e-4, atol=1e-4)


def test_pallas_serve_deferred_estimator_multicdm():
    """Full batched deferred-Pallas serve path on a 4-layer (2-CDM-group) case —
    end-to-end through build_ri(kernels='pallas', out_layout='serve', batched)."""
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.utils import synthetic

    case = synthetic.make_case(seed=77, n_prbs=26, n_layers=4, comb=2, snr_db=30.0)
    nL = case.pilots.shape[2]
    from srsran_ce_tpu.models.plan import make_plan

    plan = make_plan(case.hop1, case.hop2, case.config, nL)
    assert estimator._serve_pallas_deferred_ok(plan), "deferred path must be eligible"
    assert plan.hop1.n_cdm == 2, plan.hop1.n_cdm
    B = 3
    rg = estimator.split_ri(case.received_rg).astype(np.float32)
    pil = estimator.split_ri(case.pilots).astype(np.float32)
    rg_b = np.broadcast_to(rg, (B,) + rg.shape).copy()
    pil_b = np.broadcast_to(pil, (B,) + pil.shape).copy()
    beta = jnp.asarray(np.ones(B, np.float32))
    f_x = estimator.build_ri(
        case.hop1, case.hop2, case.config, nL, batched=True, out_layout="serve"
    )
    f_p = estimator.build_ri(
        case.hop1, case.hop2, case.config, nL, batched=True, out_layout="serve",
        kernels="pallas",
    )
    a = np.asarray(f_x(rg_b, pil_b, beta).channel_est_rg, np.float64)
    b = np.asarray(f_p(rg_b, pil_b, beta).channel_est_rg, np.float64)
    nmse = np.sum((a - b) ** 2) / (np.sum(a**2) + 1e-30)
    assert nmse < 1e-10, nmse


def test_pallas_serve_estimator_end_to_end():
    """kernels='pallas' + out_layout='serve' must match the XLA serve tier."""
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.utils import synthetic

    case = synthetic.make_case(seed=21, n_prbs=24, n_layers=2, snr_db=30.0)
    f_x = estimator.build_ri(case.hop1, case.hop2, case.config, 2, out_layout="serve")
    f_p = estimator.build_ri(
        case.hop1, case.hop2, case.config, 2, out_layout="serve", kernels="pallas"
    )
    rg = estimator.split_ri(case.received_rg).astype(np.float32)
    pil = estimator.split_ri(case.pilots).astype(np.float32)
    beta = jnp.asarray(np.float32(case.beta))
    a = np.asarray(f_x(rg, pil, beta).channel_est_rg, np.float64)
    b = np.asarray(f_p(rg, pil, beta).channel_est_rg, np.float64)
    nmse = np.sum((a - b) ** 2) / (np.sum(a**2) + 1e-30)
    assert nmse < 1e-10, nmse


def test_serve_fill_geometry_is_single_source():
    """The eligibility predicate and the kernel must share ONE tile/VMEM model
    (round-3 verdict item 6): sweep odd geometries, assert that every geometry
    the predicate admits actually runs through the kernel (interpret mode) with
    the tile serve_fill_geometry reports, and matches the reference math."""
    rng = np.random.default_rng(11)
    geometries = [
        # (n_re, n_sc, n_alloc, nL, n_cdm) — odd, non-tile-aligned shapes
        (13, 97, 3, 1, 1),
        (31, 131, 14, 2, 1),
        (52, 624, 14, 4, 2),
        (104, 1272, 14, 4, 2),  # c2 flagship
        (57, 700, 7, 2, 2),
        (9, 36, 1, 1, 1),
        (150, 3276, 14, 1, 1),  # 273-PRB wideband
    ]
    for n_re, n_sc, n_alloc, nL, n_cdm in geometries:
        n_lc = nL // n_cdm
        tile, block_b, vmem = kernels.serve_fill_geometry(
            n_re, n_sc, n_alloc, nL, n_lc
        )
        # tile legality: full axis, or a 128-multiple
        assert tile == n_sc or (tile % 128 == 0 and tile <= n_sc), (tile, n_sc)
        if vmem > 12 * 1024 * 1024:
            continue  # predicate would reject; kernel never sees it
        B = block_b  # worst-case batch block the predicate budgets for
        h = rng.standard_normal((B, nL, n_re)) + 1j * rng.standard_normal((B, nL, n_re))
        rot = np.exp(1j * rng.standard_normal((B, n_alloc)))
        w = rng.standard_normal((n_cdm, n_re, n_sc)) * 0.1
        h_ri = np.stack([h.real, h.imag], axis=1).astype(np.float32)
        rot_ri = np.stack([rot.real, rot.imag], axis=1).astype(np.float32)
        layer_slices = tuple((c * n_lc, (c + 1) * n_lc) for c in range(n_cdm))
        out = np.asarray(
            kernels.fused_fill_rotate_serve(
                jnp.asarray(h_ri),
                jnp.asarray(w.astype(np.float32)),
                jnp.asarray(rot_ri),
                layer_slices=layer_slices,
            )
        )
        got = out[:, 0] + 1j * out[:, 1]
        want = np.empty((B, nL, n_alloc, n_sc), np.complex128)
        for c, (l0, l1) in enumerate(layer_slices):
            full = np.einsum("blr,rs->bls", h[:, l0:l1], w[c])
            want[:, l0:l1] = full[:, :, None, :] * rot[:, None, :, None]
        err = np.max(np.abs(got - want)) / (np.abs(want).max() + 1e-30)
        assert err < 1e-4, (err, (n_re, n_sc, n_alloc, nL, n_cdm))


def test_serve_fill_predicate_uses_kernel_geometry():
    """_serve_pallas_deferred_ok must contain no duplicated tile math: its
    verdict flips exactly where serve_fill_geometry's VMEM estimate crosses
    the 12 MB budget."""
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.models.plan import make_plan
    from srsran_ce_tpu.utils import synthetic

    # eligible: c2-like geometry
    case = synthetic.make_case(seed=5, n_prbs=106, n_layers=4, comb=2, snr_db=30.0)
    plan = make_plan(case.hop1, case.hop2, case.config, 4)
    hp = plan.hop1
    n_lc = max(l1 - l0 for l0, l1 in hp.layer_slices)
    _, _, vmem = kernels.serve_fill_geometry(
        hp.n_re, hp.n_sc_hop, hp.n_alloc_syms, plan.n_layers, n_lc
    )
    assert estimator._serve_pallas_deferred_ok(plan) == (vmem <= 12 * 1024 * 1024)

    # deep-CNN wideband: whatever the verdict, it must equal the shared model's
    case3 = synthetic.make_case(seed=6, n_prbs=273, n_layers=1, comb=2,
                                snr_db=30.0, interp="cnn")
    plan3 = make_plan(case3.hop1, case3.hop2, case3.config, 1)
    hp3 = plan3.hop1
    _, _, vmem3 = kernels.serve_fill_geometry(
        hp3.n_re, hp3.n_sc_hop, hp3.n_alloc_syms, 1, 1
    )
    assert estimator._serve_pallas_deferred_ok(plan3) == (vmem3 <= 12 * 1024 * 1024)


@pytest.mark.parametrize(
    "kw",
    [
        dict(n_prbs=26, n_layers=4, comb=2, snr_db=30.0),          # 2 CDM groups
        dict(n_prbs=24, n_layers=1, comb=2, snr_db=25.0, cfo_compensate=False),
        dict(n_prbs=12, n_layers=2, comb=2, snr_db=30.0, two_hops=True),
        dict(n_prbs=52, n_layers=2, comb=2, snr_db=20.0, cfo_hz=200.0),
        dict(n_prbs=24, n_layers=1, comb=2, snr_db=30.0, interp="cnn"),  # inpaint fill
    ],
)
def test_pallas_front_matches_xla(kw):
    """Fused Pallas FRONT tier (kernels='pallas_front'): the whole per-hop front
    — LS de-spread, atan2-based CFO estimate + sin/cos compensation, time
    average, fused-matrix smoothing with unwrap-based virtual pilots, DFT TA
    with emulated argmax, noise/RSRP/EPRE — in ONE kernel, vs the XLA tier.
    Round 3 called this fusion 'blocked outright' on missing Mosaic ops; the
    mathx emulations close it (measured on-chip in ARCHITECTURE.md)."""
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.utils import synthetic

    case = synthetic.make_case(seed=31, **kw)
    nL = case.pilots.shape[2]
    rg = estimator.split_ri(case.received_rg).astype(np.float32)
    pil = estimator.split_ri(case.pilots).astype(np.float32)
    B = 4
    rg_b = np.broadcast_to(rg, (B,) + rg.shape).copy()
    pil_b = np.broadcast_to(pil, (B,) + pil.shape).copy()
    beta = jnp.asarray(np.full(B, case.beta, np.float32))
    for layout in ("serve", "factored"):
        f_x = estimator.build_ri(
            case.hop1, case.hop2, case.config, nL, batched=True, out_layout=layout
        )
        f_p = estimator.build_ri(
            case.hop1, case.hop2, case.config, nL, batched=True, out_layout=layout,
            kernels="pallas_front",
        )
        ox = f_x(rg_b, pil_b, beta)
        op = f_p(rg_b, pil_b, beta)
        if layout == "serve":
            a = np.asarray(ox.channel_est_rg, np.float64)
            b = np.asarray(op.channel_est_rg, np.float64)
        else:
            a = np.asarray(ox.profiles, np.float64)
            b = np.asarray(op.profiles, np.float64)
            np.testing.assert_allclose(
                np.asarray(op.sym_rot), np.asarray(ox.sym_rot), rtol=2e-5, atol=2e-6
            )
        nmse = np.sum((a - b) ** 2) / (np.sum(a**2) + 1e-30)
        assert nmse < 1e-9, (layout, nmse)
        np.testing.assert_allclose(
            np.asarray(op.noise_est), np.asarray(ox.noise_est), rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(op.rsrp), np.asarray(ox.rsrp), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(op.epre), np.asarray(ox.epre), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(op.time_alignment), np.asarray(ox.time_alignment),
            rtol=1e-6, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(op.cfo_hz), np.asarray(ox.cfo_hz), rtol=1e-4, atol=1e-3
        )


def test_pallas_front_rejects_ineligible_plans():
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.utils import synthetic

    # wiener smoothing has no fused filter matrices
    case = synthetic.make_case(seed=8, n_prbs=16, n_layers=1, smoothing="wiener")
    with pytest.raises(ValueError, match="not eligible"):
        estimator.build_ri(
            case.hop1, case.hop2, case.config, 1, batched=True,
            out_layout="serve", kernels="pallas_front",
        )
    # time interpolation is outside the kernel's rank-1 model
    case = synthetic.make_case(seed=8, n_prbs=16, n_layers=1, time_interp="linear")
    with pytest.raises(ValueError, match="not eligible"):
        estimator.build_ri(
            case.hop1, case.hop2, case.config, 1, batched=True,
            out_layout="serve", kernels="pallas_front",
        )


def test_front_predicate_uses_kernel_geometry():
    """_front_pallas_ok and fused_front must share ONE VMEM model + budget
    (ADVICE r04: the gate modeled block_b=4 while the kernel ran 16): the gate
    admits a plan iff the smallest block the kernel can shrink to (1) fits
    kernels.FRONT_VMEM_BUDGET, and front_vmem_bytes defaults to the block the
    kernel actually starts at."""
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.models.plan import make_plan
    from srsran_ce_tpu.utils import synthetic

    # default geometry of the model == the kernel's starting block
    assert (
        kernels.front_vmem_bytes(636, 5, 36, 159, 2, 4, 4)
        == kernels.front_vmem_bytes(
            636, 5, 36, 159, 2, 4, 4, block_b=kernels.FRONT_BLOCK_B
        )
    )
    for kw in (
        dict(n_prbs=106, n_layers=4, comb=2),
        dict(n_prbs=273, n_layers=4, comb=2),
    ):
        case = synthetic.make_case(seed=9, snr_db=30.0, **kw)
        nL = case.pilots.shape[2]
        plan = make_plan(case.hop1, case.hop2, case.config, nL)
        # block 2 is the kernel's true floor (block 1 never lowers; fused_front
        # bumps it back to 2 with batch padding) — the gate must test 2
        want = all(
            kernels.front_vmem_bytes(
                hp.n_re, hp.n_pils, hp.half_cp_len, hp.ta_scatter_idx.size,
                hp.n_cdm, nL, hp.n_dsym, block_b=2,
            )
            <= kernels.FRONT_VMEM_BUDGET
            for hp in (plan.hop1, plan.hop2)
            if hp is not None
        )
        assert estimator._front_pallas_ok(plan) == want, kw


def test_pallas_front_unbatched_single_problem():
    """B=1 (the unbatched build_ri wrapper) must not reach block_b=1 —
    Mosaic rejects the 1-sublane lane_sum reduction ('unsupported output
    implicit dimension', found on chip in round 5); fused_front pads the
    batch to 2 instead. Output must still match the XLA tier."""
    from srsran_ce_tpu.models import estimator
    from srsran_ce_tpu.utils import synthetic

    case = synthetic.make_case(seed=31, n_prbs=24, n_layers=2, comb=2, snr_db=30.0)
    nL = 2
    rg = estimator.split_ri(case.received_rg).astype(np.float32)
    pil = estimator.split_ri(case.pilots).astype(np.float32)
    beta = jnp.asarray(np.float32(case.beta))
    f_x = estimator.build_ri(case.hop1, case.hop2, case.config, nL, out_layout="serve")
    f_p = estimator.build_ri(
        case.hop1, case.hop2, case.config, nL, out_layout="serve",
        kernels="pallas_front",
    )
    a = np.asarray(f_x(rg, pil, beta).channel_est_rg, np.float64)
    b = np.asarray(f_p(rg, pil, beta).channel_est_rg, np.float64)
    nmse = np.sum((a - b) ** 2) / (np.sum(a**2) + 1e-30)
    assert nmse < 1e-9, nmse
