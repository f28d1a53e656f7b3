"""Randomized-geometry fuzz conformance: jitted estimator vs float64 oracle.

The reference suite spans 248 heterogeneous srsRAN cases (SCS, smoothing, CFO,
grid sizes, 1-4 layers, single/dual hop — scripts/validation/validate_all.py:208-231).
Those vectors are not shipped, so this fuzzer samples the same geometry space
at random and asserts the production path matches the float64 numpy oracle on
every draw. Seeded and deterministic; widen with CE_FUZZ_N=<draws>.
"""
import os

import numpy as np
import pytest

from srsran_ce_tpu.models import estimator
from srsran_ce_tpu.utils import oracle, synthetic

N_DRAWS = int(os.environ.get("CE_FUZZ_N", "12"))


def _draw_geometry(rng: np.random.Generator) -> dict:
    two_hops = bool(rng.random() < 0.25)
    smoothing = rng.choice(["filter", "filter", "mean", "none", "wiener"])
    comb = int(rng.choice([2, 2, 3, 4, 6]))
    n_layers = int(rng.choice([1, 1, 2, 3, 4]))
    if two_hops:
        n_prbs = int(rng.choice([3, 6, 12, 24, 52]))
    else:
        n_prbs = int(rng.choice([1, 2, 5, 16, 24, 52, 106, 273]))
    n_dmrs_syms = int(rng.choice([2, 4] if two_hops else [1, 2, 4]))
    kw = dict(
        n_prbs=n_prbs,
        n_layers=n_layers,
        comb=comb,
        scs_hz=float(rng.choice([15e3, 30e3])),
        smoothing=str(smoothing),
        cfo_compensate=bool(rng.random() < 0.7),
        interp=str(rng.choice(["linear", "linear", "cnn"])),
        cnn_alpha=float(rng.choice([0.0, 0.0, 0.3])),
        two_hops=two_hops,
        n_dmrs_syms=n_dmrs_syms,
        snr_db=float(rng.uniform(10.0, 40.0)),
        cfo_hz=float(rng.uniform(-300.0, 300.0)),
        beta=float(rng.choice([1.0, 1.0, 1.4125])),
        time_interp=str(rng.choice(["none", "none", "linear"])),
        doppler_hz=float(rng.choice([0.0, 0.0, 300.0])),
        cfo_estimator=str(rng.choice(["first_pair", "first_pair", "wls"])),
    )
    if not two_hops and rng.random() < 0.3:
        # offset band inside a wider carrier
        pad = int(rng.integers(1, 30))
        kw["n_prb_total"] = n_prbs + 2 * pad
        kw["prb_start"] = pad
    if n_prbs >= 4 and rng.random() < 0.2:
        # non-contiguous maskPRBs: interior hole (reference supports arbitrary
        # maskPRBs, validate_all.py:150-197 reassembles them from mask runs)
        h0 = int(rng.integers(1, n_prbs - 2))
        h1 = int(rng.integers(h0 + 1, n_prbs))
        kw["prb_hole"] = (h0, h1)
    if comb == 2 and rng.random() < 0.3:
        # standard TS 38.211 sequences instead of random QPSK pilots
        hole = kw.get("prb_hole")
        n_prbs_eff = n_prbs - (hole[1] - hole[0] if hole else 0)
        m_zc = n_prbs_eff * 6
        if m_zc >= 36 or m_zc == 30:  # 30 = closed-form short sequence
            kw["pilot_source"] = str(rng.choice(["dmrs", "srs"]))
        else:
            kw["pilot_source"] = "dmrs"
        if kw["pilot_source"] == "dmrs" and rng.random() < 0.3:
            kw["dmrs_type"] = 2  # adjacent-pair clusters, 4 REs/PRB
    return kw


@pytest.mark.parametrize("draw", range(N_DRAWS))
def test_fuzzed_geometry_matches_oracle(draw):
    rng = np.random.default_rng(0xCE_F0 + draw)
    kw = _draw_geometry(rng)
    case = synthetic.make_case(seed=int(rng.integers(0, 2**31)), **kw)
    res_j = estimator.estimate(
        case.received_rg, case.pilots, case.beta, case.hop1, case.hop2, case.config
    )
    res_o = oracle.estimate(
        case.received_rg, case.pilots, case.beta, case.hop1, case.hop2, case.config
    )
    ch_j = np.asarray(res_j.channel_est_rg)
    ch_o = res_o.channel_est_rg
    nmse = np.sum(np.abs(ch_j - ch_o) ** 2) / (np.sum(np.abs(ch_o) ** 2) + 1e-30)
    assert nmse < 1e-18, f"channel NMSE {nmse} for geometry {kw}"
    np.testing.assert_allclose(float(res_j.noise_est), res_o.noise_est, rtol=1e-8, atol=1e-20)
    np.testing.assert_allclose(float(res_j.rsrp), res_o.rsrp, rtol=1e-9)
    np.testing.assert_allclose(float(res_j.epre), res_o.epre, rtol=1e-9)
    np.testing.assert_allclose(
        float(res_j.time_alignment), res_o.time_alignment, rtol=1e-9, atol=1e-15
    )
    if res_o.cfo_hz is None:
        assert np.isnan(float(res_j.cfo_hz))
    else:
        np.testing.assert_allclose(float(res_j.cfo_hz), res_o.cfo_hz, rtol=1e-8, atol=1e-10)

    if case.config.time_interp == "none":
        # factored (rank-1) output must reconstruct the same grid on every
        # geometry the fuzzer can draw (1-ulp: numpy vs XLA complex products)
        n_layers = case.pilots.shape[2]
        r_fac = estimator.build_ri(
            case.hop1, case.hop2, case.config, n_layers, out_layout="factored"
        )(
            estimator.split_ri(case.received_rg),
            estimator.split_ri(case.pilots),
            np.asarray(case.beta),
        )
        grid = estimator.reconstruct_factored(
            estimator.merge_ri(np.asarray(r_fac.profiles)),
            estimator.merge_ri(np.asarray(r_fac.sym_rot)),
            case.hop1,
            case.hop2,
        )
        np.testing.assert_allclose(grid, ch_j, rtol=1e-12, atol=1e-20)
