"""Coded-chain geometry fuzz: random (geometry, modulation, code, options)
configurations through the FULL served chain — encode -> (CRC) -> interleave
-> (scramble) -> modulate -> MIMO channel -> estimate -> joint MMSE -> fused
int8 demap -> descramble -> deinterleave -> min-sum decode — each must
recover the exact payload at high SNR. Covers corners the targeted tests
don't: frequency-hopped allocations, 1..3 RX ports, BPSK..256QAM, CRC kinds,
layered schedule, early termination. CE_FUZZ_CODED_N widens the sweep."""
import os

import numpy as np
import pytest

from srsran_ce_tpu import serving, transport
from srsran_ce_tpu.ops import demap, ldpc, sequences
from srsran_ce_tpu.utils import synthetic

N = int(os.environ.get("CE_FUZZ_CODED_N", "6"))


@pytest.mark.parametrize("trial", range(N))
def test_coded_chain_fuzz(trial):
    rng = np.random.default_rng(8800 + trial)
    two_hops = bool(trial % 3 == 1)
    n_prbs = int(rng.choice([6, 12, 18] if not two_hops else [4, 6]))
    n_layers = int(rng.choice([1, 2]))
    n_rx = int(rng.choice([1, 2, 3]))
    if n_rx < n_layers:
        n_rx = n_layers
    modulation = str(rng.choice(["bpsk", "qpsk", "16qam", "256qam", "1024qam"]))
    scramble = bool(rng.integers(0, 2))
    crc = str(rng.choice(["crc16", "crc24b"])) if rng.integers(0, 2) else None
    schedule = "layered" if rng.integers(0, 2) else "flooding"
    early = int(rng.choice([0, 6]))  # 0 -> disabled
    # modest code so even small allocations carry >= 1 word; rate ~0.5
    code = ldpc.array_code(4, 8, 23)  # n=184
    plan = ldpc.make_ldpc_plan(code)
    nbits = demap.bits_per_symbol(modulation)

    # high orders need headroom + RX diversity so deep fades don't bind
    # (a 2x2 256QAM at 6 PRB is raw-BER-marginal even at 35 dB)
    snr_db = {"256qam": 35.0, "1024qam": 42.0}.get(modulation, 30.0)
    if modulation in ("256qam", "1024qam"):
        n_rx = max(n_rx, n_layers + 1)
    seed = 9100 + trial
    rnti = 0x17A3
    mk = dict(
        n_rx=n_rx, modulation=modulation, scramble=scramble, rnti=rnti,
        n_prbs=n_prbs, n_layers=n_layers, two_hops=two_hops,
    )
    c_init = sequences.pusch_scrambling_c_init(rnti, seed % 1024) if scramble else None
    coding = transport.TransportCoding(
        code=code, n_iters=25, interleave_seed=trial,
        scramble_c_init=c_init, crc=crc, schedule=schedule,
        early_iters=early or None,
    )
    geo = synthetic.make_case(
        seed=seed, snr_db=snr_db, n_prbs=n_prbs, n_layers=n_layers, two_hops=two_hops
    )
    n_sc, n_sym = geo.received_rg.shape
    lay = transport.layout(coding, geo.hop1, geo.hop2, n_sc, n_sym, n_layers, nbits)
    kp = transport.payload_bits(coding, plan.k)
    u = rng.integers(0, 2, (lay.c_words, kp), dtype=np.uint8)
    payload = transport.crc_attach(u, crc) if crc else u
    bits = transport.place_codewords(lay, ldpc.encode(code, payload), n_layers, nbits, fill_rng=rng)
    case = synthetic.make_mimo_case(seed=seed, snr_db=snr_db, bits=bits, **mk)
    prob = serving.Problem(
        case.received_rg.astype(np.complex64), case.pilots.astype(np.complex64),
        case.beta, case.hop1, case.hop2, case.config,
    )
    res = serving.process(
        [prob], batch_size=4, out="decoded", modulation=modulation, coding=coding,
        matmul_precision=None,
    )[0]
    cfg = dict(mod=modulation, prbs=n_prbs, nL=n_layers, rx=n_rx, hops=two_hops,
               scr=scramble, crc=crc, sched=schedule, early=early, words=lay.c_words)
    assert res.info.shape == (lay.c_words, kp), cfg
    assert bool(np.asarray(res.ok).all()), cfg
    assert np.array_equal(res.info, u), cfg
