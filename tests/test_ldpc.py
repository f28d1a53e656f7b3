"""QC-LDPC encoder/decoder tests: GF(2) validity, exactness vs the float64
numpy reference schedule, AWGN error correction + coding gain, irregular
(padded-slot) base matrices, int8 receiver-LLR input, batching."""
import numpy as np
import pytest

from srsran_ce_tpu.ops import ldpc


def _awgn_llrs(rng, code, n_words, snr_db):
    plan = ldpc.make_ldpc_plan(code)
    u = rng.integers(0, 2, (n_words, plan.k), dtype=np.uint8)
    c = ldpc.encode(code, u)
    snr = 10.0 ** (snr_db / 10.0)
    y = (1.0 - 2.0 * c) + rng.normal(0.0, np.sqrt(0.5 / snr), c.shape)
    return u, c, 4.0 * snr * y


def test_encoder_produces_valid_systematic_codewords():
    code = ldpc.array_code(3, 9, 17)
    plan = ldpc.make_ldpc_plan(code)
    h = ldpc._expand_h(code)
    assert plan.k == code.n - plan.rank
    assert plan.info_cols.size == plan.k
    assert plan.parity_cols.size == plan.rank
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, (16, plan.k), dtype=np.uint8)
    c = ldpc.encode(code, u)
    assert not np.any((c @ h.T) % 2), "encoded words must satisfy every check"
    assert np.array_equal(c[:, plan.info_cols], u), "systematic positions carry u"


def test_decoder_matches_numpy_reference_schedule():
    # Random (non-codeword) LLRs exercise every message path, including
    # unsatisfied checks; bits/ok must agree exactly with the float64 mirror.
    code = ldpc.array_code(4, 11, 13)
    rng = np.random.default_rng(2)
    llr = rng.normal(0.0, 3.0, (6, code.n))
    dec = ldpc.build_decoder(code, n_iters=8)
    res = dec(llr)
    rb, rok, rpost = ldpc.decode_reference(code, llr, n_iters=8)
    assert np.array_equal(np.asarray(res.bits), rb)
    assert np.array_equal(np.asarray(res.ok), rok)
    np.testing.assert_allclose(np.asarray(res.posterior), rpost, rtol=0, atol=1e-6)


def test_irregular_base_matrix_padded_slots():
    # -1 entries give rows of unequal degree -> padded check slots; the padded
    # path must emit zeros and still match the reference exactly.
    base = (
        (0, 2, -1, 1, -1, 0),
        (-1, 1, 0, -1, 3, 0),
        (2, -1, 1, 0, -1, -1),
    )
    code = ldpc.QCLdpcCode(base=base, z=5)
    plan = ldpc.make_ldpc_plan(code)
    assert plan.max_degree == 4 and not plan.slot_valid.all()
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, (4, plan.k), dtype=np.uint8)
    c = ldpc.encode(code, u)
    assert not np.any((c @ ldpc._expand_h(code).T) % 2)
    llr = rng.normal(0.0, 2.0, (4, code.n))
    res = ldpc.build_decoder(code, n_iters=6)(llr)
    rb, rok, _ = ldpc.decode_reference(code, llr, n_iters=6)
    assert np.array_equal(np.asarray(res.bits), rb)
    assert np.array_equal(np.asarray(res.ok), rok)


def test_awgn_correction_and_coding_gain():
    code = ldpc.array_code(3, 8, 53)  # n=424, k~271, rate ~0.64
    plan = ldpc.make_ldpc_plan(code)
    rng = np.random.default_rng(4)
    u, c, llr = _awgn_llrs(rng, code, 24, snr_db=4.0)
    hard_errs = int(np.sum((llr < 0) != c))
    assert hard_errs > 0, "SNR chosen so the uncoded channel makes errors"
    res = ldpc.build_decoder(code, n_iters=30)(llr)
    assert bool(np.asarray(res.ok).all()), "all words must converge at 4 dB"
    assert np.array_equal(np.asarray(res.info), u), "decoded payload must be exact"
    assert np.array_equal(np.asarray(res.bits), c)


def test_ok_flag_false_on_garbage():
    code = ldpc.array_code(3, 8, 13)
    rng = np.random.default_rng(5)
    llr = rng.normal(0.0, 1.0, (8, code.n))  # pure noise, not codewords
    res = ldpc.build_decoder(code, n_iters=4)(llr)
    rb, rok, _ = ldpc.decode_reference(code, llr, n_iters=4)
    assert np.array_equal(np.asarray(res.ok), rok)
    assert not np.asarray(res.ok).all(), "noise should not all pass parity in 4 iters"


def test_int8_llrs_from_receiver_decode():
    # The fused receiver emits int8 soft bits (round(llr*scale) clip +-127);
    # min-sum is scale-invariant so they feed the decoder directly.
    code = ldpc.array_code(3, 8, 53)
    rng = np.random.default_rng(6)
    u, c, llr = _awgn_llrs(rng, code, 8, snr_db=5.0)
    q = np.clip(np.round(llr * 4.0), -127, 127).astype(np.int8)
    res = ldpc.build_decoder(code, n_iters=30)(q)
    assert bool(np.asarray(res.ok).all())
    assert np.array_equal(np.asarray(res.info), u)


def test_leading_batch_axes_and_cache():
    code = ldpc.array_code(2, 6, 11)
    plan = ldpc.make_ldpc_plan(code)
    assert ldpc.make_ldpc_plan(code) is plan, "plan must be cached per code"
    dec = ldpc.build_decoder(code, n_iters=3)
    rng = np.random.default_rng(7)
    llr = rng.normal(0.0, 2.0, (2, 3, code.n))
    res = dec(llr)
    assert res.bits.shape == (2, 3, code.n)
    assert res.info.shape == (2, 3, plan.k)
    assert res.ok.shape == (2, 3)
    flat = dec(llr.reshape(6, code.n))
    assert np.array_equal(np.asarray(res.bits).reshape(6, -1), np.asarray(flat.bits))


def test_array_code_validation():
    with pytest.raises(AssertionError):
        ldpc.array_code(3, 8, 12)  # z not prime
    with pytest.raises(AssertionError):
        ldpc.array_code(9, 8, 13)  # more check than var blocks


def test_coded_link_end_to_end():
    """Full coded uplink chain (validation/quality.coded_ber_sweep): LDPC
    codewords -> interleave -> scramble -> 16QAM -> 2x2 MIMO channel + CFO +
    AWGN -> estimate -> joint MMSE -> fused int8 demap -> descramble ->
    min-sum decode. At 20 dB the raw channel still makes errors; the decoder
    must deliver an error-free payload with every parity check passing."""
    from srsran_ce_tpu.validation import quality

    t = quality.coded_ber_sweep(snrs_db=(20.0,), n_cases=2, n_prbs=12)[20.0]
    assert t["uncoded_ber"] > 5e-3, t  # the code has real work to do
    assert t["coded_ber"] == 0.0, t
    assert t["coded_bler"] == 0.0, t
    assert t["parity_ok_frac"] == 1.0, t


def test_pallas_tier_bit_identical():
    """The VMEM-resident pallas decoder (interpret mode on CPU) must be
    BIT-identical to the XLA tier: same edge order, same summation
    association, same argmin-first tie semantics in the two-min fold."""
    for code in (
        ldpc.array_code(3, 8, 13),
        ldpc.QCLdpcCode(
            base=((0, 2, -1, 1, -1, 0), (-1, 1, 0, -1, 3, 0), (2, -1, 1, 0, -1, -1)),
            z=5,
        ),
    ):
        rng = np.random.default_rng(11)
        llr = rng.normal(0, 2.5, (6, code.n)).astype(np.float32)
        a = ldpc.build_decoder(code, n_iters=7)(llr)
        p = ldpc.build_decoder(code, n_iters=7, kernels="pallas")(llr)
        assert np.array_equal(np.asarray(a.bits), np.asarray(p.bits))
        assert np.array_equal(np.asarray(a.ok), np.asarray(p.ok))
        np.testing.assert_array_equal(np.asarray(a.posterior), np.asarray(p.posterior))


def test_pallas_tier_layout_selection_and_gate():
    assert ldpc._pallas_layout(ldpc.array_code(6, 16, 61)) == (0, 128)
    # too big for sublane-z (19 MB live at 128 lanes) -> lane-z with the
    # largest fitting batch-sublane tile
    z_axis, block_b = ldpc._pallas_layout(ldpc.array_code(6, 16, 389))
    assert z_axis == 1 and block_b == 16
    huge = ldpc.array_code(16, 64, 1021)  # ~37 MB even at the 8-row tile
    assert ldpc._pallas_layout(huge) is None
    with pytest.raises(ValueError):
        ldpc.build_decoder(huge, n_iters=5, kernels="pallas")
    # auto falls back to the XLA tier when no pallas layout fits
    small = ldpc.array_code(2, 6, 11)
    orig = ldpc._pallas_layout
    ldpc._pallas_layout = lambda c: None
    try:
        ldpc.build_decoder.cache_clear()
        dec = ldpc.build_decoder(small, n_iters=3, kernels="auto")
        rng = np.random.default_rng(0)
        dec(rng.normal(0, 1, (4, small.n)).astype(np.float32))  # runs, no raise
    finally:
        ldpc._pallas_layout = orig
        ldpc.build_decoder.cache_clear()


def test_pallas_lane_z_layout_bit_identical():
    """The lane-z tile (z on lanes, batch on sublanes — the large-Z route)
    must match the XLA tier bitwise too; force it by monkeypatching the
    layout choice on a small code (interpret mode on CPU)."""
    code = ldpc.array_code(3, 8, 13)
    rng = np.random.default_rng(13)
    llr = rng.normal(0, 2.5, (9, code.n)).astype(np.float32)  # 9 -> pads to 16
    a = ldpc.build_decoder(code, n_iters=7)(llr)
    orig = ldpc._pallas_layout
    ldpc._pallas_layout = lambda c: (1, 8)
    try:
        ldpc.build_decoder.cache_clear()
        p = ldpc.build_decoder(code, n_iters=7, kernels="pallas")(llr)
    finally:
        ldpc._pallas_layout = orig
        ldpc.build_decoder.cache_clear()
    assert np.array_equal(np.asarray(a.bits), np.asarray(p.bits))
    assert np.array_equal(np.asarray(a.ok), np.asarray(p.ok))
    np.testing.assert_array_equal(np.asarray(a.posterior), np.asarray(p.posterior))


def test_dp_sharded_decode_matches_unsharded():
    """parallel.build_dp_decoder: codewords dp-shard with zero collectives;
    the sharded decode must equal the single-device decode bitwise."""
    from srsran_ce_tpu.parallel import mesh as mesh_lib
    from srsran_ce_tpu.parallel.data_parallel import build_dp_decoder

    mesh = mesh_lib.make_mesh((8,), ("dp",))
    code = ldpc.array_code(3, 8, 53)
    plan = ldpc.make_ldpc_plan(code)
    rng = np.random.default_rng(12)
    u = rng.integers(0, 2, (16, plan.k), dtype=np.uint8)
    c = ldpc.encode(code, u)
    snr = 10.0**0.4
    llr = (4 * snr * ((1 - 2.0 * c) + rng.normal(0, np.sqrt(0.5 / snr), c.shape))).astype(
        np.float32
    )
    res = build_dp_decoder(code, mesh, n_iters=25)(llr)
    ref = ldpc.build_decoder(code, n_iters=25)(llr)
    assert np.array_equal(np.asarray(res.bits), np.asarray(ref.bits))
    assert np.array_equal(np.asarray(res.ok), np.asarray(ref.ok))
    assert len(res.bits.sharding.device_set) == 8
    assert np.array_equal(np.asarray(res.info), u)


def test_load_base_graph_json(tmp_path):
    import json

    base = [[0, 2, -1, 1, -1, 0], [-1, 1, 0, -1, 3, 0], [2, -1, 1, 0, -1, -1]]
    p = tmp_path / "bg.json"
    p.write_text(json.dumps({"base": base}))
    code = ldpc.load_base_graph(p, z=5)
    assert code == ldpc.QCLdpcCode(base=tuple(tuple(r) for r in base), z=5)
    # shifts reduce mod z (the TS 38.212 lifting rule)
    p.write_text(json.dumps([[7, 12], [-1, 6]]))
    code = ldpc.load_base_graph(p, z=5)
    assert code.base == ((2, 2), (-1, 1))


def test_early_termination_serving_equivalence():
    """Two-phase serving decode (early_iters) must deliver the same payloads
    as the single full pass on a decodable link, and still rerun failures."""
    from srsran_ce_tpu import serving, transport
    from srsran_ce_tpu.ops import demap
    from srsran_ce_tpu.utils import synthetic

    code = ldpc.array_code(8, 16, 61)
    plan = ldpc.make_ldpc_plan(code)
    nbits = demap.bits_per_symbol("16qam")
    mk = dict(n_rx=2, modulation="16qam", scramble=False, n_prbs=12, n_layers=2)
    probe = synthetic.make_mimo_case(seed=5100, snr_db=20.0, **mk)
    n_sc, n_sym = probe.data_mask.shape
    base = dict(code=code, n_iters=30, interleave_seed=3)
    lay = transport.layout(
        transport.TransportCoding(**base), probe.hop1, probe.hop2, n_sc, n_sym, 2, nbits
    )
    rng = np.random.default_rng(5100)
    u = rng.integers(0, 2, (lay.c_words, plan.k), dtype=np.uint8)
    bits = transport.place_codewords(lay, ldpc.encode(code, u), 2, nbits, fill_rng=rng)
    case = synthetic.make_mimo_case(seed=5100, snr_db=20.0, bits=bits, **mk)
    prob = serving.Problem(
        case.received_rg.astype(np.complex64), case.pilots.astype(np.complex64),
        case.beta, case.hop1, case.hop2, case.config,
    )
    kw = dict(batch_size=4, out="decoded", modulation="16qam", matmul_precision=None)
    r_two = serving.process(
        [prob], coding=transport.TransportCoding(**base, early_iters=4), **kw
    )[0]
    r_one = serving.process(
        [prob], coding=transport.TransportCoding(**base, early_iters=None), **kw
    )[0]
    assert bool(np.asarray(r_two.ok).all()) and bool(np.asarray(r_one.ok).all())
    assert np.array_equal(r_two.info, u) and np.array_equal(r_one.info, u)


def test_layered_schedule_matches_reference_and_converges_faster():
    """schedule='layered' (pallas tier, row-serial): bitwise vs its float64
    numpy mirror, and strictly-no-worse convergence than flooding at equal
    sweep counts (the classic layered property: later rows see fresher
    beliefs, ~2x fewer sweeps for the same BER)."""
    code = ldpc.array_code(3, 8, 13)
    rng = np.random.default_rng(21)
    llr = rng.normal(0, 2.5, (6, code.n)).astype(np.float32)
    p = ldpc.build_decoder(code, n_iters=5, kernels="pallas", schedule="layered")(llr)
    rb, rok, rpost = ldpc.decode_reference(code, llr, n_iters=5, schedule="layered")
    assert np.array_equal(np.asarray(p.bits), rb)
    assert np.array_equal(np.asarray(p.ok), rok)
    np.testing.assert_allclose(np.asarray(p.posterior), rpost, rtol=0, atol=1e-5)

    code2 = ldpc.array_code(3, 8, 53)
    plan2 = ldpc.make_ldpc_plan(code2)
    u = rng.integers(0, 2, (64, plan2.k), dtype=np.uint8)
    c = ldpc.encode(code2, u)
    snr = 10.0 ** 0.2  # 2 dB: near threshold, few sweeps don't finish everything
    llr2 = (4 * snr * ((1 - 2.0 * c) + rng.normal(0, np.sqrt(0.5 / snr), c.shape))).astype(np.float32)
    ok_f = int(np.asarray(ldpc.build_decoder(code2, n_iters=3)(llr2).ok).sum())
    ok_l = int(np.asarray(
        ldpc.build_decoder(code2, n_iters=3, kernels="pallas", schedule="layered")(llr2).ok
    ).sum())
    assert ok_l >= ok_f, (ok_l, ok_f)
    assert ok_l > 48, ok_l  # layered at 3 sweeps already converges most words
    # layered on a too-large code without the pallas tier must raise
    with pytest.raises(ValueError):
        ldpc.build_decoder(ldpc.array_code(16, 64, 1021), n_iters=3, schedule="layered")


def test_gather_tier_matches_unrolled():
    """kernels='xla_gather' (O(1)-program gather formulation) must match the
    unrolled tier: posterior to float tolerance (scatter-add association),
    bits/ok exactly — on an irregular code so padded slots are exercised."""
    base = (
        (0, 2, -1, 1, -1, 0),
        (-1, 1, 0, -1, 3, 0),
        (2, -1, 1, 0, -1, -1),
    )
    code = ldpc.QCLdpcCode(base=base, z=7)
    rng = np.random.default_rng(5)
    llr = rng.normal(0.0, 2.5, (6, code.n))
    res_u = ldpc.build_decoder(code, n_iters=7)(llr)
    res_g = ldpc.build_decoder(code, n_iters=7, kernels="xla_gather")(llr)
    np.testing.assert_allclose(
        np.asarray(res_g.posterior), np.asarray(res_u.posterior), rtol=1e-5, atol=1e-5
    )
    assert np.array_equal(np.asarray(res_g.bits), np.asarray(res_u.bits))
    assert np.array_equal(np.asarray(res_g.ok), np.asarray(res_u.ok))
    # and a clean decode roundtrip through the gather tier
    plan = ldpc.make_ldpc_plan(code)
    u = rng.integers(0, 2, (4, plan.k), dtype=np.uint8)
    cw = ldpc.encode(code, u)
    llr2 = 8.0 * (1.0 - 2.0 * cw) + rng.normal(0, 0.6, cw.shape)
    res = ldpc.build_decoder(code, n_iters=10, kernels="xla_gather")(llr2)
    assert bool(np.asarray(res.ok).all())
    assert np.array_equal(np.asarray(res.info), u)


def test_auto_tier_selects_gather_for_huge_codes():
    """NR BG1 at Z=384 (edge*z over the unroll compile budget) must route to
    the gather tier under kernels='auto' — and actually decode (1 sweep on a
    codeword is enough to prove the formulation compiles and runs end to end
    on CPU without the unrolled tiers' program blowup)."""
    from srsran_ce_tpu.ops import nr_ldpc

    code = nr_ldpc.nr_base_graph(1, 384)
    assert ldpc._edge_z(code) > ldpc._UNROLL_EDGE_Z_BUDGET
    rng = np.random.default_rng(11)
    plan = ldpc.make_ldpc_plan(code)
    u = rng.integers(0, 2, (2, plan.k), dtype=np.uint8)
    cw = ldpc.encode(code, u)
    llr = 9.0 * (1.0 - 2.0 * cw) + rng.normal(0, 0.4, cw.shape)
    dec = ldpc.build_decoder(code, n_iters=3, kernels="auto")
    res = dec(llr.astype(np.float32))
    assert bool(np.asarray(res.ok).all())
    assert np.array_equal(np.asarray(res.info), u)
    with pytest.raises(ValueError):
        ldpc.build_decoder(code, n_iters=3, kernels="auto", schedule="layered")
    # small codes keep the unrolled/pallas tiers under auto
    small = ldpc.array_code(4, 11, 13)
    assert ldpc._edge_z(small) <= ldpc._UNROLL_EDGE_Z_BUDGET


def test_streamed_tier_matches_layered_reference():
    """Row-streamed VMEM tier (kernels='pallas_stream'): O(degree) program via
    scalar-prefetched wiring tables + dynamic pltpu.roll — the tier that makes
    NR-BG1-Z=384-scale codes decodable at VMEM speed (the unrolled tiers blow
    the compile budget, the gather tier measured 3 Mb/s). Must match the
    layered float64 mirror: identical hard decisions/payload, posterior to
    float tolerance (different FMA fusion; LLR magnitudes grow per sweep)."""
    from srsran_ce_tpu.ops import nr_ldpc

    code = nr_ldpc.nr_base_graph(2, 128)
    plan = ldpc.make_ldpc_plan(code)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, (16, plan.k), dtype=np.uint8)
    cw = ldpc.encode(code, u)
    snr = 10.0**0.35
    llr = (
        4 * snr * ((1 - 2.0 * cw) + rng.normal(0, np.sqrt(0.5 / snr), cw.shape))
    ).astype(np.float32)
    dec = ldpc.build_decoder(code, n_iters=8, kernels="pallas_stream", schedule="layered")
    res = dec(llr)
    bits_ref, ok_ref, post_ref = ldpc.decode_reference(
        code, llr, n_iters=8, schedule="layered"
    )
    assert np.array_equal(np.asarray(res.bits), bits_ref)
    assert np.array_equal(np.asarray(res.ok), ok_ref)
    assert np.array_equal(np.asarray(res.info), u)
    scale = np.abs(post_ref).max()
    assert np.abs(np.asarray(res.posterior, np.float64) - post_ref).max() / scale < 1e-4


def test_streamed_tier_huge_code_end_to_end():
    """BG1 Z=384 (n=26112, the largest NR code block) through the streamed
    tier — payload-exact at moderate SNR. kernels='auto' + layered must route
    here (the measured on-chip result: 257 Mb/s vs the gather tier's 3)."""
    from srsran_ce_tpu.ops import nr_ldpc

    code = nr_ldpc.nr_base_graph(1, 384)
    assert ldpc._edge_z(code) > ldpc._UNROLL_EDGE_Z_BUDGET
    assert ldpc._stream_supported(code)
    plan = ldpc.make_ldpc_plan(code)
    rng = np.random.default_rng(4)
    u = rng.integers(0, 2, (8, plan.k), dtype=np.uint8)
    cw = ldpc.encode(code, u)
    snr = 10.0**0.35
    llr = (
        4 * snr * ((1 - 2.0 * cw) + rng.normal(0, np.sqrt(0.5 / snr), cw.shape))
    ).astype(np.float32)
    dec = ldpc.build_decoder(code, n_iters=8, kernels="pallas_stream", schedule="layered")
    res = dec(llr)
    assert bool(np.asarray(res.ok).all())
    assert np.array_equal(np.asarray(res.info), u)


def test_streamed_tier_gates():
    """Round 5 lifted the z%128 gate (in-kernel z padding): ANY NR lifting
    size is streamable as long as the lane-z live set fits VMEM. Flooding on
    the streamed tier still raises (it is a layered-walk kernel)."""
    from srsran_ce_tpu.ops import nr_ldpc

    code208 = nr_ldpc.nr_base_graph(2, 208)
    assert ldpc._stream_supported(code208)  # padded to 256 lanes
    assert ldpc._stream_supported(nr_ldpc.nr_base_graph(1, 240))  # the dead zone
    with pytest.raises(ValueError, match="layered"):
        ldpc.build_decoder(code208, n_iters=4, kernels="pallas_stream", schedule="flooding")
    # a code whose live set cannot fit even the 8-row tile is still rejected
    big = ldpc.QCLdpcCode(
        base=tuple(tuple((i * j) % 1013 for j in range(24)) for i in range(12)),
        z=1013,
    )
    assert not ldpc._stream_supported(big)
    with pytest.raises(ValueError, match="VMEM"):
        ldpc.build_decoder(big, n_iters=4, kernels="pallas_stream", schedule="layered")
    # ...but the gate must model the dtype actually requested: bf16 messages
    # halve the live set, and THIS code fits with them (code review r05: the
    # gate used to model f32 regardless and falsely rejected bf16 builds)
    assert ldpc._stream_supported(big, c2v_bf16=True)
    assert ldpc.build_decoder(
        big, n_iters=2, kernels="pallas_stream", schedule="layered",
        stream_c2v_dtype="bfloat16",
    ) is not None


@pytest.mark.parametrize("group,c2v", [(1, None), (3, None), (1, "bfloat16")])
def test_streamed_tier_padded_z(group, c2v):
    """The in-kernel z padding (z=144 -> 256 lanes): the two-rotation +
    lane-select true-Z roll must reproduce decode_reference(layered) exactly
    in hard decisions for any group, including a group that does not divide
    mb (row padding). bf16 c2v storage must still decode the payload (the
    posterior is quantized, so only hard-decision/payload equality is
    asserted for it)."""
    from srsran_ce_tpu.ops import nr_ldpc

    code = nr_ldpc.nr_base_graph(2, 144)
    assert code.z % 128 != 0
    plan = ldpc.make_ldpc_plan(code)
    rng = np.random.default_rng(11)
    u = rng.integers(0, 2, (8, plan.k), dtype=np.uint8)
    cw = ldpc.encode(code, u)
    snr = 10.0**0.35
    llr = (
        4 * snr * ((1 - 2.0 * cw) + rng.normal(0, np.sqrt(0.5 / snr), cw.shape))
    ).astype(np.float32)
    dec = ldpc.build_decoder(
        code, n_iters=6, kernels="pallas_stream", schedule="layered",
        layered_group=group, stream_c2v_dtype=c2v,
    )
    res = dec(llr)
    assert bool(np.asarray(res.ok).all())
    assert np.array_equal(np.asarray(res.info), u)
    if c2v is None:
        bits_ref, ok_ref, post_ref = ldpc.decode_reference(
            code, llr, n_iters=6, schedule="layered", layered_group=group
        )
        assert np.array_equal(np.asarray(res.bits), bits_ref)
        assert np.array_equal(np.asarray(res.ok), ok_ref)
        scale = np.abs(post_ref).max()
        assert (
            np.abs(np.asarray(res.posterior, np.float64) - post_ref).max() / scale
            < 1e-4
        )


def test_default_layered_group_rule():
    """Task-8 rule: sublane-z codes keep G=1 (serial layered already ~2x);
    lane-z codes pick G from the measured table (wide z_pad -> 8, one
    register -> 2)."""
    from srsran_ce_tpu.ops import nr_ldpc

    assert ldpc.default_layered_group(ldpc.array_code(6, 16, 61)) == 1  # sublane-z
    assert ldpc.default_layered_group(nr_ldpc.nr_base_graph(1, 52)) == 2
    assert ldpc.default_layered_group(nr_ldpc.nr_base_graph(2, 208)) == 8
    # streamed-tier codes cap G at the largest group whose snapshot
    # transients still fit the lane-z VMEM budget
    g384 = ldpc.default_layered_group(nr_ldpc.nr_base_graph(1, 384))
    assert g384 >= 1 and ldpc._stream_supported(nr_ldpc.nr_base_graph(1, 384), g384)


@pytest.mark.parametrize("group", [2, 4])
def test_layered_group_matches_reference(group):
    """Row-GROUP layering (layered_group=G): G rows' updates computed from one
    posterior snapshot, then applied — interpolates between serial layered
    (G=1) and flooding, keeping the narrow lane-z tile busy (measured
    2.3-2.8x over flooding-16 at matched quality on the NR lane-z codes where
    serial layered managed only 1.1-1.5x). Must match the float64 mirror with
    the same group."""
    from srsran_ce_tpu.ops import nr_ldpc

    code = nr_ldpc.nr_base_graph(2, 16)
    plan = ldpc.make_ldpc_plan(code)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, (16, plan.k), dtype=np.uint8)
    cw = ldpc.encode(code, u)
    snr = 10.0**0.35
    llr = (
        4 * snr * ((1 - 2.0 * cw) + rng.normal(0, np.sqrt(0.5 / snr), cw.shape))
    ).astype(np.float32)
    dec = ldpc.build_decoder(
        code, n_iters=8, kernels="pallas", schedule="layered", layered_group=group
    )
    res = dec(llr)
    bits_ref, ok_ref, post_ref = ldpc.decode_reference(
        code, llr, n_iters=8, schedule="layered", layered_group=group
    )
    assert np.array_equal(np.asarray(res.bits), bits_ref)
    assert np.array_equal(np.asarray(res.info), u)
    scale = np.abs(post_ref).max()
    assert np.abs(np.asarray(res.posterior, np.float64) - post_ref).max() / scale < 1e-4
