"""Full-format-fidelity fuzz of the C++ test-header parser + hop regrouping.

The real 248-vector header is unavailable in this environment, so the parser
(vectors.parse_test_header, mirroring validate_all.py:55-263) and the hop
regrouping heuristics (conformance._group_hops, mirroring :393-437) have to be
hardened against every structural quirk the real format exhibits: per-layer
repeated hop blocks, multiple 52-length maskPRBs runs inside one hop entry,
hop_symbol present/absent, std::nullopt second hops, PRB masks with interior
holes, string paths with digits, erratic whitespace, len-14 vs len-n_alloc
DMRS masks. generate_fuzz_header emits those quirks FROM INTENT, so this test
checks recovery of the truth — not reproduction of the parser's own output.

CE_FUZZ_HEADER_N (default 120) controls the case count.
"""
import os

import numpy as np

from srsran_ce_tpu.utils import vectors
from srsran_ce_tpu.validation import conformance, synth_vectors

N_CASES = int(os.environ.get("CE_FUZZ_HEADER_N", "120"))


def test_header_fuzz(tmp_path):
    rng = np.random.default_rng(20260820)
    header, expected = synth_vectors.generate_fuzz_header(rng, N_CASES)
    path = tmp_path / "port_channel_estimator_test_data.h"
    path.write_text(header)

    cases = vectors.parse_test_header(path)
    assert len(cases) == N_CASES

    failures = []
    for case, exp in zip(cases, expected):
        try:
            assert case.idx == exp["idx"]
            assert case.scs_hz == exp["scs_hz"]
            assert case.start_symbol == exp["start_symbol"]
            assert case.n_alloc_syms == exp["n_alloc_syms"]
            assert abs(case.beta_dmrs - exp["beta_dmrs"]) < 1e-9
            assert case.smoothing == exp["smoothing"]
            assert case.cfo_compensate == exp["cfo_compensate"]
            assert case.grid_size_prbs == exp["grid_size_prbs"]

            hops = conformance._group_hops(case)
            assert len(hops) == len(exp["hops"]), (
                f"hop count {len(hops)} != {len(exp['hops'])}"
            )
            for (mask, pm, rm), (e_syms, e_pm, e_rm) in zip(hops, exp["hops"]):
                got_syms = np.nonzero(mask)[0].tolist()
                assert got_syms == list(e_syms), (got_syms, e_syms)
                assert np.array_equal(
                    np.asarray(pm, bool), np.asarray(e_pm, bool)
                ), "prb mask mismatch"
                # RE-mask columns recovered as a SET (per-layer repetition may
                # reorder after dedupe, but here order is emission order)
                got_cols = {rm[:, i].tobytes() for i in range(rm.shape[1])}
                want_cols = {
                    np.asarray(e_rm[:, i], bool).tobytes() for i in range(e_rm.shape[1])
                }
                assert got_cols == want_cols, "re-mask columns mismatch"
                # grouped output must build a valid HopConfig
                conformance.build_hop_config(
                    mask, pm, rm, case.start_symbol, case.n_alloc_syms
                )
        except AssertionError as e:  # collect all failures for one report
            failures.append(f"case {exp['idx']}: {e}")
    assert not failures, f"{len(failures)}/{N_CASES} fuzz cases failed:\n" + "\n".join(
        failures[:10]
    )
