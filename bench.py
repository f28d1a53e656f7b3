"""Benchmark harness: channel-estimation throughput on the available TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: channel-estimate grid REs/s/chip on the BASELINE.json config[2]
geometry (MMSE smoothing + noise-variance, 4 antenna ports, 106 PRB), batched.
vs_baseline compares against the reference implementation (ce_rule_tensorized /
ce_dl_cnn, torch CPU eager) measured on this machine — see BASELINE_MEASURED.json.

Methodology: this environment's TPU is reached through a relay whose async completion
acks are unreliable for microtiming (block_until_ready can return before execution).
We therefore time a strictly serial chain — a lax.scan whose next input depends on
the previous iteration's FULL channel output — at two different repetition counts and
take the slope (t_hi - t_lo) / (reps_hi - reps_lo). The constant per-call relay
overhead (~30 ms) and fetch latency cancel out; the slope is pure device time per
batch. A warmup call with a scalar fetch precedes every measurement (fetching is
what forces the relay to materialize results).

Per-config details (all five BASELINE.json configs) go to stderr and
BENCH_DETAILS.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srsran_ce_tpu.models import estimator as _est  # noqa: E402
from srsran_ce_tpu.models.plan import make_plan  # noqa: E402
from srsran_ce_tpu.utils import synthetic  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BENCH_CONFIGS = {
    # name -> (case kwargs, batch size)
    "c0_baseline_52prb": (dict(n_prbs=52, n_layers=1, comb=2, scs_hz=15e3), 128),
    "c1_tensorized_52prb": (dict(n_prbs=52, n_layers=1, comb=2, scs_hz=30e3), 64),
    "c2_mmse_4port_106prb": (dict(n_prbs=106, n_layers=4, comb=2, scs_hz=30e3), 128),
    "c3_cnn_273prb": (dict(n_prbs=273, n_layers=1, comb=2, scs_hz=30e3, interp="cnn"), 64),
    "c4_hopped_24prb": (dict(n_prbs=24, n_layers=1, comb=2, scs_hz=30e3, two_hops=True), 128),
}

HEADLINE = "c2_mmse_4port_106prb"
REPS_LO = 8
REPS_HI = 72
TRIALS = 3


def _chained_runner(plan, n_layers, reps):
    """jitted fn running `reps` strictly-serial estimator batches; returns a scalar."""

    def single(r, p, b):
        res = _est._estimate_impl(plan, _est._ri_to_complex(r), _est._ri_to_complex(p), b)
        return _est._complex_to_ri(res.channel_est_rg), res.noise_est

    @jax.jit
    def many(rg_ri, pil_ri, beta):
        def body(rg_c, _):
            ch, nz = jax.vmap(single)(rg_c, pil_ri, beta)
            # Next input depends on the full previous channel output: no reordering,
            # no dead-code elimination, no cross-iteration CSE.
            return rg_c + 1e-12 * ch.sum(axis=-1), jnp.sum(nz)

        rg_f, nzs = jax.lax.scan(body, rg_ri, None, length=reps)
        return rg_f.sum() + nzs.sum()

    return many


def bench_config(name, kwargs, batch):
    case = synthetic.make_case(seed=1234, snr_db=30.0, **kwargs)
    nL = case.pilots.shape[2]
    plan = make_plan(case.hop1, case.hop2, case.config, nL)
    _est.prefetch_plan_constants(plan)

    rg = _est.split_ri(case.received_rg.astype(np.complex64))
    pil = _est.split_ri(case.pilots.astype(np.complex64))
    rg_b = jax.device_put(np.broadcast_to(rg, (batch,) + rg.shape).copy())
    pil_b = jax.device_put(np.broadcast_to(pil, (batch,) + pil.shape).copy())
    beta = jax.device_put(np.ones(batch, np.float32))

    t_compile = time.time()
    times = {}
    for reps in (REPS_LO, REPS_HI):
        fn = _chained_runner(plan, nL, reps)
        r = fn(rg_b, pil_b, beta)
        float(r)  # warmup fetch: forces materialization through the relay
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.time()
            r = fn(rg_b, pil_b, beta)
            jax.block_until_ready(r)
            best = min(best, time.time() - t0)
        times[reps] = best
    compile_s = time.time() - t_compile

    per_batch = (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)
    per_batch = max(per_batch, 1e-9)
    grid_res = case.received_rg.size * nL
    return {
        "latency_ms_per_batch": per_batch * 1e3,
        "batch": batch,
        "problems_per_s": batch / per_batch,
        "res_per_s": batch * grid_res / per_batch,
        "grid_res_per_problem": grid_res,
        "t_lo_s": times[REPS_LO],
        "t_hi_s": times[REPS_HI],
        "setup_s": compile_s,
    }


def main():
    dev = jax.devices()[0]
    log(f"bench device: {dev} ({dev.device_kind})")

    baseline = {}
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline = json.load(f).get("results", {})

    details = {}
    for name, (kwargs, batch) in BENCH_CONFIGS.items():
        try:
            r = bench_config(name, kwargs, batch)
            bl = baseline.get(name, {}).get("res_per_s")
            r["vs_reference_cpu"] = (r["res_per_s"] / bl) if bl else None
            details[name] = r
            log(
                f"{name}: {r['latency_ms_per_batch']:.3f} ms/batch{batch} -> "
                f"{r['res_per_s']:.3e} REs/s"
                + (f" ({r['vs_reference_cpu']:.0f}x reference)" if bl else "")
            )
        except Exception as e:  # keep the bench robust; report what ran
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            details[name] = {"error": str(e)}

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json")
    with open(out_path, "w") as f:
        json.dump({"device": str(dev), "configs": details}, f, indent=2)

    head = details.get(HEADLINE, {})
    value = head.get("res_per_s", 0.0)
    vs = head.get("vs_reference_cpu") or 0.0
    print(
        json.dumps(
            {
                "metric": "channel-estimate REs/s/chip (106PRB 4-port MMSE, batch 128)",
                "value": value,
                "unit": "REs/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
