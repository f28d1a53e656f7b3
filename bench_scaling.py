"""Multi-device scaling-efficiency benchmark (BASELINE.json: '>=80% samples/s
scaling efficiency from 1 chip to N>=2 hosts').

Measures batched estimation throughput on dp meshes of 1..N devices (fixed
per-device batch — weak scaling) and reports efficiency_N = T_N / (N * T_1).

On this environment only ONE real TPU chip is reachable, so with a single device the
harness falls back to the 8-way virtual CPU platform to exercise the full sharded
measurement path; the report records which platform produced the numbers. On a real
pod slice, run under `jax.distributed` and the same code measures ICI/DCN scaling.

Writes BENCH_SCALING.json and prints a one-line JSON summary.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srsran_ce_tpu.models import estimator as _est  # noqa: E402
from srsran_ce_tpu.models.plan import make_plan  # noqa: E402
from srsran_ce_tpu.parallel import mesh as mesh_lib  # noqa: E402
from srsran_ce_tpu.parallel.data_parallel import build_dp_batched  # noqa: E402
from srsran_ce_tpu.utils import synthetic  # noqa: E402
from srsran_ce_tpu.utils.profiling import StructuredReport, chained_throughput  # noqa: E402


def measure(n_dev: int, per_device_batch: int = 16) -> float:
    """Seconds per batched step on an n_dev dp mesh (weak scaling)."""
    devs = jax.devices()[:n_dev]
    mesh = mesh_lib.make_mesh((n_dev, 1), ("dp", "sp"), devices=devs)
    case = synthetic.make_case(seed=77, n_prbs=52, n_layers=2, comb=2, scs_hz=30e3, snr_db=30.0)
    plan = make_plan(case.hop1, case.hop2, case.config, 2)
    B = per_device_batch * n_dev

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sh = NamedSharding(mesh, P("dp"))

    def single(r, p, b):
        res = _est._estimate_impl(plan, _est._ri_to_complex(r), _est._ri_to_complex(p), b)
        return _est._complex_to_ri(res.channel_est_rg), res.noise_est

    def step(rg_b, pil_b, beta):
        ch, nz = jax.vmap(single)(rg_b, pil_b, beta)
        return ch, nz

    rg = _est.split_ri(case.received_rg.astype(np.complex64))
    pil = _est.split_ri(case.pilots.astype(np.complex64))
    rg_b = jax.device_put(np.broadcast_to(rg, (B,) + rg.shape).copy(), batch_sh)
    pil_b = jax.device_put(np.broadcast_to(pil, (B,) + pil.shape).copy(), batch_sh)
    beta = jax.device_put(np.ones(B, np.float32), batch_sh)

    def chained(rg_c, pil_b, beta):
        ch, nz = step(rg_c, pil_b, beta)
        return ch, nz

    def feedback(carry, out):
        ch, nz = out
        return carry + 1e-12 * ch.sum(axis=-1)

    dt = chained_throughput(chained, feedback, (rg_b, pil_b, beta), reps_lo=4, reps_hi=36)
    return dt, B, case.received_rg.size * 2


def measure_config4(n_dev: int, per_device_batch: int = 8) -> float:
    """BASELINE.json config[4]: frequency-hopped SRS problems on a dp x sp mesh
    (replicated-front + sharded-fill route, parallel/subcarrier.HoppedShardPlan).
    Returns (s_per_step, total_batch, grid_res_per_problem)."""
    from srsran_ce_tpu.parallel.subcarrier import build_sp_batched

    n_sp = 2
    n_dp = max(1, n_dev // n_sp)
    devs = jax.devices()[: n_dp * n_sp]
    mesh = mesh_lib.make_mesh((n_dp, n_sp), ("dp", "sp"), devices=devs)
    case = synthetic.make_case(
        seed=88, n_prbs=24, n_layers=1, comb=2, scs_hz=30e3, snr_db=30.0, two_hops=True
    )
    B = per_device_batch * n_dp
    fn = build_sp_batched(case.hop1, case.hop2, case.config, 1, mesh)
    rg = _est.split_ri(case.received_rg.astype(np.complex64))
    pil = _est.split_ri(case.pilots.astype(np.complex64))
    rg_b = np.broadcast_to(rg, (B,) + rg.shape).copy()
    pil_b = np.broadcast_to(pil, (B,) + pil.shape).copy()
    beta = np.ones(B, np.float32)

    def chained(rg_c, pil_b, beta):
        out = fn(rg_c, pil_b, beta)
        return out.channel_est_rg, out.noise_est

    def feedback(carry, out):
        ch, nz = out
        return carry + 1e-12 * ch.sum(axis=-1)

    dt = chained_throughput(chained, feedback, (rg_b, pil_b, beta), reps_lo=4, reps_hi=36)
    return dt, B, case.received_rg.size * 1


def main():
    if os.environ.get("SRSCE_SCALING_SUBPROCESS") != "1" and len(jax.devices()) < 2:
        # Single-chip environment: the multi-device sweep needs the 8-way virtual
        # CPU platform, and the platform cannot be switched once this process has
        # initialized a backend (jax.devices() above) — re-exec in a clean
        # subprocess. (A config.update after backend init silently keeps the old
        # platform and the sweep would "measure" 1 device at efficiency 1.0.)
        import subprocess

        env = dict(
            os.environ,
            SRSCE_SCALING_SUBPROCESS="1",
            JAX_PLATFORMS="cpu",
            PYTHONPATH="",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8",
        )
        sys.exit(subprocess.run([sys.executable, os.path.abspath(__file__)], env=env).returncode)

    devs = jax.devices()
    platform = devs[0].platform
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    report = StructuredReport(kind="scaling", device=f"{platform} x{len(devs)}")

    base = None
    for n in sizes:
        dt, B, grid_res = measure(n)
        thr = B * grid_res / dt  # REs/s
        if n == 1:
            base = thr
        eff = thr / (n * base) if base else float("nan")
        report.add(n_devices=n, batch=B, s_per_step=dt, res_per_s=thr, efficiency=eff)
        print(f"dp={n}: {dt*1e3:.3f} ms/step, {thr:.3e} REs/s, efficiency {eff:.2%}", file=sys.stderr, flush=True)

    # config[4]: frequency-hopped problems on a (dp, sp=2) mesh — structural
    # coverage of the hopped sharded route at the largest mesh
    if len(devs) >= 2:
        for n in [s for s in (2, max(sizes)) if s >= 2][:2]:
            dt4, B4, res4 = measure_config4(n)
            thr4 = B4 * res4 / dt4
            report.add(
                scenario="config4_hopped_dpxsp", n_devices=n, batch=B4,
                s_per_step=dt4, res_per_s=thr4,
            )
            print(
                f"config4 dp x sp (n={n}): {dt4*1e3:.3f} ms/step, {thr4:.3e} REs/s",
                file=sys.stderr, flush=True,
            )

    report.meta = {
        "per_device_batch": 16,
        "config": "52PRB 2-layer filter+CFO",
        "mode": "weak-scaling",
        "caveat": (
            "virtual CPU devices oversubscribe the host's physical cores, so "
            "efficiency there reflects host saturation, not the framework: the DP "
            "path has zero cross-device collectives. Interpret sub-100% CPU numbers "
            "accordingly; on a real pod slice this measures ICI/DCN scaling."
            if platform == "cpu"
            else "real accelerator mesh"
        ),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json")
    report.write(out)
    # Headline entry: on the virtual CPU platform, the largest device count that
    # does not oversubscribe the physical cores (beyond that the "devices" time-
    # slice the same silicon and efficiency measures host saturation, not the
    # framework — all entries are still recorded in BENCH_SCALING.json).
    dp_rows = [e for e in report.entries if "efficiency" in e]
    if platform == "cpu":
        cores = os.cpu_count() or 1
        eligible = [e for e in dp_rows if e["n_devices"] <= cores]
        last = eligible[-1] if eligible else dp_rows[-1]
    else:
        last = dp_rows[-1]
    # Clamp the headline to 1.0: XLA-CPU intra-op threading lets a 1-"device" run
    # use several cores, which can make small-N efficiency superlinear/noisy. Raw
    # values stay in BENCH_SCALING.json.
    eff = min(float(last["efficiency"]), 1.0)
    print(json.dumps({
        "metric": f"dp weak-scaling efficiency at {last['n_devices']} devices ({platform})",
        "value": eff,
        "unit": "fraction",
        "vs_baseline": eff / 0.8,  # target is >= 80%
    }))


if __name__ == "__main__":
    main()
