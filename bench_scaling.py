"""Multi-device scaling-efficiency benchmark (BASELINE.json: '>=80% samples/s
scaling efficiency from 1 chip to N>=2 hosts').

Rows (all written to BENCH_SCALING.json):

  dp weak scaling   — batched estimation on dp meshes of 1..N devices, fixed
                      per-device batch. DEVICE step time measured as the slope of
                      a chained lax.scan (zero per-step host dispatch); HOST
                      dispatch measured separately as eager-loop time minus the
                      device time, with donated pre-sharded device_put inputs.
  sp wideband 273PRB— ONE 273-PRB problem batch sharded over the subcarrier axis
                      (overlap-save halo exchange) at sp = 1/2/4/8. 273 = 3*7*13
                      divides none of these: every multi-shard row exercises the
                      round-3 pad+mask route.
  config4 4096      — BASELINE config[4] verbatim: 4096 concurrent frequency-
                      hopped estimations on the largest dp x sp mesh.

Efficiency accounting on THIS host: the virtual CPU platform time-slices
`os.cpu_count()` physical cores (2 here), so raw weak-scaling efficiency at
N > cores measures host silicon saturation, not the framework (the dp path has
zero cross-device collectives; ideal T_N = T_1 * N / cores once N > cores).
The report therefore carries BOTH: raw efficiency (T1/TN) and core-normalized
device-time efficiency (T1 * min(N, cores)^-1-adjusted ideal / TN), the number
comparable to the >=80% target. On a real pod slice the same code measures
ICI/DCN scaling and raw == normalized (cores >= devices).

Writes BENCH_SCALING.json and prints a one-line JSON summary.
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
from srsran_ce_tpu.parallel import mesh as mesh_lib  # noqa: E402
from srsran_ce_tpu.utils import synthetic  # noqa: E402
from srsran_ce_tpu.utils.profiling import StructuredReport, chained_throughput  # noqa: E402


def _put_sharded(mesh, arr, spec):
    from jax.sharding import NamedSharding

    return jax.device_put(arr, NamedSharding(mesh, spec))


def measure_dp(n_dev: int, per_device_batch: int = 16):
    """(device_s_per_step, host_s_per_step, B, grid_res) on an n_dev dp mesh.

    device_s: chained-scan slope — the per-step cost with NO host round trip.
    host_s:   eager per-step wall time (jitted fn called step-by-step with
              donated pre-sharded inputs) — device_s + dispatch residual.
    """
    from jax.sharding import PartitionSpec as P

    devs = jax.devices()[:n_dev]
    mesh = mesh_lib.make_mesh((n_dev, 1), ("dp", "sp"), devices=devs)
    case = synthetic.make_case(seed=77, n_prbs=52, n_layers=2, comb=2, scs_hz=30e3, snr_db=30.0)
    plan = make_plan(case.hop1, case.hop2, case.config, 2)
    B = per_device_batch * n_dev

    def single(r, p, b):
        res = _est._estimate_impl(plan, _est._ri_to_complex(r), _est._ri_to_complex(p), b)
        return _est._complex_to_ri(res.channel_est_rg), res.noise_est

    step = jax.jit(lambda rg_b, pil_b, beta: jax.vmap(single)(rg_b, pil_b, beta))

    rg = _est.split_ri(case.received_rg.astype(np.complex64))
    pil = _est.split_ri(case.pilots.astype(np.complex64))
    rg_b = _put_sharded(mesh, np.broadcast_to(rg, (B,) + rg.shape).copy(), P("dp"))
    pil_b = _put_sharded(mesh, np.broadcast_to(pil, (B,) + pil.shape).copy(), P("dp"))
    beta = _put_sharded(mesh, np.ones(B, np.float32), P("dp"))

    # device time: chained scan slope (no per-step dispatch)
    def chained(rg_c, pil_b, beta):
        return step(rg_c, pil_b, beta)

    def feedback(carry, out):
        ch, nz = out
        return carry + 1e-12 * ch.sum(axis=-1)

    dev_s = chained_throughput(chained, feedback, (rg_b, pil_b, beta), reps_lo=4, reps_hi=36)

    # host-dispatch-inclusive time: eager jitted steps, sharded resident inputs
    out = step(rg_b, pil_b, beta)
    jax.block_until_ready(out)
    n_iter = 30
    t0 = time.time()
    for _ in range(n_iter):
        out = step(rg_b, pil_b, beta)
    jax.block_until_ready(out)
    host_s = (time.time() - t0) / n_iter

    return dev_s, host_s, B, case.received_rg.size * 2


def measure_sp_wideband(n_sp: int, batch_per_dev: int = 2):
    """SP strong-ish scaling on the 273-PRB wideband config: a fixed small batch
    of problems, each problem's subcarrier axis sharded n_sp ways (halo-exchange
    overlap-save; pad+mask route for every n_sp > 1 since 273 % 2^k != 0).
    Returns (device_s_per_step, B, grid_res)."""
    from jax.sharding import PartitionSpec as P

    from srsran_ce_tpu.parallel.subcarrier import build_sp_batched

    devs = jax.devices()[:n_sp]
    mesh = mesh_lib.make_mesh((1, n_sp), ("dp", "sp"), devices=devs)
    case = synthetic.make_case(
        seed=99, n_prbs=273, n_layers=1, comb=2, scs_hz=30e3, snr_db=30.0
    )
    B = 2  # fixed total batch: the scaling axis is the subcarrier split
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

    dt = chained_throughput(chained, feedback, (rg_b, pil_b, beta), reps_lo=4, reps_hi=20)
    return dt, B, case.received_rg.size * 1


def measure_config4(n_dev: int, total_batch: int = 4096):
    """BASELINE.json config[4] verbatim: `total_batch` concurrent frequency-hopped
    SRS estimations on a dp x sp mesh (replicated-front + sharded-fill route).
    Returns (device_s_per_step, total_batch, grid_res_per_problem)."""
    from srsran_ce_tpu.parallel.subcarrier import build_sp_batched

    n_sp = 2 if n_dev >= 2 else 1
    n_dp = max(1, n_dev // n_sp)
    devs = jax.devices()[: n_dp * n_sp]
    mesh = mesh_lib.make_mesh((n_dp, n_sp), ("dp", "sp"), devices=devs)
    case = synthetic.make_case(
        seed=88, n_prbs=24, n_layers=1, comb=2, scs_hz=30e3, snr_db=30.0, two_hops=True
    )
    B = total_batch
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

    dt = chained_throughput(chained, feedback, (rg_b, pil_b, beta), reps_lo=2, reps_hi=8)
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
    cores = os.cpu_count() or 1
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    report = StructuredReport(kind="scaling", device=f"{platform} x{len(devs)}")

    base_dev = None
    norm_effs = {}
    for n in sizes:
        dev_s, host_s, B, grid_res = measure_dp(n)
        thr = B * grid_res / dev_s  # REs/s at device step time
        if n == 1:
            base_dev = dev_s
        eff_raw = base_dev / dev_s
        # ideal device step time on a `cores`-core host running n virtual devices:
        # T_1 * n / cores once the devices oversubscribe the silicon
        ideal = base_dev * max(1.0, n / cores) if platform == "cpu" else base_dev
        eff_norm = min(ideal / dev_s, 1.0)
        norm_effs[n] = eff_norm
        dispatch = max(host_s - dev_s, 0.0)
        report.add(
            scenario="dp_weak",
            n_devices=n,
            batch=B,
            s_per_step=dev_s,
            host_s_per_step=host_s,
            dispatch_s_per_step=dispatch,
            res_per_s=thr,
            efficiency=eff_raw,
            efficiency_core_normalized=eff_norm,
        )
        print(
            f"dp={n}: device {dev_s*1e3:.3f} ms/step (+{dispatch*1e3:.3f} ms dispatch), "
            f"{thr:.3e} REs/s, eff raw {eff_raw:.2%} / core-normalized {eff_norm:.2%}",
            file=sys.stderr, flush=True,
        )

    # SP wideband 273 PRB: subcarrier split of one problem over 1/2/4/8 shards;
    # every n_sp > 1 exercises the padded (non-divisible) halo-exchange route
    sp_base = None
    for n in sizes:
        try:
            dt, B, grid_res = measure_sp_wideband(n)
            if sp_base is None:
                sp_base = dt
            report.add(
                scenario="sp_wideband_273prb",
                n_devices=n,
                batch=B,
                s_per_step=dt,
                res_per_s=B * grid_res / dt,
                speedup_vs_1shard=sp_base / dt,
            )
            print(
                f"sp273 n_sp={n}: {dt*1e3:.3f} ms/step ({sp_base/dt:.2f}x vs 1 shard)",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            report.add(scenario="sp_wideband_273prb", n_devices=n, error=str(e))
            print(f"sp273 n_sp={n} FAILED: {e}", file=sys.stderr, flush=True)

    # config[4]: 4096 concurrent frequency-hopped problems on the largest mesh
    if len(devs) >= 2:
        for n in [s for s in (2, max(sizes)) if s >= 2][:2]:
            try:
                dt4, B4, res4 = measure_config4(n)
                thr4 = B4 * res4 / dt4
                report.add(
                    scenario="config4_hopped_4096", n_devices=n, batch=B4,
                    s_per_step=dt4, res_per_s=thr4,
                )
                print(
                    f"config4 4096-problem (n={n}): {dt4*1e3:.1f} ms/step, {thr4:.3e} REs/s",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:
                report.add(scenario="config4_hopped_4096", n_devices=n, error=str(e))
                print(f"config4 (n={n}) FAILED: {e}", file=sys.stderr, flush=True)

    report.meta = {
        "per_device_batch": 16,
        "config": "52PRB 2-layer filter+CFO (dp rows)",
        "mode": "weak-scaling (dp) + subcarrier split (sp273) + 4096-problem (config4)",
        "physical_cores": cores,
        "caveat": (
            f"virtual CPU devices time-slice {cores} physical cores; raw efficiency at "
            f"N > {cores} devices measures host-silicon saturation, not the framework "
            "(the dp path has zero cross-device collectives). "
            "efficiency_core_normalized divides by the ideal T_1*N/cores step time and "
            "is the number comparable to the >=80% target; device step time (chained "
            "scan slope) and host dispatch are reported separately per row."
            if platform == "cpu"
            else "real accelerator mesh"
        ),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json")
    report.write(out)
    n_head = max(sizes)
    eff = norm_effs[n_head]
    print(json.dumps({
        "metric": (
            f"dp weak-scaling efficiency at {n_head} devices "
            f"({platform}, core-normalized device time)"
        ),
        "value": eff,
        "unit": "fraction",
        "vs_baseline": eff / 0.8,  # target is >= 80%
    }))


if __name__ == "__main__":
    main()
