"""Tracing / profiling / throughput measurement (SURVEY.md §5 'Tracing/profiling').

The reference's only introspection was Dynamo graph accounting
(diagnose_furiosa_backend.py:169-188). TPU-native equivalents here:

  trace()            — context manager around jax.profiler for TensorBoard traces
  hlo_op_stats()     — per-op counts from the lowered StableHLO (cost visibility)
  chained_throughput — the slope-based device-time measurement used by bench.py,
                       packaged as a library utility (robust to async-ack runtimes)
  StructuredReport   — JSON-able run reports (per-config metrics)
"""
from __future__ import annotations

import collections
import contextlib
import json
import time
from dataclasses import asdict, dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def robust_slope_stats(slopes, floor: float = 1e-9):
    """THE min-of-K aggregation policy (one implementation — bench.py imports
    this; round-4 had two near-copies that could drift). A clamped/negative
    fit (<=10 ns) is always discarded. An estimate below 0.7x the median
    survives ONLY if corroborated by a second independent estimate within
    10% — r04's c0 row published 44.7e9 REs/s from a min-of-4 fit (0.025 ms)
    40% below ALL THREE of its siblings; the old 0.3x-median discard passed
    it. Pollution only ever ADDS time, so an uncorroborated too-fast fit is
    a broken fit, not a fast device.

    Returns (s_min, spread, n_discarded, good)."""
    sl = [s for s in slopes if s > 1e-8]
    med = float(np.median(sl)) if sl else floor
    good = [
        s
        for i, s in enumerate(sl)
        if s >= 0.7 * med
        or any(j != i and abs(o - s) <= 0.10 * s for j, o in enumerate(sl))
    ] or sl or [floor]
    s_min = min(good)
    spread = (max(good) - s_min) / max(s_min, 1e-12)
    return s_min, spread, len(slopes) - len(good), good


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/srsce_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def hlo_op_stats(lowered) -> Dict[str, int]:
    """Count StableHLO ops in a lowered (pre-compile) computation."""
    ops = collections.Counter()
    for line in lowered.as_text().splitlines():
        line = line.strip()
        if "=" in line and not line.startswith(("//", "module", "func", "}")):
            rhs = line.split("=", 1)[1].strip()
            op = rhs.split(" ", 1)[0].split("(")[0]
            if op.startswith(("stablehlo.", "mhlo.", "chlo.")) or "." not in op:
                ops[op] += 1
    return dict(ops)


def chained_throughput(
    step_fn: Callable,
    feedback_fn: Callable,
    args: tuple,
    carry_index: int = 0,
    reps_lo: int = 8,
    reps_hi: int = 72,
    trials: int = 3,
) -> float:
    """Seconds per step_fn call, measured as the REPS-scaling slope of a strictly
    serial lax.scan chain (next input depends on previous output via feedback_fn).

    Robust to runtimes whose async completion acks fire before execution: constant
    per-call overhead and fetch latency cancel in the slope. A scalar fetch after
    warmup forces materialization.

    step_fn(*args) -> output pytree; feedback_fn(carry, output) -> new carry for
    args[carry_index].
    """

    def make(reps):
        @jax.jit
        def many(*a):
            def body(carry, _):
                cur = list(a)
                cur[carry_index] = carry
                out = step_fn(*cur)
                return feedback_fn(carry, out), 0.0
            final, _ = jax.lax.scan(body, a[carry_index], None, length=reps)
            return jnp.sum(final)

        return many

    return chained_slope_stats(
        step_fn, feedback_fn, args, carry_index, reps_lo, reps_hi, trials, k=1
    )["s_per_step"]


def chained_slope_stats(
    step_fn: Callable,
    feedback_fn: Callable,
    args: tuple,
    carry_index: int = 0,
    reps_lo: int = 8,
    reps_hi: int = 72,
    trials: int = 3,
    k: int = 3,
) -> dict:
    """`chained_throughput` with K INDEPENDENT slope estimates (fresh passes over
    the same pre-compiled chain executables, separated in wall-clock time).

    This environment's relay shows ~20% run-to-run slope variance (and
    occasional 2-5x excursions from pooled machine state); a single estimate
    recorded as THE number scores luck. Pollution only ever ADDS time, so the
    minimum of K estimates is the best available device-time estimator; the
    spread quantifies how (un)stable the measurement period was.

    Returns {"s_per_step": min, "slopes": [k floats], "spread": (max-min)/min}.
    """

    def make(reps):
        @jax.jit
        def many(*a):
            def body(carry, _):
                cur = list(a)
                cur[carry_index] = carry
                out = step_fn(*cur)
                return feedback_fn(carry, out), 0.0
            final, _ = jax.lax.scan(body, a[carry_index], None, length=reps)
            return jnp.sum(final)

        return many

    def measure(lo, hi, fns):
        times = {}
        for reps in (lo, hi):
            best = float("inf")
            for _ in range(trials):
                t0 = time.time()
                r = fns[reps](*args)
                jax.block_until_ready(r)
                best = min(best, time.time() - t0)
            times[reps] = best
        return max((times[hi] - times[lo]) / (hi - lo), 1e-12), times

    build_s = [0.0]

    def build(lo, hi):
        t0 = time.time()
        fns = {}
        for reps in (lo, hi):
            fns[reps] = make(reps)
            float(fns[reps](*args))  # compile + force materialization via the relay
        build_s[0] = time.time() - t0
        return fns

    def aggregate(slopes):
        s_min, spread, n_disc, _good = robust_slope_stats(slopes, floor=1e-12)
        return s_min, spread, n_disc

    lo, hi = reps_lo, reps_hi
    fns = build(lo, hi)
    # Chain-length escalation: when the slope contributes <30% of the longest
    # chain's wall time, the fit is mostly relay-latency jitter (measured to
    # produce 10x-low garbage on fast rows) — lengthen the chain up to 16x.
    s, times = measure(lo, hi, fns)
    for _ in range(2):
        if s > 0.3 * times[hi] / hi:
            break
        hi *= 4
        fns = build(lo, hi)
        s, times = measure(lo, hi, fns)
    slopes = [s]
    for _ in range(max(1, k) - 1):
        s, _ = measure(lo, hi, fns)
        slopes.append(s)
    s_min, spread, n_disc = aggregate(slopes)
    # Post-hoc spread escalation (round 5: no row publishes with a >10%
    # spread while a longer chain can fix it): archive the noisy pool,
    # lengthen the chain, take k fresh estimates.
    archived = []
    escalations = 0
    while spread > 0.10 and escalations < 2 and build_s[0] < 120.0:
        # (the build-time guard keeps slow-compiling chains — e.g. the BG1
        # Z=384 gather tier, ~minutes per rep count — from doubling the
        # bench's wall clock chasing relay drift; their spread is documented)
        hi *= 4
        fns = build(lo, hi)
        archived += slopes
        slopes = []
        for _ in range(max(1, k)):
            s, _ = measure(lo, hi, fns)
            slopes.append(s)
        escalations += 1
        s_min, spread, n_disc = aggregate(slopes)
    return {
        "s_per_step": s_min,
        "slopes": slopes,
        "archived_slopes": archived,
        "escalations": escalations,
        "n_discarded": n_disc,
        "spread": spread,
    }


@dataclass
class StructuredReport:
    """JSON-able run report: the framework's structured observability output
    (replacing the reference's print-based reporting, SURVEY.md §5)."""

    kind: str  # "bench" | "conformance" | "scaling"
    device: str
    entries: List[dict] = field(default_factory=list)
    meta: dict = field(default_factory=dict)

    def add(self, **kv) -> None:
        self.entries.append(kv)

    def write(self, path) -> None:
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=2)
