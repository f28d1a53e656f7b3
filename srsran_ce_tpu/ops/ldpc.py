"""Batched QC-LDPC soft decoder (normalized min-sum) + GF(2) systematic encoder.

Completes the coded uplink chain past the reference's endpoint: the reference
stops at the channel estimate (ce_rule_baseline.py:761-768); this framework
already adds MMSE equalization (ops/equalize) and exact max-log LLRs
(ops/demap), and here those soft bits are actually *decoded*. The decoder is
the standard flooding normalized-min-sum over a quasi-cyclic parity-check
matrix — the code family used by 5G NR PUSCH (TS 38.212 §5.3.2) — built
TPU-first:

- **Plan-time staticization** (same principle as models/plan.py): the entire
  Tanner-graph wiring — edge tables, cyclic shifts, check-node slot padding,
  the GF(2)-eliminated systematic encoder — is computed once in numpy from
  the (base matrix, lifting size) pair and unrolled as STATIC ops; one code
  = one compiled program, with no index tables at runtime at all.
- **Batch-last check-frame layout** `(n_checks_base, max_degree, Z, batch)`:
  the BATCH of codewords rides the 128-lane vector dim (always full lanes, for
  any lifting size), Z rides the sublanes, and every cyclic shift in the
  quasi-cyclic structure becomes a STATIC roll over the z axis — two
  major-axis slices + a concat that XLA folds into the consumer's addressing,
  never a gather and never a lane shuffle. Measured on v5e vs the natural
  batch-leading form with index-table gathers/scatters: 3.5x at Z=61 and
  5.6x at Z=389 (262-306 info Mb/s at 25 iterations). Messages never exist
  "per edge scalar" — every op is a full-lane elementwise or a small-axis
  reduction; there is no per-node work, no sparse matrices, no
  data-dependent control flow.
- **Static iteration count** via `lax.scan` (the XLA-friendly schedule; a
  data-dependent early-exit would force `while_loop` and kill cross-iteration
  fusion). The returned `ok` flag reports the final parity check, so callers
  get the early-termination *signal* without the dynamic control flow.

The code is described by its base matrix (entries: -1 = no edge, s >= 0 =
identity cyclically shifted by s) and lifting size Z, exactly the TS 38.212
representation — NR base graphs drop in as literal shift tables. Since those
spec tables are not available in this environment, `array_code` provides the
classic Fossorier array-LDPC construction (shift[i][j] = i*j mod Z, Z prime,
girth >= 6) as a strong built-in family for tests and link-level evaluation.

Conventions match ops/demap: LLR > 0 means bit 0 likelier (3GPP soft-bit
sign), so hard decisions are `posterior < 0`. int8 LLRs from the fused
receiver demap feed straight in (cast to float; min-sum is scale-invariant so
the int8 quantization scale does not even need to be undone).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "QCLdpcCode",
    "array_code",
    "LdpcPlan",
    "make_ldpc_plan",
    "encode",
    "build_decoder",
    "decode_reference",
    "default_layered_group",
    "DecodeResult",
]

_BIG = 1e30  # mask value for padded check-node slots (never wins a min)


@dataclass(frozen=True)
class QCLdpcCode:
    """A quasi-cyclic LDPC code: `base[i][j]` is -1 (no block) or a cyclic
    shift in [0, z); the parity-check matrix is the base matrix with every
    entry s expanded to the ZxZ identity rolled so row a has its one at
    column (a + s) mod z. Frozen + hashable -> plan/jit cache key (the same
    pattern as config.EstimatorConfig)."""

    base: Tuple[Tuple[int, ...], ...]
    z: int

    @property
    def n_check_blocks(self) -> int:
        return len(self.base)

    @property
    def n_var_blocks(self) -> int:
        return len(self.base[0])

    @property
    def n(self) -> int:
        """Codeword length in bits."""
        return self.n_var_blocks * self.z

    @property
    def k(self) -> int:
        """Information length in bits (n - rank(H); QC expansions can be
        rank-deficient, e.g. array codes lose mb-1 dependent rows)."""
        return make_ldpc_plan(self).k


def array_code(n_check_blocks: int, n_var_blocks: int, z: int) -> QCLdpcCode:
    """Fossorier array-LDPC construction: shift(i, j) = (i * j) mod z with z
    prime and n_var_blocks <= z gives a (n_check_blocks, n_var_blocks)-regular
    QC code of girth >= 6. A solid classical family; NR base graphs (TS 38.212
    tables 5.3.2-2/-3) plug into QCLdpcCode directly when available."""
    assert 2 <= n_check_blocks <= n_var_blocks <= z, (n_check_blocks, n_var_blocks, z)
    assert all(z % p for p in range(2, int(z**0.5) + 1)), f"z={z} must be prime"
    base = tuple(
        tuple((i * j) % z for j in range(n_var_blocks)) for i in range(n_check_blocks)
    )
    return QCLdpcCode(base=base, z=z)


def load_base_graph(path, z: int) -> QCLdpcCode:
    """Load a QC base graph from JSON and lift at Z = `z`.

    Format: {"base": [[...], ...]} (or a bare 2-D list), entries -1 for "no
    block" or a shift value; shifts are reduced mod z, the TS 38.212 §5.3.2
    lifting rule (the spec tables give V_{i,j} for the max Z of a set; the
    applied shift is V mod Z). This is the drop-in point for the NR BG1/BG2
    tables — not bundled here because the spec tables are unavailable in this
    environment; export them to JSON and every decoder tier (XLA, both pallas
    layouts), the encoder and the transport layer work unchanged."""
    import json
    import pathlib

    raw = json.loads(pathlib.Path(path).read_text())
    base = raw["base"] if isinstance(raw, dict) else raw
    rows = tuple(
        tuple(-1 if int(s) < 0 else int(s) % int(z) for s in row) for row in base
    )
    assert len({len(r) for r in rows}) == 1, "ragged base matrix"
    return QCLdpcCode(base=rows, z=int(z))


def _expand_h(code: QCLdpcCode) -> np.ndarray:
    """Dense (m, n) uint8 parity-check matrix (plan-time only)."""
    mb, nb, z = code.n_check_blocks, code.n_var_blocks, code.z
    h = np.zeros((mb * z, nb * z), np.uint8)
    rows = np.arange(z)
    for i in range(mb):
        for j, s in enumerate(code.base[i]):
            if s >= 0:
                h[i * z + rows, j * z + (rows + s) % z] = 1
    return h


def _detect_nr_structure(code: QCLdpcCode):
    """Detect the NR base-graph encoding structure (TS 38.212 §5.3.2 shape):
    kb = nb - mb systematic block-columns, 4 core parity columns kb..kb+3 where
    col kb has 3 entries in the first 4 rows (two shifts equal, one unique) and
    cols kb+1..kb+3 form the shift-0 double-diagonal staircase, then an identity
    parity extension (row i >= 4 owns col kb+i at shift 0 and touches only
    columns < kb+4 otherwise). Returns the unique col-kb shift, or None.

    This is what makes encoding O(edges * z) instead of a dense GF(2)
    elimination of the expanded H — for BG1 at Z=384 (n=26112) the dense path
    is minutes of plan build and a 17664x8448 dense generator; the structured
    path is a handful of np.rolls. Official 3GPP tables and ops/nr_ldpc's
    structured stand-ins both satisfy it.
    """
    mb, nb, z = code.n_check_blocks, code.n_var_blocks, code.z
    kb = nb - mb
    if kb < 1 or mb < 5:
        return None
    base = [list(r) for r in code.base]
    # only the CORE rows 0..3 constrain the staircase/col-kb patterns —
    # extension rows may (and in the official tables do) also touch the core
    # parity columns; they are handled after p0..p3 are known.
    col4 = lambda j: [(i, base[i][j]) for i in range(4) if base[i][j] >= 0]
    stair = ({(0, 0), (1, 0)}, {(1, 0), (2, 0)}, {(2, 0), (3, 0)})
    for j, want in zip(range(kb + 1, kb + 4), stair):
        if set(col4(j)) != want:
            return None
    # col kb: 3 entries in the core rows, two equal shifts + one unique
    ckb = col4(kb)
    if len(ckb) != 3:
        return None
    shifts = sorted(s for _, s in ckb)
    if shifts[0] == shifts[1] and shifts[1] != shifts[2]:
        s_unique = shifts[2]
    elif shifts[1] == shifts[2] and shifts[0] != shifts[1]:
        s_unique = shifts[0]
    else:
        return None
    # core rows confined to cols < kb+4; extension rows = identity + cols < kb+4
    for i in range(4):
        if any(base[i][j] >= 0 for j in range(kb + 4, nb)):
            return None
    for i in range(4, mb):
        if base[i][kb + i] != 0:
            return None
        if any(base[i][j] >= 0 for j in range(kb + 4, nb) if j != kb + i):
            return None
    return s_unique


def _roll_last(x: np.ndarray, s: int) -> np.ndarray:
    return np.roll(x, s, axis=-1)


def _encode_structured(code: QCLdpcCode, s_unique: int, u: np.ndarray) -> np.ndarray:
    """NR-structured systematic encode (see _detect_nr_structure): core parity
    p0 by XORing the 4 core rows (staircase cancels pairwise, the two equal
    col-kb shifts cancel, leaving P^{s_unique} p0 = sum of core syndromes),
    then p1..p3 by the staircase recurrence, then the identity extension."""
    mb, nb, z = code.n_check_blocks, code.n_var_blocks, code.z
    kb = nb - mb
    base = code.base
    u = np.asarray(u, np.uint8)
    lead = u.shape[:-1]
    s_blk = u.reshape(lead + (kb, z))

    def syndrome(i, blocks):
        """XOR_j roll(x_j, -shift_ij) over the given {col: bits} dict."""
        acc = np.zeros(lead + (z,), np.uint8)
        for j, x in blocks.items():
            sh = base[i][j]
            if sh >= 0:
                acc ^= _roll_last(x, -sh)
        return acc

    sys_blocks = {j: s_blk[..., j, :] for j in range(kb)}
    lam = [syndrome(i, sys_blocks) for i in range(4)]
    p0 = _roll_last(lam[0] ^ lam[1] ^ lam[2] ^ lam[3], s_unique)
    t = []
    for i in range(3):
        ti = lam[i]
        if base[i][kb] >= 0:
            ti = ti ^ _roll_last(p0, -base[i][kb])
        t.append(ti)
    p1 = t[0]
    p2 = t[1] ^ p1
    p3 = t[2] ^ p2
    par = {kb: p0, kb + 1: p1, kb + 2: p2, kb + 3: p3}
    out = np.zeros(lead + (nb, z), np.uint8)
    out[..., :kb, :] = s_blk
    for j, x in par.items():
        out[..., j, :] = x
    for i in range(4, mb):
        out[..., kb + i, :] = syndrome(i, {**sys_blocks, **par})
    return out.reshape(lead + (nb * z,))


class LdpcPlan:
    """Static decode/encode tables for one code (all numpy, built once).

    Decoder wiring (check frame, D = max check degree in blocks):
      slot_var   (mb, D)    int32  variable-block index per slot (0 for pads)
      slot_shift (mb, D)    int32  cyclic shift per slot
      slot_valid (mb, D)    bool   real edge?
      edges                 list of (check_block, slot, var_block, shift) for
                            every real edge, row-major — the static unroll
                            order shared by the TPU decoder and the numpy
                            reference (same order => same float association)
    Check lane a of block row i reads variable (var, (a + shift) mod z); in
    the batch-last layout that is roll(var_block, -shift) on the z axis, and
    the transpose direction (variable p accumulating check messages) is
    roll(+shift).
    Encoder (GF(2) reduced row echelon of the expanded H):
      info_cols   (k,)      non-pivot columns = systematic info positions
      parity_cols (rank,)   pivot columns
      parity_gen  (rank, k) uint8: codeword[parity_cols] = parity_gen @ u mod 2
    """

    def __init__(self, code: QCLdpcCode):
        mb, nb, z = code.n_check_blocks, code.n_var_blocks, code.z
        self.code = code
        degs = [sum(s >= 0 for s in row) for row in code.base]
        assert min(degs) >= 2, "degree-1 check rows are not a valid LDPC"
        d = max(degs)
        self.max_degree = d
        self.slot_var = np.zeros((mb, d), np.int32)
        self.slot_shift = np.zeros((mb, d), np.int32)
        self.slot_valid = np.zeros((mb, d), bool)
        for i, row in enumerate(code.base):
            t = 0
            for j, s in enumerate(row):
                if s >= 0:
                    self.slot_var[i, t] = j
                    self.slot_shift[i, t] = s
                    self.slot_valid[i, t] = True
                    t += 1
        self.edges = [
            (i, t, int(self.slot_var[i, t]), int(self.slot_shift[i, t]))
            for i in range(mb)
            for t in range(d)
            if self.slot_valid[i, t]
        ]

        # --- systematic encoder ---
        self.nr_structure = _detect_nr_structure(code)
        if self.nr_structure is not None:
            # NR shape: full-rank by construction (double diagonal + identity
            # extension are triangular in the parity part); encode() goes
            # through the O(edges * z) structured path, no dense elimination.
            self.rank = mb * z
            self.k = (nb - mb) * z
            self.info_cols = np.arange(self.k, dtype=np.int64)
            self.parity_cols = np.arange(self.k, nb * z, dtype=np.int64)
            self.parity_gen = None
            return

        # generic QC codes: GF(2) reduced row echelon of the expanded H
        h = _expand_h(code)
        m, n = h.shape
        r = 0
        pivots = []
        for c in range(n):
            hit = np.nonzero(h[r:, c])[0]
            if hit.size == 0:
                continue
            p = r + hit[0]
            if p != r:
                h[[r, p]] = h[[p, r]]
            elim = np.nonzero(h[:, c])[0]
            elim = elim[elim != r]
            h[elim] ^= h[r]
            pivots.append(c)
            r += 1
            if r == m:
                break
        self.rank = r
        self.parity_cols = np.asarray(pivots, np.int64)
        mask = np.ones(n, bool)
        mask[self.parity_cols] = False
        self.info_cols = np.nonzero(mask)[0]
        self.k = n - r
        # row i of the RREF: c[pivot_i] + sum_j R[i, info_j] c[info_j] = 0
        self.parity_gen = h[: self.rank][:, self.info_cols].copy()


@functools.lru_cache(maxsize=None)
def make_ldpc_plan(code: QCLdpcCode) -> LdpcPlan:
    return LdpcPlan(code)


def encode(code: QCLdpcCode, u: np.ndarray) -> np.ndarray:
    """Systematic encode: info bits u (..., k) in {0,1} -> codewords (..., n)
    in the natural (decoder) bit order; `plan.info_cols` positions carry u
    verbatim. Host-side numpy (transmitters live on the host in this
    framework, like demap.modulate)."""
    plan = make_ldpc_plan(code)
    u = np.asarray(u, np.uint8)
    assert u.shape[-1] == plan.k, (u.shape, plan.k)
    if plan.nr_structure is not None:
        return _encode_structured(code, plan.nr_structure, u)
    c = np.zeros(u.shape[:-1] + (code.n,), np.uint8)
    c[..., plan.info_cols] = u
    c[..., plan.parity_cols] = (u @ plan.parity_gen.T) % 2
    return c


@jax.tree_util.register_dataclass
@dataclass
class DecodeResult:
    """bits: hard decisions (..., n) uint8; info: (..., k) uint8 systematic
    payload; ok: (...) bool — parity check satisfied (all syndromes zero);
    posterior: (..., n) float soft outputs (same sign convention as input)."""

    bits: jnp.ndarray
    info: jnp.ndarray
    ok: jnp.ndarray
    posterior: jnp.ndarray


# Live-row model vs the ~16 MB scoped-vmem compiler limit: the measured stack
# allocation runs ~2x the model (the sweep's transient v2c/acc values overlap
# the carry), so the model budget is half the hardware limit with margin.
_PALLAS_VMEM_BUDGET = 7 * 2**20

# the streamed kernel's own budget — measured looser than the unrolled
# kernels' half-limit rule (see _stream_layout's calibration note)
_STREAM_VMEM_BUDGET = 9 * 2**20


def _pallas_live_rows(code: QCLdpcCode) -> int:
    """Live (z,)-row count of the VMEM-resident kernel per batch tile: one
    row per edge (the c2v carry) + 2*nb rows (ch + posterior accumulator).
    Computed straight off the base matrix — the layout gate must not force a
    plan build (the plan's GF(2) elimination is expensive for huge codes that
    are only being REJECTED here)."""
    n_edges = sum(s >= 0 for row in code.base for s in row)
    return n_edges + 2 * code.n_var_blocks


def _pallas_layout(code: QCLdpcCode):
    """Pick the VMEM-resident kernel layout for this code, or None if even
    the smallest tile exceeds the scoped-VMEM budget.

    Returns (z_axis, block_b): sublane-z (z_axis=0, 128-lane batch tile, the
    fast layout) when the live set fits; otherwise lane-z (z_axis=1) with the
    largest batch-sublane tile in {32, 16, 8} that fits — Z moves to the lane
    dim so the live set shrinks with the tile instead of being padded to 128
    lanes."""
    rows = _pallas_live_rows(code)
    z8 = -(-code.z // 8) * 8
    if rows * z8 * 128 * 4 <= _PALLAS_VMEM_BUDGET:
        return (0, 128)
    z128 = -(-code.z // 128) * 128
    for block_b in (32, 16, 8):
        if rows * block_b * z128 * 4 <= _PALLAS_VMEM_BUDGET:
            return (1, block_b)
    return None


def _pallas_vmem_fits(code: QCLdpcCode) -> bool:
    return _pallas_layout(code) is not None


def _stream_layout(code: QCLdpcCode, c2v_bf16: bool = False, group: int = 1):
    """Pick the streamed tier's batch tile, or None if even the smallest tile
    blows the VMEM budget. Z is padded to whole 128-lane registers inside the
    kernel (round-5: the dynamic `pltpu.roll` lane rotation needs
    whole-register lengths, so the kernel rotates the padded axis twice and
    lane-selects — ANY lifting size is now eligible; the round-4 z%128 gate
    left BG1 Z∈{192..352} on the 3 Mb/s gather tier).

    Live set per tile: c2v scratch (n_edges+1 rows, f32 or bf16) + the in/out
    L tiles (2*nb rows f32), all (block_b, z_pad). Grouped layering (G rows
    per posterior snapshot) adds ~3*G*d transient rows of stack. The budget
    is calibrated by on-chip measurement (round 5, nr_ldpc BG1 stand-in,
    408 edges): f32 block 16 (13.4 MB model) fails the Mosaic compile while
    bf16 block 16 (8.4 MB model) compiles and runs payload-exact at
    358 Mb/s — the streamed kernel's transients are leaner than the unrolled
    kernel's, so it gets its own 9 MB budget rather than the 7 MB
    half-limit rule."""
    z_pad = -(-code.z // 128) * 128
    n_edges = sum(s >= 0 for row in code.base for s in row)
    d = max(sum(s >= 0 for s in row) for row in code.base)
    c2v_item = 2 if c2v_bf16 else 4
    per_col = (n_edges + 1) * c2v_item + 2 * code.n_var_blocks * 4
    per_col += 3 * max(0, group - 1) * d * 4  # grouped-snapshot transients
    for block_b in (32, 16, 8):
        if per_col * block_b * z_pad <= _STREAM_VMEM_BUDGET:
            return block_b
    return None


def _stream_supported(
    code: QCLdpcCode, group: int = 1, c2v_bf16: bool = False
) -> bool:
    return _stream_layout(code, c2v_bf16=c2v_bf16, group=group) is not None


def _stream_vmem_bytes(code: QCLdpcCode, group: int = 1, c2v_bf16: bool = False) -> int:
    """Smallest-tile (block 8) footprint of the STREAM model — for error text."""
    z_pad = -(-code.z // 128) * 128
    n_edges = sum(s >= 0 for row in code.base for s in row)
    d = max(sum(s >= 0 for s in row) for row in code.base)
    per_col = (n_edges + 1) * (2 if c2v_bf16 else 4) + 2 * code.n_var_blocks * 4
    per_col += 3 * max(0, group - 1) * d * 4
    return per_col * 8 * z_pad


# Compile-budget bound for the STATIC-UNROLL formulations (both the XLA tier's
# per-edge roll/concat unroll and the Pallas kernel's in-body edge sweep):
# program build/compile time grows with edges and with the per-edge operand
# size, and at NR-BG1 Z=384 (316 edges x z=384) both tiers ran past 9 minutes
# in this environment. Codes over this edge*z budget route to the GATHER
# formulation below — one precomputed-index gather + one scatter-add per
# sweep, program size O(1) in edges. Calibrated against the measured-good
# rows: BG1 Z=52 (16k, fine) and BG2 Z=208 (41k, fine) stay unrolled.
_UNROLL_EDGE_Z_BUDGET = 60_000


def _edge_z(code: QCLdpcCode) -> int:
    n_edges = sum(s >= 0 for row in code.base for s in row)
    return n_edges * code.z


def _pallas_vmem_bytes(code: QCLdpcCode) -> int:
    """Smallest-tile footprint (lane-z, 8-row batch tile) — for error text."""
    return _pallas_live_rows(code) * 8 * (-(-code.z // 128) * 128) * 4


def default_layered_group(code: QCLdpcCode) -> int:
    """Measured-rule layered_group for the VMEM-resident layered tiers
    (round-5 verdict item 8: pick G per code, don't pin a global constant).

    Sublane-z codes (small/medium Z, 128-lane batch tiles) keep G=1: the
    serial layered walk already sustains ~2x there (ARCHITECTURE.md). Lane-z
    codes run narrow batch tiles where the serial row chain starves the VPU;
    the v5e sweep measured, vs flooding at matched quality:
      BG2 Z=208 (z_pad 256): G=1 1.76x, G=4 2.8x, G=8 3.0x  -> wide z: G=8
      BG1 Z=52  (z_pad 128): G=1 1.5x,  G=2 2.4x, G=4 2.25x -> one-reg z: G=2
    Streamed-tier codes (over the unroll budget) return G=1 — measured on
    chip at Z=240: G=2 was within relay noise (174 vs 168 Mb/s) and the
    snapshot transients shrink the admissible batch tile. The bench records
    the chosen G per row."""
    if _edge_z(code) > _UNROLL_EDGE_Z_BUDGET:
        # streamed tier: G=1. Measured round 5 (BG1 Z=240, block 8): G=2 gave
        # 174 vs 168 Mb/s — within relay noise — while costing snapshot
        # transients that shrink the admissible batch tile; the streamed
        # walk's per-row work (d slots x full lane rows) already feeds the
        # VPU, unlike the unrolled lane-z kernel's narrow-tile rows.
        return 1
    lay = _pallas_layout(code)
    if lay is not None and lay[0] == 0:
        return 1
    z_pad = -(-code.z // 128) * 128
    return 8 if z_pad >= 256 else 2


@functools.lru_cache(maxsize=64)
def build_decoder(
    code: QCLdpcCode,
    n_iters: int = 20,
    norm: float = 0.75,
    kernels: str = "xla",
    schedule: str = "flooding",
    layered_group: int = 1,
    stream_c2v_dtype: Optional[str] = None,
):
    """Build the jitted flooding normalized-min-sum decoder for `code`
    (lru-cached: repeated builds — e.g. one per serving.process call — reuse
    the same jitted closure and hence XLA's compilation cache).

    Returns decode(llr) where llr is (..., n) channel LLRs (float or the
    receiver's int8 soft bits; positive = bit 0). Any leading axes batch.
    `norm` is the min-sum normalization factor (0.75 is the standard choice;
    1.0 = pure min-sum). The schedule is static: `n_iters` flooding sweeps
    under lax.scan, parity reported in `ok`.

    kernels="pallas" runs ALL iterations VMEM-resident per batch tile
    (ops/pallas/kernels.ldpc_posterior) — the XLA tier round-trips the
    message arrays through HBM once per sweep and is HBM-bound (measured
    within ~10% of the roofline); the Pallas tier reads the LLRs once and
    writes the posterior once: 3.65x faster on v5e (961 vs 263 info Mb/s at
    n=976/batch 512/25 iters), BIT-IDENTICAL output (same edge order,
    association, tie handling — tests assert posterior equality exactly).
    The live message set (n_edges + 2*nb rows, f32) must fit the ~16 MB
    scoped-VMEM budget: small/medium Z uses the fast sublane-z layout
    ((z, 128) tiles); large-Z codes (NR-BG1 scale) switch to the lane-z
    layout ((8..32, z) tiles — Z on the lanes, batch tile on the sublanes)
    so the live set shrinks with the tile (`_pallas_layout`).

    kernels="xla_gather" replaces the per-edge static-roll unroll with ONE
    precomputed-index gather + ONE scatter-add per sweep — program size O(1)
    in edges. This is the only tier whose build/compile cost does not grow
    with the code (NR BG1 at Z=384 = 316 edges x z=384 blows past a 9-minute
    compile in both unrolled tiers); it pays index-gather traffic instead of
    static addressing, so it loses to the unrolled tiers on codes small
    enough to unroll. Posterior matches to float tolerance (scatter-add
    association), hard decisions identically on anything decodable.

    kernels="pallas_stream" is the VMEM-resident tier for codes the unrolled
    tiers cannot COMPILE (edge*z over the 60k budget): a row-STREAMED layered
    kernel whose program is O(max_degree) in size — check rows walked by a
    fori_loop over scalar-prefetched SMEM wiring tables, quasi-cyclic shifts
    applied with `pltpu.roll`'s dynamic shift — while the full c2v live set
    stays VMEM-resident across all sweeps like the unrolled Pallas tier
    (kernels.py _ldpc_stream_kernel). ANY lifting size is eligible (round 5:
    Z pads to whole 128-lane registers in-kernel; the true-Z rotation is two
    padded rotations + a lane select — the former z%128 gate left BG1
    Z∈{192..352} on the 3 Mb/s gather tier). Layered schedule only (the
    natural schedule for a streamed row walk, and ~2x convergence per
    sweep); honors `layered_group` (grouped snapshot updates, mirrored by
    decode_reference) and `stream_c2v_dtype="bfloat16"` (half-size message
    scratch; min-sum is scale-invariant, L stays f32 and consistent with the
    rounded stored messages). Requires the lane-z live set to fit the VMEM
    budget (_stream_layout).

    kernels="auto" picks: for codes over the unroll compile budget
    (edge*z > 60k), the streamed tier when it fits VMEM on an accelerator and
    the schedule is layered, else the gather tier (flooding); otherwise
    pallas on an accelerator when some layout fits, the XLA unrolled tier
    elsewhere (and on CPU, where interpret-mode pallas would just be slow).
    """
    assert kernels in ("xla", "xla_gather", "pallas", "pallas_stream", "auto"), kernels
    assert schedule in ("flooding", "layered"), schedule
    if kernels == "auto":
        if _edge_z(code) > _UNROLL_EDGE_Z_BUDGET:
            # too large for any static-unroll tier's compile budget (see
            # _UNROLL_EDGE_Z_BUDGET): layered -> the streamed VMEM tier
            # (O(degree) program size); flooding -> the O(1)-program gather tier
            if schedule == "layered":
                if (
                    not _stream_supported(
                        code, layered_group, stream_c2v_dtype == "bfloat16"
                    )
                    or jax.default_backend() == "cpu"
                ):
                    raise ValueError(
                        "schedule='layered' needs the streamed pallas tier "
                        f"(edge*z={_edge_z(code)} over the unroll budget), which "
                        "requires an accelerator and a lane-z VMEM fit"
                    )
                kernels = "pallas_stream"
            else:
                kernels = "xla_gather"
        else:
            fits = _pallas_vmem_fits(code)
            kernels = "pallas" if fits and jax.default_backend() != "cpu" else "xla"
    if kernels == "pallas_stream":
        if schedule != "layered":
            raise ValueError("kernels='pallas_stream' implements the layered schedule only")
        bf16 = stream_c2v_dtype == "bfloat16"
        if not _stream_supported(code, layered_group, bf16):
            raise ValueError(
                "streamed pallas tier needs a lane-z VMEM fit (live messages "
                f"+ group transients): z={code.z}, layered_group={layered_group}, "
                f"stream model ~{_stream_vmem_bytes(code, layered_group, bf16)/2**20:.1f} MB "
                f"> the {_STREAM_VMEM_BUDGET/2**20:.0f} MB budget "
                "(stream_c2v_dtype='bfloat16' halves the message set)"
            )
    elif schedule == "layered" and kernels != "pallas":
        # the row-serial schedule lives only in the VMEM-resident kernels (the
        # XLA tiers' whole-frame accum/gather formulations are flooding-shaped);
        # mirror anchor = decode_reference(schedule="layered")
        if _edge_z(code) <= _UNROLL_EDGE_Z_BUDGET:
            if not _pallas_vmem_fits(code):
                raise ValueError("schedule='layered' needs a pallas tier; code too large")
            kernels = "pallas"
        else:
            if not _stream_supported(
                code, layered_group, stream_c2v_dtype == "bfloat16"
            ):
                raise ValueError(
                    "schedule='layered' on a code over the unroll budget needs "
                    "the streamed tier (lane-z VMEM fit incl. group transients)"
                )
            kernels = "pallas_stream"
    elif kernels == "pallas" and not _pallas_vmem_fits(code):
        raise ValueError(
            "code too large for the VMEM-resident pallas tier: smallest tile "
            f"(lane-z, 8-row batch) needs ~{_pallas_vmem_bytes(code)/2**20:.1f} MB "
            f"live messages > the {_PALLAS_VMEM_BUDGET/2**20:.0f} MB model budget "
            "(half the 16 MB scoped-vmem limit); use kernels='xla' or 'auto'"
        )
    plan = make_ldpc_plan(code)
    mb, nb, d, z = code.n_check_blocks, code.n_var_blocks, plan.max_degree, code.z
    edges = plan.edges
    valid = jnp.asarray(plan.slot_valid[:, :, None, None])  # (mb, d, 1, 1)
    info_cols = jnp.asarray(plan.info_cols)
    slot_arange = jnp.arange(d)[:, None, None]  # (d, 1, 1) vs argmin (mb, z, b)

    gidx_flat = None
    if kernels in ("xla_gather", "pallas_stream"):
        # Precomputed flat index per check lane: lane (i, t, a) reads variable
        # bit (j, (a + s) mod z). One jnp.take builds the whole check frame and
        # one scatter-add (same indices) is its transpose — program size O(1)
        # in edges, the tier for codes over _UNROLL_EDGE_Z_BUDGET. Caveat vs
        # the unrolled tier: scatter-add association for duplicate variable
        # indices is XLA-order, so posteriors match to float tolerance, not
        # bit-exactly (tests pin allclose + identical hard decisions).
        gidx = np.zeros((mb, d, z), np.int64)  # invalid slots -> var 0 (adds 0)
        a_z = np.arange(z)
        for i, t, j, s in edges:
            gidx[i, t] = j * z + (a_z + s) % z
        gidx_flat = jnp.asarray(gidx.reshape(-1))

    def _roll_z(x, s):
        """Static cyclic shift of the z axis (axis -2; batch is minor). Two
        major-axis slices + concat — XLA folds these into the consumer's
        addressing; NEVER an index-table gather (measured 2-5x slower) and
        never a lane shuffle (batch-last keeps z off the lane dim)."""
        s = s % z
        if s == 0:
            return x
        return jnp.concatenate([x[..., z - s :, :], x[..., : z - s, :]], axis=-2)

    def _check_update(v2c):
        """Extrinsic normalized min-sum per check lane ((mb, d, z, b) frame):
        sign = product of the other signs, magnitude = min of the other
        magnitudes (min2 at the argmin slot, min1 elsewhere). Padded slots
        emit 0."""
        mag = jnp.where(valid, jnp.abs(v2c), _BIG)
        neg = valid & (v2c < 0)
        sgn = 1.0 - 2.0 * neg.astype(v2c.dtype)
        # total sign as parity of the negative count (a multiplicative
        # jnp.prod reduction over this axis SIGSEGVs this environment's TPU
        # compile helper; additive reductions are fine and the math is
        # identical for +-1 factors); extrinsic sign = s_total / s_e = total*s_e
        par = jnp.sum(neg.astype(jnp.int32), axis=1, keepdims=True) % 2
        ext_sign = (1.0 - 2.0 * par.astype(v2c.dtype)) * sgn
        i_min = jnp.argmin(mag, axis=1)  # (mb, z, b)
        onehot = slot_arange == i_min[:, None]  # (mb, d, z, b)
        min1 = jnp.min(mag, axis=1, keepdims=True)
        min2 = jnp.min(jnp.where(onehot, _BIG, mag), axis=1, keepdims=True)
        ext_mag = jnp.where(onehot, min2, min1)
        # pin the dtype: weak-typed literals above would promote f32 carries
        # to f64 under x64 and break the scan carry contract
        return jnp.where(valid, norm * ext_sign * ext_mag, 0.0).astype(v2c.dtype)

    @jax.jit
    def decode(llr) -> DecodeResult:
        llr = jnp.asarray(llr)
        llr = llr.astype(jnp.promote_types(llr.dtype, jnp.float32))
        lead = llr.shape[:-1]
        b = max(int(np.prod(lead)), 1)
        # batch-LAST internally: (nb, z, b) variable / (mb, d, z, b) check frame
        ch = jnp.transpose(llr.reshape((b, nb, z)), (1, 2, 0))

        if kernels in ("xla_gather", "pallas_stream"):
            # pallas_stream exists precisely because the unrolled form does
            # not compile at this code size — its (cheap, once-per-decode)
            # parity check must use the O(1)-program gather form too
            def accum(c2v):  # (mb, d, z, b) -> posterior (nb, z, b)
                acc = ch.reshape(nb * z, b).at[gidx_flat].add(
                    c2v.reshape(mb * d * z, b)
                )
                return acc.reshape(nb, z, b)

            def gather(post):  # (nb, z, b) -> check frame (mb, d, z, b)
                fr = jnp.take(post.reshape(nb * z, b), gidx_flat, axis=0)
                return fr.reshape(mb, d, z, b)
        else:
            def accum(c2v):  # (mb, d, z, b) -> posterior (nb, z, b)
                acc = [ch[j] for j in range(nb)]
                for i, t, j, s in edges:
                    acc[j] = acc[j] + _roll_z(c2v[i, t], s)
                return jnp.stack(acc)

            def gather(post):  # (nb, z, b) -> check frame (mb, d, z, b)
                cols = [[None] * d for _ in range(mb)]
                for i, t, j, s in edges:
                    cols[i][t] = _roll_z(post[j], -s)
                zero = jnp.zeros((z, b), post.dtype)
                return jnp.stack(
                    [jnp.stack([c if c is not None else zero for c in row]) for row in cols]
                )

        if kernels == "pallas_stream":
            from .pallas import kernels as pk

            # batch tile from the live-set model (_stream_layout): at BG1
            # Z=384 f32 that is 8 — the measured VMEM maximum (block_b=16
            # fails the Mosaic compile, 8 runs at 262 Mb/s); bf16 c2v halves
            # the message set (stream_c2v_dtype="bfloat16")
            block_b = _stream_layout(
                code, c2v_bf16=(stream_c2v_dtype == "bfloat16"), group=layered_group
            )
            pad = (-b) % block_b
            chp = jnp.pad(ch, ((0, 0), (0, 0), (0, pad))) if pad else ch
            posterior = pk.ldpc_stream_posterior(
                chp, plan.slot_var, plan.slot_shift, plan.slot_valid,
                len(edges), z, n_iters, norm, block_b=block_b,
                group=layered_group, c2v_dtype=stream_c2v_dtype,
            )
            posterior = posterior[..., :b] if pad else posterior
        elif kernels == "pallas":
            from .pallas import kernels as pk

            z_axis, block_b = _pallas_layout(code)
            pad = (-b) % block_b
            chp = jnp.pad(ch, ((0, 0), (0, 0), (0, pad))) if pad else ch
            posterior = pk.ldpc_posterior(
                chp, edges, nb, z, n_iters, norm, block_b=block_b, z_axis=z_axis,
                schedule=schedule, group=layered_group,
            )
            posterior = posterior[..., :b] if pad else posterior
        else:
            def body(c2v, _):
                post = accum(c2v)
                v2c = gather(post) - c2v
                return _check_update(v2c), None

            # derive the zero init from ch (not a fresh jnp.zeros) so its
            # varying-axes type matches the body output under shard_map
            # (parallel.build_dp_decoder) — a constant carry is "unvarying"
            # and the scan carry contract rejects the mix
            c2v0 = jnp.zeros((mb, d, z, 1), ch.dtype) + 0.0 * ch[0, 0][None, None, None, :]
            c2v, _ = jax.lax.scan(body, c2v0, None, length=n_iters)
            posterior = accum(c2v)
        bits = (posterior < 0).astype(jnp.uint8)
        par = jnp.sum(gather(bits.astype(jnp.int32)) * valid, axis=1) % 2
        ok = jnp.logical_not(jnp.any(par, axis=(0, 1)))  # (b,)
        bits_bn = jnp.transpose(bits, (2, 0, 1)).reshape((b, code.n))
        post_bn = jnp.transpose(posterior, (2, 0, 1)).reshape((b, code.n))
        return DecodeResult(
            bits=bits_bn.reshape(lead + (code.n,)),
            info=jnp.take(bits_bn, info_cols, axis=-1).reshape(lead + (plan.k,)),
            ok=ok.reshape(lead),
            posterior=post_bn.reshape(lead + (code.n,)),
        )

    return decode


def decode_reference(
    code: QCLdpcCode,
    llr: np.ndarray,
    n_iters: int = 20,
    norm: float = 0.75,
    schedule: str = "flooding",
    layered_group: int = 1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Float64 numpy flooding normalized-min-sum with the identical schedule
    (same edge order, same per-variable summation association as the
    batch-last TPU decoder) — the correctness anchor for `build_decoder`
    (same role utils/oracle.py plays for the estimator). Returns
    (bits (..., n) uint8, ok (...) bool, posterior (..., n) float64)."""
    plan = make_ldpc_plan(code)
    mb, nb, d, z = code.n_check_blocks, code.n_var_blocks, plan.max_degree, code.z
    edges = plan.edges
    valid = plan.slot_valid[None, :, :, None]
    lead = np.asarray(llr).shape[:-1]
    ch = np.asarray(llr, np.float64).reshape(-1, nb, z)
    b = ch.shape[0]

    def accum(c2v):  # (b, mb, d, z) -> (b, nb, z)
        acc = ch.copy()
        for i, t, j, s in edges:
            acc[:, j] += np.roll(c2v[:, i, t], s, axis=-1)
        return acc

    def gather(post):  # (b, nb, z) -> (b, mb, d, z)
        out = np.zeros((b, mb, d, z), post.dtype)
        for i, t, j, s in edges:
            out[:, i, t] = np.roll(post[:, j], -s, axis=-1)
        return out

    c2v = np.zeros((b, mb, d, z))
    if schedule == "layered":
        # row-serial mirror of the pallas layered sweep: identical row order,
        # identical two-min/tie semantics (np.argmin = first minimum)
        L = ch.copy()
        cv = {e: np.zeros((b, z)) for e in range(len(edges))}
        row_eids = [[e for e, (i2, _, _, _) in enumerate(edges) if i2 == i] for i in range(mb)]
        for _ in range(n_iters):
            for g0 in range(0, mb, layered_group):
                chunk = range(g0, min(g0 + layered_group, mb))
                upds = {}
                for i in chunk:
                    eids = row_eids[i]
                    v2c = np.stack(
                        [np.roll(L[:, edges[e][2]], -edges[e][3], axis=-1) - cv[e] for e in eids],
                        axis=1,
                    )  # (b, deg, z)
                    mag = np.abs(v2c)
                    neg = v2c < 0
                    i_min = np.argmin(mag, axis=1)
                    onehot = np.arange(len(eids))[:, None] == i_min[:, None, :]
                    min1 = np.min(mag, axis=1, keepdims=True)
                    min2 = np.min(np.where(onehot, _BIG, mag), axis=1, keepdims=True)
                    ext = np.where(onehot, min2, min1)
                    par = np.logical_xor.reduce(neg, axis=1, keepdims=True)
                    sgn = 1.0 - 2.0 * np.logical_xor(par, neg)
                    upds[i] = norm * sgn * ext
                for i in chunk:
                    for t_, e in enumerate(row_eids[i]):
                        j, s = edges[e][2], edges[e][3]
                        L[:, j] += np.roll(upds[i][:, t_] - cv[e], s, axis=-1)
                        cv[e] = upds[i][:, t_]
        posterior = L.reshape(b, code.n)
        bits = (posterior < 0).astype(np.uint8)
        par2 = np.sum(gather(bits.reshape(b, nb, z).astype(np.int64)) * valid, axis=-2) % 2
        ok = ~np.any(par2, axis=(-2, -1))
        return (
            bits.reshape(lead + (code.n,)),
            ok.reshape(lead),
            posterior.reshape(lead + (code.n,)),
        )
    for _ in range(n_iters):
        post = accum(c2v)
        v2c = gather(post) - c2v
        mag = np.where(valid, np.abs(v2c), _BIG)
        sgn = np.where(valid & (v2c < 0), -1.0, 1.0)
        ext_sign = np.prod(sgn, axis=-2, keepdims=True) * sgn
        i_min = np.argmin(mag, axis=-2)
        onehot = np.arange(d)[:, None] == i_min[..., None, :]
        min1 = np.min(mag, axis=-2, keepdims=True)
        min2 = np.min(np.where(onehot, _BIG, mag), axis=-2, keepdims=True)
        ext = np.where(onehot, min2, min1)
        c2v = np.where(valid, norm * ext_sign * ext, 0.0)
    posterior = accum(c2v).reshape(b, code.n)
    bits = (posterior < 0).astype(np.uint8)
    par = np.sum(gather(bits.reshape(b, nb, z).astype(np.int64)) * valid, axis=-2) % 2
    ok = ~np.any(par, axis=(-2, -1))
    return (
        bits.reshape(lead + (code.n,)),
        ok.reshape(lead),
        posterior.reshape(lead + (code.n,)),
    )
