"""Pallas TPU kernel: batched subsequence-DTW as a skewed anti-diagonal
wavefront.

Why a wavefront (and not the column scan of ops/sdtw.py): the DP column
update has a sequential dependency along the query axis; the column scan
breaks it with a log-depth prefix-min (~24 vector ops/column). On the
anti-diagonal d = i + j every cell depends only on diagonals d-1 and d-2,
so one step is a handful of shifted mins -- no scan at all:

    A_d[i] = |x[i] - y[d-i]| + min( A_{d-1}[i-1],            # up
                                    A_{d-1}[i],              # left
                                    A_{d-2}[i-1] )           # diag
    A_d[0] = |x[0] - y[d]|                                   # free start

The skewed layout keeps every step a full (B, Q) vector op: lanes hold
query positions, the reference value window y[d-i] is maintained by a
roll-and-insert (one SMEM scalar per step, no dynamic lane slicing),
and track-reset masks ride along the same way. Each step emits the
uniform last-row lane A_d[W-1] as a static slice (W = query size).
Clipped reads (qlen != W) ride the SAME emission: shift_queries_for_clip
shifts their query up to end at lane W-1 and a per-read free-start mask
opens the DP at lane W-qlen -- both the single-device kernel and the
mesh/ring carry variant take the mask, so every path serves clips on
device. ds[:, W-1 : W-1+R] is the column-indexed last row.

Per step: ~10 VPU ops on (B, Q) f32 (one lane roll -- the d-2 diagonal
is carried pre-rolled -- plus the recurrence mins/selects), no serial
scan chains, and a FULLY unrolled tile body (no loop dispatch; see
_wavefront_tile). min-plus DP has no MXU path; the VPU is the roofline,
so everything stays float32 resident in VMEM with zero HBM traffic
inside a tile. Measured 234 Gcell/s at (B=512, Q=256, nCoV reference,
td=256, unroll=8) on one v5e -- was 150 with the fori_loop body and
two rolls per step (scripts/bench_kernel.py reproduces the sweep).

Grid: sequential tiles of TD diagonals; DP carry diagonals live in VMEM
scratch across grid steps. ref: semantics of src/cdtw.c:172-189 (see
ops/sdtw.py for the contract shared with the lax.scan engine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # plain python floats: jnp scalars would be captured consts
PAD = 1.0e18

# Default diagonal-tile width. The tile body is FULLY unrolled (see
# _wavefront_tile), so td trades grid-step overhead against compile
# time: measured on v5e at (B=512, Q=256, nCoV) 128 -> 222 Gcell/s,
# 256 -> 234 Gcell/s, 512 -> compile blows past 10 min. Everything that
# feeds the kernel (segment alignment in the ring/tracks shards) must
# stay a multiple of this. SIGFISH_TPU_WF_TD overrides the default at
# import (bench.py sets 128: the Q=512 RNA body at td=256 takes >250 s
# of cold Mosaic compile -- past the driver's bench budget -- while the
# ~5% kernel-rate cost is invisible e2e because both chemistries are
# host-bound; every consumer derives its alignment from this constant,
# so the override stays self-consistent).
WF_TD = int(__import__("os").environ.get("SIGFISH_TPU_WF_TD", "256"))
_TD_PINNED = "SIGFISH_TPU_WF_TD" in __import__("os").environ


def effective_td(q_pad: int) -> int:
    """Tile width the pipeline should run a Q-wide kernel at.

    The fully-unrolled tile body's Mosaic compile cost scales
    superlinearly in td AND with Q's vreg count: measured cold on v5e
    (scripts/bench_kernel.py, 2026-08-20) Q=256 td=128/256 compile
    52/136 s for 216/235 Gcell/s, Q=512 td=128/256 compile 93/935 s(!)
    for 302/308 Gcell/s. At wide Q the +2% rate cannot justify a
    ~15-minute cold compile on every fresh host, so unless the
    operator pinned SIGFISH_TPU_WF_TD the pipeline drops wide-query
    kernels to td=128. (td < 128 is impossible: the reference-window
    SMEM blocks need a 128-divisible minor dim.)"""
    if _TD_PINNED:
        return WF_TD
    return 128 if q_pad >= 384 else WF_TD

# Literals inside the kernel body must carry explicit 32-bit dtypes:
# under jax_enable_x64 (the --host-stages device mode) plain Python
# ints/floats trace as i64/f64, which Mosaic rejects (tpu.dynamic_rotate
# wants an i32 shift; f64 constants have no TPU lowering).
_SHIFT1 = np.int32(1)
_BIG32 = np.float32(BIG)
_HALF32 = np.float32(0.5)
_ZERO32 = np.float32(0.0)


def _wavefront_tile(
    queries_ref, ypad_ref, rspad_ref, out_ref, state, *, td: int, lane: int,
    unroll: int, fs_mask=None, std: bool = False,
):
    """One TD-diagonal tile: advances (a1, b2, ywin, rswin), writing the
    emitted last-row-lane values into out_ref (a (B, td) block).

    The carried DP state is (a1, b2) where a1 = A_{d-1} and
    b2 = roll(A_{d-2}) -- the ROLLED previous-previous diagonal. The
    recurrence needs roll(a1) (the 'up' term) and roll(a2) (the 'diag'
    term); roll(a2) at step d IS the roll(a1) computed at step d-1, so
    carrying it saves one (B, Q) roll per diagonal -- the largest
    single op in the step (two full-width lane rotations -> one).

    The td-step loop is FULLY unrolled in Python: td is static, so every
    emission store lands at a static column offset (Mosaic cannot lower
    dynamic lane-offset vector stores), and there is no per-iteration
    loop dispatch at all. `unroll` is the emission-group width: each
    group of `unroll` (B, 1) last-row slices concatenates into one
    (B, unroll) static store -- replacing the old per-step (B, td)
    iota-compare + select with a narrow write, and bounding the live
    slice set (full-td concat would hold td (B, 1) values to the end).

    fs_mask: optional (B, Q) bool, True at each read's FREE-START lane
    (lane 0 when None). Clipped reads (qlen != lane+1) are served by
    shifting their query up to end at the emitted lane and starting the
    free-start row at lane s = lane+1-qlen: lanes < s compute garbage
    that can never leak (information flows lane l-1 -> l only through
    up/diag, and the free-start select overwrites lane s entirely), so
    the one modified select is the whole cost."""
    B, Q = queries_ref.shape
    q = queries_ref[:]
    if fs_mask is None:
        fs_mask = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1) == 0
    lane_1 = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)

    a1, b2, ywin, rswin = state
    lrs = []
    for t in range(td):
        # advance the reference/reset windows: lane i holds y[d - i]
        y_d = ypad_ref[0, t]
        rs_d = rspad_ref[0, t]
        ywin = jnp.where(lane_1 == 0, y_d, pltpu.roll(ywin, shift=_SHIFT1, axis=1))
        rswin = jnp.where(lane_1 == 0, rs_d, pltpu.roll(rswin, shift=_SHIFT1, axis=1))

        local = jnp.abs(q - ywin)  # (B, Q) via broadcast of (1, Q)
        rs = (rswin > _HALF32)  # (1, Q) broadcast
        # up = roll(a1); diag = roll(a2) == b2 (carried, already rolled);
        # left = a1. The rs track-reset mask applies to left+diag (both
        # read column j-1 of the previous track); lane 0 needs no shift
        # fill because the free-start select below overwrites the row
        up = pltpu.roll(a1, shift=_SHIFT1, axis=1)
        ld = jnp.where(rs, _BIG32, jnp.minimum(a1, b2))
        a_new = local + jnp.minimum(up, ld)
        if std:
            # boundary-anchored first row (--dtw-std, cdtw.c:70-94):
            # cost[0][j] = local + cost[0][j-1], restarting at each
            # track's first column (rs). a1 here is STILL diagonal d-1,
            # whose fs-lane value is cell (0, j-1); the anchored first
            # COLUMN needs no special case (left/diag arrive as BIG
            # from the carry init / rs mask, leaving up only). min is
            # rounding-exact, so the only float op order that matters
            # -- the first-row adds -- is the scalar DP's column order.
            a_new = jnp.where(
                fs_mask, local + jnp.where(rs, _ZERO32, a1), a_new
            )
        else:
            a_new = jnp.where(fs_mask, local, a_new)  # free start row

        # the uniform last-row lane (qlen-1 == lane for full-length
        # reads; clipped reads land here too via the fs_mask query
        # shift): a static lane slice, no cross-lane reduction
        lrs.append(a_new[:, lane : lane + 1])  # (B, 1)
        a1, b2 = a_new, up
        if len(lrs) == unroll:
            out_ref[:, t + 1 - unroll : t + 1] = jnp.concatenate(lrs, axis=1)
            lrs = []
    return (a1, b2, ywin, rswin)


def _wavefront_kernel(
    # inputs
    queries_ref,  # (B, Q) VMEM
    ypad_ref,     # (1, TD) SMEM block: reference values for this tile
    rspad_ref,    # (1, TD) SMEM block: 1.0 at track starts
    fsmask_ref,   # (B, Q) VMEM: 1.0 at each read's free-start lane
    # outputs
    out_ref,      # (B, TD) VMEM block for this tile
    # scratch
    a1_ref,       # (B, Q) A_{d-1}
    a2_ref,       # (B, Q) A_{d-2}
    ywin_ref,     # (1, Q) ywin[i] = y[d-i]
    rswin_ref,    # (1, Q)
    *,
    td: int,
    lane: int,
    unroll: int = 4,
    std: bool = False,
):
    g = pl.program_id(0)
    B, Q = queries_ref.shape

    @pl.when(g == 0)
    def _init():
        a1_ref[:] = jnp.full((B, Q), BIG, dtype=jnp.float32)
        a2_ref[:] = jnp.full((B, Q), BIG, dtype=jnp.float32)
        ywin_ref[:] = jnp.full((1, Q), PAD, dtype=jnp.float32)
        rswin_ref[:] = jnp.zeros((1, Q), dtype=jnp.float32)

    state = (a1_ref[:], a2_ref[:], ywin_ref[:], rswin_ref[:])
    state = _wavefront_tile(
        queries_ref, ypad_ref, rspad_ref, out_ref, state, td=td, lane=lane,
        unroll=unroll, fs_mask=fsmask_ref[:] > _HALF32, std=std,
    )
    a1_ref[:], a2_ref[:], ywin_ref[:], rswin_ref[:] = state


def _wavefront_carry_kernel(
    # inputs
    queries_ref,  # (B, Q) VMEM
    ypad_ref,     # (1, TD) SMEM block
    rspad_ref,    # (1, TD) SMEM block
    fsmask_ref,   # (B, Q) VMEM: 1.0 at each read's free-start lane
    a1_in,        # (B, Q) incoming DP state (diagonal d-1)
    a2_in,        # (B, Q) incoming roll(diagonal d-2) -- the rolled form
                  # the tile carries (see _wavefront_tile); opaque to
                  # callers, which only seed BIG (roll-invariant) and
                  # pass segment-outgoing -> segment-incoming verbatim
    ywin_in,      # (1, Q) incoming reference-value window
    rswin_in,     # (1, Q) incoming reset window
    # outputs
    out_ref,      # (B, TD) block
    a1_out,       # (B, Q) outgoing DP state
    a2_out,
    ywin_out,
    rswin_out,
    *,
    td: int,
    lane: int,
    unroll: int = 4,
    std: bool = False,
):
    """Carry-in/carry-out variant for reference-axis sharding: the cross-
    tile DP state is an explicit operand pair instead of scratch, so a
    segment's final state can hop to the neighbor chip (ppermute) and
    seed its first tile. Same tile body -- bit-identical to running the
    segments back-to-back on one chip."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        a1_out[:] = a1_in[:]
        a2_out[:] = a2_in[:]
        ywin_out[:] = ywin_in[:]
        rswin_out[:] = rswin_in[:]

    state = (a1_out[:], a2_out[:], ywin_out[:], rswin_out[:])
    state = _wavefront_tile(
        queries_ref, ypad_ref, rspad_ref, out_ref, state, td=td, lane=lane,
        unroll=unroll, fs_mask=fsmask_ref[:] > _HALF32, std=std,
    )
    a1_out[:], a2_out[:], ywin_out[:], rswin_out[:] = state


@functools.partial(
    jax.jit, static_argnames=("lane", "td", "unroll", "interpret", "std")
)
def sdtw_wavefront(
    queries: jnp.ndarray,   # (B, Q) float32
    ypad: jnp.ndarray,      # (1, D) float32, D multiple of td
    rspad: jnp.ndarray,     # (1, D) float32
    lane: int,              # the uniform qlen-1 row to emit
    td: int = WF_TD,
    unroll: int = 8,
    interpret: bool = False,
    start_lanes: jnp.ndarray | None = None,  # (B,) i32 free-start lane per read
    std: bool = False,      # boundary-anchored DTW (--dtw-std, cdtw.c:70)
) -> jnp.ndarray:
    """Returns diag-indexed scores (B, D): out[b, d] = cost[lane, d-lane].

    The emitted row is the STATIC lane (qlen-1 of full-length reads).
    Clipped reads (qlen != lane+1) ride the same emission: shift their
    query values up to lanes [lane+1-qlen, lane] and pass start_lanes
    with lane+1-qlen per clipped read (build both with
    shift_queries_for_clip). With start_lanes=None every read
    free-starts at lane 0 (the full-length layout). The (B, Q) one-hot
    mask the kernel consumes is expanded HERE, inside the jit, from the
    tiny (B,) vector -- the host->device transfer is 4B/read, not a
    full (B, Q) f32 plane (the axon link is ~11 MB/s).
    `out[:, lane : lane+R]` is the column-indexed last row either way.
    interpret=True runs the Pallas interpreter (CPU tests).
    """
    B, Q = queries.shape
    D = ypad.shape[1]
    assert D % td == 0
    n_tiles = D // td

    assert td % unroll == 0
    if start_lanes is None:
        start_lanes = jnp.zeros((B,), jnp.int32)
    start_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        == start_lanes.astype(jnp.int32)[:, None]
    ).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _wavefront_kernel, td=td, lane=lane, unroll=unroll, std=std
        ),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, Q), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, td), lambda g: (0, g), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, td), lambda g: (0, g), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, Q), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, td), lambda g: (0, g), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, Q), jnp.float32),
            pltpu.VMEM((B, Q), jnp.float32),
            pltpu.VMEM((1, Q), jnp.float32),
            pltpu.VMEM((1, Q), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            # 3 (B, Q) input planes (queries + start_mask) + scratch
            flops=12 * B * Q * D, bytes_accessed=4 * (3 * B * Q + 2 * D + B * D), transcendentals=0
        ),
        interpret=interpret,
    )(queries, ypad, rspad, start_mask)


def shift_queries_for_clip(
    qb: np.ndarray, qlens: np.ndarray, lane: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side prep for clipped reads on the wavefront kernel.

    Returns (qb_shifted, start_lanes): each read whose qlen != lane+1
    is moved to lanes [lane+1-qlen, lane] so its last DP row lands on
    the kernel's uniform emitted lane; start_lanes ((B,) int32) carries
    the free-start lane per read (0 for full-length reads, whose
    values are untouched) -- expanded to the kernel's one-hot mask on
    device by sdtw_wavefront."""
    qb2 = qb.copy()
    lanes = np.zeros(qb.shape[0], dtype=np.int32)
    W = lane + 1
    # qlen > lane+1 cannot be served by this emission (its last DP row
    # lies beyond the emitted lane); silently leaving it unshifted would
    # emit a mid-query row -- reject loudly instead
    assert int(np.max(qlens, initial=0)) <= W, \
        f"qlen {int(np.max(qlens))} > emitted lane width {W}"
    for r in range(qb.shape[0]):
        ql = int(qlens[r])
        if 0 < ql < W:
            s = W - ql
            qb2[r, :] = 0.0
            qb2[r, s : s + ql] = qb[r, :ql]
            lanes[r] = s
    return qb2, lanes


@functools.partial(
    jax.jit, static_argnames=("lane", "td", "unroll", "interpret", "std")
)
def sdtw_wavefront_carry(
    queries: jnp.ndarray,   # (B, Q) float32
    ypad: jnp.ndarray,      # (1, D) float32, D multiple of td
    rspad: jnp.ndarray,     # (1, D) float32
    a1: jnp.ndarray,        # (B, Q) incoming diagonal d-1 (BIG when fresh)
    a2: jnp.ndarray,        # (B, Q) incoming ROLLED diagonal d-2 (opaque:
                            # seed BIG, else pass a prior call's output)
    ywin: jnp.ndarray,      # (1, Q) incoming reference window (PAD when fresh)
    rswin: jnp.ndarray,     # (1, Q) incoming reset window (0 when fresh)
    lane: int,
    td: int = WF_TD,
    unroll: int = 8,
    interpret: bool = False,
    start_lanes: jnp.ndarray | None = None,  # (B,) i32 free-start lane per read
    std: bool = False,
):
    """sdtw_wavefront over ONE reference segment with explicit cross-
    segment DP state: seeds from (a1, a2, ywin, rswin) and returns the
    final state alongside the diag-indexed scores.

    Running segments back-to-back through this function is bit-identical
    to one sdtw_wavefront over their concatenation -- the carry is
    exactly the kernel's cross-tile scratch. This is the building block
    of the ring-pipelined reference sharding (parallel/shard.py): the
    O(B x Q) state hops chips via ppermute between segments.

    start_lanes serves clipped reads exactly like sdtw_wavefront's
    (shift_queries_for_clip builds the shifted queries + lanes); it must
    be the SAME value on every segment of a chain.
    """
    B, Q = queries.shape
    D = ypad.shape[1]
    assert D % td == 0 and td % unroll == 0
    if start_lanes is None:
        start_lanes = jnp.zeros((B,), jnp.int32)
    start_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        == start_lanes.astype(jnp.int32)[:, None]
    ).astype(jnp.float32)
    full = pl.BlockSpec((B, Q), lambda g: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, Q), lambda g: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _wavefront_carry_kernel, td=td, lane=lane, unroll=unroll, std=std
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Q), jnp.float32),
            jax.ShapeDtypeStruct((B, Q), jnp.float32),
            jax.ShapeDtypeStruct((1, Q), jnp.float32),
            jax.ShapeDtypeStruct((1, Q), jnp.float32),
        ],
        grid=(D // td,),
        in_specs=[
            full,
            pl.BlockSpec((1, td), lambda g: (0, g), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, td), lambda g: (0, g), memory_space=pltpu.SMEM),
            full, full, full, row, row,
        ],
        out_specs=[
            pl.BlockSpec((B, td), lambda g: (0, g), memory_space=pltpu.VMEM),
            full, full, row, row,
        ],
        cost_estimate=pl.CostEstimate(
            # 4 (B, Q) inputs + 2 (B, Q) state outputs
            flops=12 * B * Q * D, bytes_accessed=4 * (6 * B * Q + 2 * D + B * D), transcendentals=0
        ),
        interpret=interpret,
    )(queries, ypad, rspad, start_mask, a1, a2, ywin, rswin)


def prepare_wavefront_inputs(
    ref: np.ndarray, reset: np.ndarray, Q: int, td: int = WF_TD
) -> tuple[np.ndarray, np.ndarray, int]:
    """Pad the concatenated track array for the wavefront kernel.

    Returns (ypad (1, D), rspad (1, D), D) with D = ceil((R+Q)/td)*td.
    """
    R = ref.shape[0]
    D = ((R + Q + td - 1) // td) * td
    ypad = np.full((1, D), PAD, dtype=np.float32)
    ypad[0, :R] = ref
    rspad = np.zeros((1, D), dtype=np.float32)
    rspad[0, :R] = reset.astype(np.float32)
    # D >= R+Q and Q >= 1 for every caller, so the PAD tail always
    # exists; isolate it unconditionally
    assert R < D, "need Q >= 1 so the kernel has a PAD tail to flush into"
    rspad[0, R] = 1.0
    return ypad, rspad, D
