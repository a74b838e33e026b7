"""Multi-chip execution: shard_map over a (dp, tp) device mesh.

The reference's only parallelism is a pthread fork-join over reads within
one process (src/thread.c:24-116). The TPU-native equivalents here:

  dp (data parallel)   the read-batch axis of the sDTW engine is sharded
                       across mesh axis 'dp' -- the direct analog of the
                       reference's per-read work queue.
  tp (track parallel)  the (contig, strand) tracks of the synthesized
                       reference are partitioned across mesh axis 'tp'
                       (whole tracks, contiguous balanced split -- a
                       track's DP column scan is sequential in the
                       reference axis, so splitting *within* a track
                       would serialize on the carry; splitting *across*
                       tracks is free). Each shard scans only its tracks;
                       `jax.lax.all_gather` over 'tp' reassembles the
                       full last-row score matrix on every device.

Candidate ranking (window argmin + top-5, src/sigfish.c:891-900,575-626)
then runs on the gathered device array via ops/candidates_dev.py under
GSPMD; only (B, 5) results reach the host.

Collectives ride ICI via XLA GSPMD; no NCCL/MPI analog exists or is
needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.sdtw import _column_update, make_query_batch, sdtw_scan
from ..ops.sdtw_pallas import WF_TD


def make_mesh(n_dp: int, n_tp: int = 1, devices=None) -> Mesh:
    """Create a (dp, tp) mesh from the first n_dp*n_tp devices."""
    if devices is None:
        devices = jax.devices()
    need = n_dp * n_tp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_dp, n_tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def shard_tracks(
    tracks: list[np.ndarray], n_tp: int, ckpt: int = 512, align: int = 1
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[list[int]]]:
    """Partition whole tracks across n_tp shards (contiguous balanced
    split), each shard padded to the common per-shard width.

    With align > 1 every track segment inside a shard starts at an align
    multiple and the per-shard width Rs is an align multiple too, so the
    gathered (n_tp*Rs) concatenation keeps every track W-aligned -- the
    on-device candidate window reshape (ops/candidates_dev.py) then works
    unchanged on the gathered score matrix.

    Returns (ref (n_tp, Rs) f32, reset (n_tp, Rs) bool,
    offsets (n_tp, T_max+1) i64 local track offsets per shard,
    assignment: per-shard list of global track indices).
    """
    def seg(sz: int) -> int:
        return ((sz + align - 1) // align) * align if align > 1 else sz

    # contiguous balanced partition (NOT bin-packing): the gathered
    # column order must equal the original track order, because candidate
    # ties resolve by insertion order (update_aln sigfish.c:577-583)
    sizes = [seg(t.size) for t in tracks]
    total = max(sum(sizes), 1)
    assign: list[list[int]] = [[] for _ in range(n_tp)]
    loads = [0] * n_tp
    cum = 0
    for gi, sz in enumerate(sizes):
        s = min(n_tp - 1, n_tp * (2 * cum + sz) // (2 * total))
        assign[s].append(gi)
        loads[s] += sz
        cum += sz
    width = max(loads) if max(loads) else ckpt
    # Rs must be a multiple of both ckpt (scan chunking) and align
    # (window alignment across gathered shard boundaries)
    import math

    unit = ckpt * align // math.gcd(ckpt, align) if align > 1 else ckpt
    Rs = ((width + unit - 1) // unit) * unit
    ref = np.full((n_tp, Rs), 1.0e18, dtype=np.float32)
    reset = np.zeros((n_tp, Rs), dtype=bool)
    tmax = max(len(a) for a in assign)
    offsets = np.zeros((n_tp, tmax + 1), dtype=np.int64)
    for s, a in enumerate(assign):
        pos = 0
        for li, gi in enumerate(a):
            t = tracks[gi]
            ref[s, pos : pos + t.size] = t
            if t.size:
                reset[s, pos] = True
            if t.size < seg(t.size):
                reset[s, pos + t.size] = True  # intra-shard pad gap
            pos += seg(t.size)
            offsets[s, li + 1] = pos
        offsets[s, len(a) + 1 :] = pos
        if pos < Rs:
            reset[s, pos] = True  # padding is its own track
    return ref, reset, offsets, assign


@partial(jax.jit, static_argnames=("mesh", "ckpt", "std"))
def sharded_sdtw(
    queries: jnp.ndarray,  # (B, Q) f32, B divisible by mesh dp size
    row_onehot: jnp.ndarray,  # (B, Q) f32
    ref: jnp.ndarray,  # (n_tp, Rs) f32 from shard_tracks
    reset: jnp.ndarray,  # (n_tp, Rs) bool
    mesh: Mesh,
    ckpt: int = 512,
    std: bool = False,
) -> jnp.ndarray:
    """Batched sDTW over the mesh; returns last_row (B, n_tp*Rs) f32,
    replicated over 'tp' and sharded over 'dp' like the inputs."""

    def local(q, oh, r, rs):
        # q: (B/dp, Q); r: (1, Rs) this shard's track block
        lr = sdtw_scan(q, oh, r[0], rs[0], ckpt=ckpt, std=std)
        # (B/dp, Rs) -> gather all shards' columns
        out = jax.lax.all_gather(lr, "tp", axis=1, tiled=True)
        return out

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("tp", None), P("tp", None)),
        out_specs=P("dp", None),
        check_vma=False,
    )(queries, row_onehot, ref, reset)


@partial(
    jax.jit,
    static_argnames=("mesh", "ckpt", "td", "use_pallas", "Rs", "lane",
                     "clip_shift", "interpret"),
)
def sharded_engine(
    queries: jnp.ndarray,   # (B, Q) f32, B divisible by dp
    row_onehot: jnp.ndarray,  # (B, Q)
    qlens: jnp.ndarray,     # (B,) i32
    ref: jnp.ndarray,       # (n_tp, Rs) from shard_tracks
    reset: jnp.ndarray,     # (n_tp, Rs)
    ypad: jnp.ndarray,      # (n_tp, D) wavefront inputs per shard
    rspad: jnp.ndarray,     # (n_tp, D)
    mesh: Mesh,
    Rs: int,
    lane: int,
    ckpt: int = 512,
    td: int = WF_TD,
    use_pallas: bool = False,
    clip_shift: bool = False,
    interpret: bool = False,
):
    """Production multi-chip engine: per-shard sDTW (Pallas wavefront on
    TPU shards, lax.scan otherwise) + all_gather of the column-indexed
    last rows over 'tp'. With clip_shift=True the caller passed queries
    through shift_queries_for_clip, and the free-start lane lane+1-qlen
    is re-derived from qlens on device so clipped reads ride the
    wavefront's uniform emission exactly (the scan branch reads the
    UNSHIFTED layout via row_onehot and must not get shifted queries).
    Returns (B, n_tp*Rs) sharded over 'dp'."""
    from ..ops.sdtw_pallas import sdtw_wavefront

    def local(q, oh, ql, r, rs, yp, rp):
        if use_pallas:
            sl = None
            if clip_shift:
                W = lane + 1
                sl = jnp.where((ql > 0) & (ql < W), W - ql, 0).astype(jnp.int32)
            ds = sdtw_wavefront(
                q, yp, rp, lane=lane, td=td, start_lanes=sl,
                interpret=interpret,
            )
            lr = jax.lax.slice_in_dim(ds, lane, lane + Rs, axis=1)
        else:
            lr = sdtw_scan(q, oh, r[0], rs[0], ckpt=ckpt)
        return jax.lax.all_gather(lr, "tp", axis=1, tiled=True)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp", None), P("dp"),
            P("tp", None), P("tp", None), P("tp", None), P("tp", None),
        ),
        out_specs=P("dp", None),
        check_vma=False,
    )(queries, row_onehot, qlens, ref, reset, ypad, rspad)


@partial(jax.jit, static_argnames=("mesh", "n_micro"))
def ring_fullref_lastrow(
    queries: jnp.ndarray,   # (B, Q) f32, replicated; B divisible by n_micro
    row_onehot: jnp.ndarray,  # (B, Q)
    seg_ref: jnp.ndarray,   # (n_tp, Rs) contiguous COLUMN segments
    seg_reset: jnp.ndarray,  # (n_tp, Rs) bool track-start resets (may be 0)
    mesh: Mesh,
    n_micro: int,
) -> jnp.ndarray:
    """Reference-axis sharding by contiguous *columns* (not whole tracks):
    the scan for a huge --full-ref contig (SURVEY §5 long-context). The
    DP column scan is sequential in the reference axis, so segment s's
    carry feeds segment s+1 -- a *pipeline* over the mesh's 'tp' ring.
    The read batch is cut into n_micro microbatches; at schedule step t,
    device s scans microbatch (t - s) over its column segment while its
    neighbor works the previous microbatch, and the O(B/n_micro x Q)
    carry column hops rings via ppermute. Bubble fraction =
    (n_tp-1)/(n_micro+n_tp-1). Track-start reset masks are honored, so
    any concatenated multi-track layout works; DP state flows across
    segment boundaries otherwise.

    Returns last_row (B, n_tp*Rs) replicated.
    """
    B, Q = queries.shape
    n_tp = seg_ref.shape[0]
    Rs = seg_ref.shape[1]
    Bm = B // n_micro
    BIGv = np.float32(3.0e38)  # np, not jnp: avoids a trace-time device const

    def local(q, oh, seg, rst):
        s = jax.lax.axis_index("tp")
        seg1 = seg[0]   # (Rs,)
        rst1 = rst[0]
        nsteps = n_micro + n_tp - 1

        def scan_segment(carry_col, qm, ohm):
            def col_step(c, inp):
                y, rs = inp
                local_c = jnp.abs(qm - y)
                c = jnp.where(rs, BIGv, c)
                # the single-device scan's column update, shared so the
                # ring engine can never drift from sdtw_scan's numerics
                new = _column_update(c, local_c)
                lr = jnp.sum(new * ohm, axis=1)
                return new, lr
            col, lr_cols = jax.lax.scan(col_step, carry_col, (seg1, rst1))
            return col, lr_cols.T  # (Bm, Rs)

        def step(state, t):
            incoming, out = state
            m = t - s
            active = jnp.logical_and(m >= 0, m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            qm = jax.lax.dynamic_slice_in_dim(q, m_c * Bm, Bm, axis=0)
            ohm = jax.lax.dynamic_slice_in_dim(oh, m_c * Bm, Bm, axis=0)
            # segment 0 starts fresh; others take the neighbor's carry
            init_col = jnp.where(s == 0, BIGv, incoming)
            col, lr_seg = scan_segment(init_col, qm, ohm)
            out = jnp.where(
                active,
                jax.lax.dynamic_update_slice_in_dim(out, lr_seg[None], m_c, axis=0),
                out,
            )
            outgoing = jnp.where(active, col, incoming)
            nxt = jax.lax.ppermute(
                outgoing, "tp", [(i, (i + 1) % n_tp) for i in range(n_tp)]
            )
            return (nxt, out), None

        out0 = jnp.zeros((n_micro, Bm, Rs), jnp.float32)
        inc0 = jnp.full((Bm, Q), BIGv, jnp.float32)
        state, _ = jax.lax.scan(step, (inc0, out0), jnp.arange(nsteps))
        out = state[1]
        lr_local = out.reshape(B, Rs)
        return jax.lax.all_gather(lr_local, "tp", axis=1, tiled=True)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P("tp", None), P("tp", None)),
        out_specs=P(),
        check_vma=False,
    )(queries, row_onehot, seg_ref, seg_reset)


@partial(
    jax.jit,
    static_argnames=("mesh", "n_micro", "lane", "td", "unroll", "interpret"),
)
def ring_fullref_lastrow_wavefront(
    queries: jnp.ndarray,   # (B, Q) f32, replicated; B divisible by n_micro
    seg_ypad: jnp.ndarray,  # (n_tp, Rs) f32 column segments (PAD-filled tail)
    seg_rspad: jnp.ndarray,  # (n_tp, Rs) f32 track-start resets (1.0/0.0)
    mesh: Mesh,
    n_micro: int,
    lane: int,
    td: int = WF_TD,
    unroll: int = 8,
    interpret: bool = False,
    start_lanes: jnp.ndarray | None = None,  # (B,) i32, replicated
) -> jnp.ndarray:
    """ring_fullref_lastrow with the production wavefront kernel.

    Same microbatch pipeline over the 'tp' ring, but the hop payload is
    the wavefront's cross-tile state -- the last two anti-diagonals
    (2 x (Bm, Q)) plus the skewed reference/reset windows (2 x (1, Q)) --
    via sdtw_wavefront_carry, which makes chained segments bit-identical
    to one kernel pass over the concatenation.

    The kernel emits diag-indexed scores: global diagonal d holds the
    last-row value of column d - lane, so the gathered (B, n_tp*Rs)
    array is the column-indexed last row shifted by `lane`. The tail of
    seg_ypad must carry >= lane PAD columns (prepare pads R+Q up, see
    runtime/pipeline.py) so every real column's emission lands inside
    the gathered span; this function re-aligns and returns (B, n_tp*Rs)
    column-indexed, BIG in the (invalid) tail -- a drop-in replacement
    for ring_fullref_lastrow's output.
    """
    from ..ops.sdtw_pallas import BIG as WBIG
    from ..ops.sdtw_pallas import PAD as WPAD
    from ..ops.sdtw_pallas import sdtw_wavefront_carry

    B, Q = queries.shape
    n_tp, Rs = seg_ypad.shape
    Bm = B // n_micro
    if start_lanes is None:
        start_lanes = jnp.zeros((B,), jnp.int32)

    def local(q, fs, yp, rp):
        s = jax.lax.axis_index("tp")
        yseg = yp.reshape(1, Rs)
        rseg = rp.reshape(1, Rs)
        nsteps = n_micro + n_tp - 1
        fresh_a = jnp.full((Bm, Q), np.float32(WBIG), jnp.float32)
        fresh_yw = jnp.full((1, Q), np.float32(WPAD), jnp.float32)
        fresh_rw = jnp.zeros((1, Q), jnp.float32)

        def step(state, t):
            (in_a1, in_a2, in_yw, in_rw), out = state
            m = t - s
            active = jnp.logical_and(m >= 0, m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            qm = jax.lax.dynamic_slice_in_dim(q, m_c * Bm, Bm, axis=0)
            fsm = jax.lax.dynamic_slice_in_dim(fs, m_c * Bm, Bm, axis=0)
            # segment 0 starts fresh; others seed from the neighbor
            a1 = jnp.where(s == 0, fresh_a, in_a1)
            a2 = jnp.where(s == 0, fresh_a, in_a2)
            yw = jnp.where(s == 0, fresh_yw, in_yw)
            rw = jnp.where(s == 0, fresh_rw, in_rw)
            o, a1n, a2n, ywn, rwn = sdtw_wavefront_carry(
                qm, yseg, rseg, a1, a2, yw, rw,
                lane=lane, td=td, unroll=unroll, interpret=interpret,
                start_lanes=fsm,
            )
            out = jnp.where(
                active,
                jax.lax.dynamic_update_slice_in_dim(out, o[None], m_c, axis=0),
                out,
            )
            og = [
                jnp.where(active, n, i)
                for n, i in ((a1n, in_a1), (a2n, in_a2), (ywn, in_yw), (rwn, in_rw))
            ]
            perm = [(i, (i + 1) % n_tp) for i in range(n_tp)]
            nxt = tuple(jax.lax.ppermute(x, "tp", perm) for x in og)
            return (nxt, out), None

        out0 = jnp.zeros((n_micro, Bm, Rs), jnp.float32)
        init = (fresh_a, fresh_a, fresh_yw, fresh_rw)
        state, _ = jax.lax.scan(step, (init, out0), jnp.arange(nsteps))
        lr_diag = state[1].reshape(B, Rs)
        g = jax.lax.all_gather(lr_diag, "tp", axis=1, tiled=True)
        # diag -> column indexing: drop the first `lane` slots, BIG-pad
        # the tail (those columns are ypad PAD, masked invalid upstream)
        lr = g[:, lane:]
        return jnp.pad(
            lr, ((0, 0), (0, lane)), constant_values=np.float32(3.0e38)
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P("tp", None), P("tp", None)),
        out_specs=P(),
        check_vma=False,
    )(queries, start_lanes, seg_ypad, seg_rspad)


def sharded_sdtw_step(
    mesh: Mesh,
    queries: list[np.ndarray],
    tracks: list[np.ndarray],
    pad_q: int | None = None,
    ckpt: int = 512,
    std: bool = False,
):
    """Host-side convenience: pad/shard inputs, run one sharded step.

    Returns (last_row (B, n_tp*Rs) np.ndarray, qlens, shard offsets,
    assignment) -- enough to run window-argmin candidate extraction per
    global track on the host.
    """
    n_dp = mesh.shape["dp"]
    n_tp = mesh.shape["tp"]
    qb, qlens, onehot = make_query_batch(queries, pad_q=pad_q)
    B = qb.shape[0]
    if B % n_dp:
        padb = n_dp - B % n_dp
        qb = np.pad(qb, ((0, padb), (0, 0)))
        onehot = np.pad(onehot, ((0, padb), (0, 0)))
    ref, reset, offsets, assign = shard_tracks(tracks, n_tp, ckpt=ckpt)
    lr = sharded_sdtw(
        jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(ref),
        jnp.asarray(reset), mesh, ckpt=ckpt, std=std,
    )
    return np.asarray(lr)[:B], qlens, offsets, assign
