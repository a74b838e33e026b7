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
                       tracks is free). Each shard scans only its
                       tracks and reduces its own last-row block to a
                       top-5 candidate list; an O(B*k) all_gather +
                       merge (candidates_dev.merge_gathered_topk)
                       replaces any O(R) collective.
  tp ring              a single huge contig (--full-ref genomes) splits
                       by COLUMNS instead; the DP carry pipelines
                       around the ring via ppermute (microbatched), and
                       each shard folds its segment into per-window
                       (min, first-pos) accumulators -- the chunked-ref
                       fold of ops/chunked_ref.py, per shard -- so
                       device memory stays bounded at any contig size.
                       Split boundary windows merge via their gathered
                       partials (_ring_extract_merge).

Candidate ranking (window argmin + top-5, src/sigfish.c:891-900,575-626)
runs shard-locally; only O(B*k) payloads ride the collectives and only
(B, 5) results reach the host. ring_fullref_lastrow[_wavefront] are the
lr-level ORACLES the top-k engines are tested against (and the round-4
production path); collectives ride ICI via XLA GSPMD -- no NCCL/MPI
analog exists or is needed.
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
                     "clip_shift", "interpret", "k"),
)
def sharded_engine_topk(
    queries: jnp.ndarray,   # (B, Q) f32, B divisible by dp
    row_onehot: jnp.ndarray,  # (B, Q)
    qlens: jnp.ndarray,     # (B,) i32
    ref: jnp.ndarray,       # (n_tp, Rs) from shard_tracks
    reset: jnp.ndarray,     # (n_tp, Rs)
    ypad: jnp.ndarray,      # (n_tp, D) wavefront inputs per shard
    rspad: jnp.ndarray,     # (n_tp, D)
    u_sh: jnp.ndarray,      # (n_tp, Rs) i32 local col-in-track (build_column_maps)
    valid_sh: jnp.ndarray,  # (n_tp, Rs) bool real-column mask
    mesh: Mesh,
    Rs: int,
    lane: int,
    ckpt: int = 512,
    td: int = WF_TD,
    use_pallas: bool = False,
    clip_shift: bool = False,
    interpret: bool = False,
    k: int = 5,
):
    """Production multi-chip engine: per-shard sDTW (Pallas wavefront on
    TPU shards, lax.scan otherwise) + per-shard candidate top-k + an
    O(B*k*n_tp) allgather/merge -- the north-star collective design.
    Nothing O(R) ever crosses the ICI: each shard reduces its (B, Rs)
    last-row block to two packed top-k lists (uniform W-wide windows for
    full-length reads; per-read qlen-wide windows serving clipped
    reads), positions globalized by the shard offset, and the gathered
    (B, n_tp*4k) payload merges with exact update_aln tie semantics
    (candidates_dev.merge_gathered_topk: shards hold disjoint W-aligned
    track ranges, so position order == global window order).

    With clip_shift=True the caller passed queries through
    shift_queries_for_clip, and the free-start lane lane+1-qlen is
    re-derived from qlens on device so clipped reads ride the
    wavefront's uniform emission exactly (the scan branch reads the
    UNSHIFTED layout via row_onehot and must not get shifted queries).

    Returns (B, 4k) f32 sharded over 'dp': [:, :2k] packed uniform-
    window top-k (valid for qlen == lane+1 reads), [:, 2k:] packed
    per-read-window top-k (valid for clipped reads). Unpack each half
    with candidates_dev.unpack_top5."""
    from ..ops.candidates_dev import (
        device_topk_candidates,
        device_window_top5,
        merge_gathered_topk,
    )
    from ..ops.sdtw_pallas import sdtw_wavefront

    W = lane + 1

    def local(q, oh, ql, r, rs, yp, rp, u_s, v_s):
        s = jax.lax.axis_index("tp")
        if use_pallas:
            sl = None
            if clip_shift:
                sl = jnp.where((ql > 0) & (ql < W), W - ql, 0).astype(jnp.int32)
            ds = sdtw_wavefront(
                q, yp, rp, lane=lane, td=td, start_lanes=sl,
                interpret=interpret,
            )
            lr = jax.lax.slice_in_dim(ds, lane, lane + Rs, axis=1)
        else:
            lr = sdtw_scan(q, oh, r[0], rs[0], ckpt=ckpt)
        # shard-local candidate reductions (positions local to the shard)
        ts_m, tp_m = device_window_top5(
            lr, ql, v_s[0], Rs, W=W, k=k, reindex=False, pack=False
        )
        ts_c, tp_c = device_topk_candidates(
            lr, ql, u_s[0], v_s[0], Rs, W=W, k=k, reindex=False, pack=False
        )
        # globalize positions: gathered layout is shard-major concat
        off = (s * np.int64(Rs)).astype(jnp.int32)
        tp_m = jnp.where(tp_m >= 0, tp_m + off, tp_m)
        tp_c = jnp.where(tp_c >= 0, tp_c + off, tp_c)
        cast = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        payload = jnp.concatenate(
            [ts_m, cast(tp_m), ts_c, cast(tp_c)], axis=1
        )  # (B/dp, 4k) -- the ONLY thing that rides the collective
        g = jax.lax.all_gather(payload, "tp", axis=1, tiled=True)
        gb = g.reshape(g.shape[0], -1, 4 * k)
        n_tp = gb.shape[1]
        main = merge_gathered_topk(
            gb[:, :, : 2 * k].reshape(g.shape[0], n_tp * 2 * k), n_tp, k
        )
        clip = merge_gathered_topk(
            gb[:, :, 2 * k :].reshape(g.shape[0], n_tp * 2 * k), n_tp, k
        )
        return jnp.concatenate([main, clip], axis=1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp", None), P("dp"),
            P("tp", None), P("tp", None), P("tp", None), P("tp", None),
            P("tp", None), P("tp", None),
        ),
        out_specs=P("dp", None),
        check_vma=False,
    )(queries, row_onehot, qlens, ref, reset, ypad, rspad, u_sh, valid_sh)


@partial(jax.jit, static_argnames=("mesh", "n_micro"))
def ring_fullref_lastrow(
    queries: jnp.ndarray,   # (B, Q) f32, replicated; B divisible by n_micro
    row_onehot: jnp.ndarray,  # (B, Q)
    seg_ref: jnp.ndarray,   # (n_tp, Rs) contiguous COLUMN segments
    seg_reset: jnp.ndarray,  # (n_tp, Rs) bool track-start resets (may be 0)
    mesh: Mesh,
    n_micro: int,
) -> jnp.ndarray:
    """[lr-level ORACLE for ring_topk_scan -- production uses the top-k
    variant; this one gathers full rows and exists for tests.]

    Reference-axis sharding by contiguous *columns* (not whole tracks):
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
    """[lr-level ORACLE for ring_topk_wavefront -- production uses the
    top-k variant; this one gathers full rows and exists for tests.]

    ring_fullref_lastrow with the wavefront kernel.

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


def _ring_extract_merge(wmin, wpos, nw_s: int, k: int):
    """Shared tail of the ring top-k engines: per-shard candidate
    extraction + O(B*k) allgather + global merge.

    wmin/wpos: (B, nw_s) per-window (first-min, first-pos) accumulators
    in the SHIFTED shard frame -- local lane w holds global window
    s*Rs/W - 1 + w; lanes 0 and nw_s-1 are the boundary PARTIALS (the
    wavefront's diag-indexed blocks start W-1 columns before the shard's
    column range, so exactly one window splits at each shard boundary:
    shard s holds the earlier 1 column of its last window and the later
    W-1 columns of its first). Payload per shard = top-k over complete
    windows + the two partials = (B, 2k+4) f32; the merge re-joins each
    split window with strict < keeping the EARLIER shard's partial
    (first-min-wins inside a window, sigfish.c:895) and then runs the
    same global selection as the tracks-mode merge (update_aln tie
    order via position comparison). Returns packed (B, 2k)."""
    from ..ops.candidates_dev import BIG as CBIG
    from ..ops.candidates_dev import select_topk_cands

    B = wmin.shape[0]
    cast = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    if nw_s > 2:
        ts, tp = select_topk_cands(
            wmin[:, 1 : nw_s - 1], wpos[:, 1 : nw_s - 1], k
        )
    else:  # degenerate shard width (Rs == W): only boundary windows
        ts = jnp.full((B, k), CBIG, jnp.float32)
        tp = jnp.full((B, k), -1, jnp.int32)
    payload = jnp.concatenate(
        [ts, cast(tp), wmin[:, :1], cast(wpos[:, :1]),
         wmin[:, nw_s - 1 :], cast(wpos[:, nw_s - 1 :])],
        axis=1,
    )  # (B, 2k+4) -- the ONLY thing on the collective
    g = jax.lax.all_gather(payload, "tp", axis=1, tiled=True)
    gb = g.reshape(B, -1, 2 * k + 4)
    n_tp = gb.shape[1]
    sc5 = gb[:, :, :k].reshape(B, n_tp * k)
    pp5 = jax.lax.bitcast_convert_type(
        gb[:, :, k : 2 * k], jnp.int32
    ).reshape(B, n_tp * k)
    m0 = gb[:, :, 2 * k]
    p0 = jax.lax.bitcast_convert_type(gb[:, :, 2 * k + 1], jnp.int32)
    mL = gb[:, :, 2 * k + 2]
    pL = jax.lax.bitcast_convert_type(gb[:, :, 2 * k + 3], jnp.int32)
    # boundary window between s and s+1 = shard s's last partial (the
    # EARLIER column) merged with shard s+1's first partial; the last
    # shard's trailing window has no later part (PAD tail)
    m0n = jnp.concatenate([m0[:, 1:], jnp.full((B, 1), CBIG)], axis=1)
    p0n = jnp.concatenate(
        [p0[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1
    )
    take = m0n < mL  # strict: earlier shard wins ties
    bm = jnp.where(take, m0n, mL)
    bp = jnp.where(take, p0n, pL)
    cand_s = jnp.concatenate([sc5, bm], axis=1)
    cand_p = jnp.concatenate([pp5, bp], axis=1)
    ts, tp = select_topk_cands(cand_s, cand_p, k)
    return jnp.concatenate([ts, cast(tp)], axis=1)


@partial(
    jax.jit,
    static_argnames=("mesh", "n_micro", "lane", "td", "unroll", "W", "Rs",
                     "n_sub", "interpret", "k"),
)
def ring_topk_wavefront(
    queries: jnp.ndarray,      # (B, Q) f32 replicated (clip-shifted)
    start_lanes: jnp.ndarray,  # (B,) i32 free-start lanes (clip shift)
    seg_ypad: jnp.ndarray,     # (n_tp, Rs) f32 diag column segments (PAD tail)
    seg_rspad: jnp.ndarray,    # (n_tp, Rs) f32 track-start resets
    seg_vdiag: jnp.ndarray,    # (n_tp, Rs) bool diag-indexed valid mask
    mesh: Mesh,
    n_micro: int,
    lane: int,
    W: int,
    Rs: int,
    n_sub: int = 1,
    td: int = WF_TD,
    unroll: int = 8,
    interpret: bool = False,
    k: int = 5,
) -> jnp.ndarray:
    """Production ring engine: microbatch-pipelined wavefront over the
    'tp' ring with BOUNDED device memory and an O(B*k) merge.

    Replaces ring_fullref_lastrow_wavefront + device_window_top5 over
    the gathered (B, n_tp*Rs) rows (the round-4 design): each shard now
    folds every Ds-diagonal sub-chunk of its segment into a per-window
    (first-min, first-pos) accumulator (the chunked-ref fold of
    ops/chunked_ref.py, here per shard) -- peak per-device memory is
    O(Bm*Ds) transient scores + O(B * Rs/W) window accumulators +
    O(Bm*Q) carry, independent of the reference length, and the only
    collective payloads are the O(Bm*Q) carry hops and the (B, 2k+4)
    candidate gather. n_sub sub-chunks per shard (n_sub divides Rs;
    Ds = Rs/n_sub must be a multiple of lcm(W, td) -- Core sizes Rs
    accordingly), so `--ref-chunk` composes with `--mesh`.

    Exactness: the carry chain is bit-identical to one kernel pass over
    the concatenation (sdtw_wavefront_carry contract); the fold + merge
    reproduce device_window_top5's selection over the full last row
    exactly (see _ring_extract_merge / chunked_ref.py for the window-
    split argument). Returns packed (B, 2k), replicated."""
    from ..ops.candidates_dev import BIG as CBIG
    from ..ops.sdtw_pallas import BIG as WBIG
    from ..ops.sdtw_pallas import PAD as WPAD
    from ..ops.sdtw_pallas import sdtw_wavefront_carry

    B, Q = queries.shape
    n_tp = seg_ypad.shape[0]
    Bm = B // n_micro
    Ds = Rs // n_sub
    assert n_sub * Ds == Rs and Ds % W == 0 and Ds % td == 0
    npc = Ds // W
    p = (-(W - 1)) % W
    nw_c = (p + Ds + W - 1) // W   # windows touched per sub-chunk
    nw_s = Rs // W + 1             # shard frame: [s*Rs/W - 1, (s+1)*Rs/W)
    loc_base = 1 - (W - 1 + p) // W  # 0 for W>1, 1 for W==1

    def local(q, fs, yp, rp, vd):
        s = jax.lax.axis_index("tp")
        yp3 = yp.reshape(n_sub, 1, Ds)
        rp3 = rp.reshape(n_sub, 1, Ds)
        vd2 = vd.reshape(n_sub, Ds)
        nsteps = n_micro + n_tp - 1
        fresh_a = jnp.full((Bm, Q), np.float32(WBIG), jnp.float32)
        fresh_yw = jnp.full((1, Q), np.float32(WPAD), jnp.float32)
        fresh_rw = jnp.zeros((1, Q), jnp.float32)
        widx = jnp.arange(nw_c, dtype=jnp.int32)[None, :]

        def step(state, t):
            (in_a1, in_a2, in_yw, in_rw), wmin_all, wpos_all = state
            m = t - s
            active = jnp.logical_and(m >= 0, m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            qm = jax.lax.dynamic_slice_in_dim(q, m_c * Bm, Bm, axis=0)
            fsm = jax.lax.dynamic_slice_in_dim(fs, m_c * Bm, Bm, axis=0)
            a1 = jnp.where(s == 0, fresh_a, in_a1)
            a2 = jnp.where(s == 0, fresh_a, in_a2)
            yw = jnp.where(s == 0, fresh_yw, in_yw)
            rw = jnp.where(s == 0, fresh_rw, in_rw)
            wmin0 = jnp.full((Bm, nw_s), CBIG, jnp.float32)
            wpos0 = jnp.full((Bm, nw_s), -1, jnp.int32)

            def sub(carry, xs):
                a1, a2, yw, rw, wmin, wpos = carry
                ypc, rpc, vdc, c = xs
                o, a1, a2, yw, rw = sdtw_wavefront_carry(
                    qm, ypc, rpc, a1, a2, yw, rw,
                    lane=lane, td=td, unroll=unroll, interpret=interpret,
                    start_lanes=fsm,
                )
                block = jnp.where(vdc[None, :], o, CBIG)
                if p or nw_c * W != p + Ds:
                    block = jnp.pad(
                        block, ((0, 0), (p, nw_c * W - Ds - p)),
                        constant_values=CBIG,
                    )
                wsc = block.reshape(Bm, nw_c, W)
                amin = jnp.argmin(wsc, axis=2)  # first-min (sigfish.c:895)
                pmin = jnp.take_along_axis(
                    wsc, amin[:, :, None], axis=2
                )[:, :, 0]
                col0 = (
                    s * np.int64(Rs) + c * np.int64(Ds)
                    - np.int64(W - 1 + p)
                ).astype(jnp.int32)
                ppos = col0 + widx * np.int32(W) + amin.astype(jnp.int32)
                loc0 = (c * np.int64(npc) + np.int64(loc_base)).astype(
                    jnp.int32
                )
                cur_m = jax.lax.dynamic_slice(wmin, (0, loc0), (Bm, nw_c))
                cur_p = jax.lax.dynamic_slice(wpos, (0, loc0), (Bm, nw_c))
                take = pmin < cur_m  # earlier sub-chunk wins ties
                wmin = jax.lax.dynamic_update_slice(
                    wmin, jnp.where(take, pmin, cur_m), (0, loc0)
                )
                wpos = jax.lax.dynamic_update_slice(
                    wpos, jnp.where(take, ppos, cur_p), (0, loc0)
                )
                return (a1, a2, yw, rw, wmin, wpos), None

            (a1, a2, yw, rw, wmin, wpos), _ = jax.lax.scan(
                sub, (a1, a2, yw, rw, wmin0, wpos0),
                (yp3, rp3, vd2, jnp.arange(n_sub, dtype=jnp.int32)),
            )
            wmin_all = jnp.where(
                active,
                jax.lax.dynamic_update_slice(
                    wmin_all, wmin[None], (m_c, 0, 0)
                ),
                wmin_all,
            )
            wpos_all = jnp.where(
                active,
                jax.lax.dynamic_update_slice(
                    wpos_all, wpos[None], (m_c, 0, 0)
                ),
                wpos_all,
            )
            og = [
                jnp.where(active, n, i)
                for n, i in ((a1, in_a1), (a2, in_a2), (yw, in_yw), (rw, in_rw))
            ]
            perm = [(i, (i + 1) % n_tp) for i in range(n_tp)]
            nxt = tuple(jax.lax.ppermute(x, "tp", perm) for x in og)
            return ((nxt), wmin_all, wpos_all), None

        init = (fresh_a, fresh_a, fresh_yw, fresh_rw)
        wmin_all0 = jnp.zeros((n_micro, Bm, nw_s), jnp.float32)
        wpos_all0 = jnp.zeros((n_micro, Bm, nw_s), jnp.int32)
        state, _ = jax.lax.scan(
            step, (init, wmin_all0, wpos_all0), jnp.arange(nsteps)
        )
        wmin = state[1].reshape(B, nw_s)
        wpos = state[2].reshape(B, nw_s)
        return _ring_extract_merge(wmin, wpos, nw_s, k)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P("tp", None), P("tp", None), P("tp", None)),
        out_specs=P(),
        check_vma=False,
    )(queries, start_lanes, seg_ypad, seg_rspad, seg_vdiag)


@partial(
    jax.jit,
    static_argnames=("mesh", "n_micro", "W", "Rs", "ckpt", "k"),
)
def ring_topk_scan(
    queries: jnp.ndarray,     # (B, Q) f32 replicated
    row_onehot: jnp.ndarray,  # (B, Q) f32
    seg_ref: jnp.ndarray,     # (n_tp, Rs) contiguous column segments
    seg_reset: jnp.ndarray,   # (n_tp, Rs) bool track-start resets
    seg_vcol: jnp.ndarray,    # (n_tp, Rs) bool column-indexed valid mask
    mesh: Mesh,
    n_micro: int,
    W: int,
    Rs: int,
    ckpt: int = 512,
    k: int = 5,
) -> jnp.ndarray:
    """ring_topk_wavefront's lax.scan twin (CPU-portable engine and
    numerics cross-check): same microbatch ring pipeline, but the
    per-step segment scan emits COLUMN-indexed rows [s*Rs, (s+1)*Rs) --
    every window is complete, so the shard frame's lane 0 stays empty
    and the shard's last window rides the boundary-merge lane against
    the next shard's (empty) first partial. Byte-compatible packed
    (B, 2k) output."""
    from ..ops.candidates_dev import BIG as CBIG

    B, Q = queries.shape
    n_tp = seg_ref.shape[0]
    Bm = B // n_micro
    assert Rs % W == 0
    nw = Rs // W
    nw_s = nw + 1
    BIGv = np.float32(3.0e38)
    widx = jnp.arange(nw, dtype=jnp.int32)[None, :]

    def local(q, oh, seg, rst, vc):
        s = jax.lax.axis_index("tp")
        seg1 = seg[0]
        rst1 = rst[0]
        vc1 = vc[0]
        nsteps = n_micro + n_tp - 1

        def scan_segment(carry_col, qm, ohm):
            def col_step(c, inp):
                y, rs = inp
                local_c = jnp.abs(qm - y)
                c = jnp.where(rs, BIGv, c)
                new = _column_update(c, local_c)
                lr = jnp.sum(new * ohm, axis=1)
                return new, lr
            col, lr_cols = jax.lax.scan(col_step, carry_col, (seg1, rst1))
            return col, lr_cols.T  # (Bm, Rs)

        def step(state, t):
            incoming, wmin_all, wpos_all = state
            m = t - s
            active = jnp.logical_and(m >= 0, m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            qm = jax.lax.dynamic_slice_in_dim(q, m_c * Bm, Bm, axis=0)
            ohm = jax.lax.dynamic_slice_in_dim(oh, m_c * Bm, Bm, axis=0)
            init_col = jnp.where(s == 0, BIGv, incoming)
            col, lr_seg = scan_segment(init_col, qm, ohm)
            block = jnp.where(vc1[None, :], lr_seg, CBIG)
            wsc = block.reshape(Bm, nw, W)
            amin = jnp.argmin(wsc, axis=2)
            pmin = jnp.take_along_axis(wsc, amin[:, :, None], axis=2)[:, :, 0]
            ppos = (
                (s * np.int64(Rs)).astype(jnp.int32)
                + widx * np.int32(W) + amin.astype(jnp.int32)
            )
            wmin = jnp.concatenate(
                [jnp.full((Bm, 1), CBIG, jnp.float32), pmin], axis=1
            )
            wpos = jnp.concatenate(
                [jnp.full((Bm, 1), -1, jnp.int32), ppos], axis=1
            )
            wmin_all = jnp.where(
                active,
                jax.lax.dynamic_update_slice(
                    wmin_all, wmin[None], (m_c, 0, 0)
                ),
                wmin_all,
            )
            wpos_all = jnp.where(
                active,
                jax.lax.dynamic_update_slice(
                    wpos_all, wpos[None], (m_c, 0, 0)
                ),
                wpos_all,
            )
            outgoing = jnp.where(active, col, incoming)
            nxt = jax.lax.ppermute(
                outgoing, "tp", [(i, (i + 1) % n_tp) for i in range(n_tp)]
            )
            return (nxt, wmin_all, wpos_all), None

        inc0 = jnp.full((Bm, Q), BIGv, jnp.float32)
        wmin_all0 = jnp.zeros((n_micro, Bm, nw_s), jnp.float32)
        wpos_all0 = jnp.zeros((n_micro, Bm, nw_s), jnp.int32)
        state, _ = jax.lax.scan(
            step, (inc0, wmin_all0, wpos_all0), jnp.arange(nsteps)
        )
        wmin = state[1].reshape(B, nw_s)
        wpos = state[2].reshape(B, nw_s)
        return _ring_extract_merge(wmin, wpos, nw_s, k)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P("tp", None), P("tp", None), P("tp", None)),
        out_specs=P(),
        check_vma=False,
    )(queries, row_onehot, seg_ref, seg_reset, seg_vcol)


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
