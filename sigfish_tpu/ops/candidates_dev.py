"""On-device candidate extraction: window-argmin + top-5, fused after the
wavefront kernel so only (B, 5) scores/positions cross the host link.

Why: the last-row score matrix is (B, R) -- 125 MB at B=512 on the nCoV
reference -- and the device->host link is the throughput ceiling. The
reference's candidate semantics (sigfish.c:891-900 window scan,
update_aln:575-626) compress that to 5 (score, pos) pairs per read:

  - windows of width qlen_b per (contig,strand) track, first-min-wins
    within a window (strict <, sigfish.c:895)
  - top-5 across windows in track order, later candidate wins ties
    (update_aln's `score > aln[l].score` insertion, sigfish.c:577-583)
  - d1 = best score, d2 = second best (aln[4], aln[3])

The per-read window width (qlen_b varies for short reads,
sigfish.c:457-461) makes this a *segmented* min: per-read window ids
from a cumsum over window-start flags, per-window (min, first-argmin)
from vmapped segment_min scatters, fully vectorized over the (B, R)
grid. Top-5 is five masked argmin passes over the window lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, NOT jnp: a module-level jnp.float32 is a device-resident
# array that every jit lowering embeds as an MLIR constant via a
# device->host fetch (fragile over remote-device transports, and it
# forces backend init at import).
BIG = np.float32(3.0e38)


def build_column_maps(
    offsets: np.ndarray, R: int, track_sizes: list[int] | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Static per-core arrays for the concatenated track layout.

    Returns (u (R,) i32 local column index within its track,
             valid (R,) bool real columns vs padding).
    offsets: (T+1,) track start offsets; R: padded concat length;
    track_sizes: real (unpadded) track lengths -- defaults to the offset
    deltas (tight layout).
    """
    u = np.arange(R, dtype=np.int32)
    total = int(offsets[-1])
    valid = np.zeros(R, dtype=bool)
    for t in range(len(offsets) - 1):
        lo, hi = int(offsets[t]), int(offsets[t + 1])
        u[lo:hi] -= lo
        size = hi - lo if track_sizes is None else int(track_sizes[t])
        valid[lo : lo + size] = True
    u[total:] = 0
    return u, valid


@partial(jax.jit, static_argnames=("R", "W", "k", "reindex", "pack"))
def device_topk_candidates(
    scores: jnp.ndarray,   # (B, D) diag scores (reindex=True) or (B, R) last row
    qlens: jnp.ndarray,    # (B,) i32
    u: jnp.ndarray,        # (R,) i32 local column index per concat column
    valid: jnp.ndarray,    # (R,) bool
    R: int,
    W: int = 512,          # static upper bound on the window width (>= max qlen)
    k: int = 5,
    reindex: bool = True,
    pack: bool = False,
):
    """Returns (top_scores (B, k) f32 best-first, top_pos (B, k) i32 global
    concat-column argmin positions; empty slots have score BIG and pos -1).

    Unlike :func:`device_window_top5` (static W-wide windows, the
    full-length fast path) this handles per-read window widths -- it is
    the device path for CLIPPED reads (qlen != W, ref sigfish.c:457-461
    short-read semantics), replacing the O(R*qlen) per-read host
    recompute. The segmented min scan is a hand-rolled Hillis-Steele
    over log2(R) static shifts: pure elementwise select/min steps, no
    scatter (TPU scatters serialize: a segment_min formulation ran
    680 ms/call; lax.associative_scan compiled pathologically on the
    TPU backend). Only the window MIN rides the scan; the k winners'
    first-min positions are recovered afterwards from a (B, k, W)
    windowed gather -- strict-< first-occurrence, bitwise equality
    (sigfish.c:895 semantics). With pack=True returns one (B, 2k) f32
    buffer (positions bitcast; see unpack_top5)."""
    B = scores.shape[0]
    if reindex:
        # diag->column reindex is a per-row LEFT SHIFT by qlen-1
        # (< W <= D-R+1, so no wrapped element reaches column < R).
        # A (B, R) take_along_axis gather here cost ~150 ms/call on TPU
        # (gathers serialize); the binary-decomposed conditional roll is
        # log2(W) elementwise selects instead.
        sh = jnp.maximum(qlens, 1) - 1
        x = scores
        step = 1
        while step < W:
            bit = (sh & step) > 0
            x = jnp.where(bit[:, None], jnp.roll(x, -step, axis=1), x)
            step *= 2
        lr = x[:, :R]
    else:
        lr = scores[:, :R]
    lr = jnp.where(valid[None, :], lr, BIG)

    # per-read window starts: local column index multiple of qlen_b;
    # invalid columns also start a "window" so no scan state crosses a
    # track/pad boundary
    qw = jnp.maximum(qlens, 1)[:, None]
    ws = ((u[None, :] % qw) == 0) | ~valid[None, :]

    # inclusive segmented min scan, left to right: at offset d, element
    # j absorbs element j-d unless a segment start lies inside
    # (j-d, j] (tracked by the accumulated flag)
    f = ws
    m = lr
    d = 1
    while d < R:
        fL = jnp.pad(f[:, :-d], ((0, 0), (d, 0)), constant_values=True)
        mL = jnp.pad(m[:, :-d], ((0, 0), (d, 0)), constant_values=BIG)
        m = jnp.where(f, m, jnp.minimum(m, mL))
        f = f | fL
        d *= 2

    # window ends: next column starts a new window, or last column
    we = jnp.concatenate([ws[:, 1:], jnp.ones((B, 1), dtype=bool)], axis=1)
    we = we & valid[None, :]
    wm = jnp.where(we, m, BIG)

    top_s = []
    top_e = []
    rows = jnp.arange(B)
    for _ in range(k):
        rev = wm[:, ::-1]
        ar = jnp.argmin(rev, axis=1)
        pick = R - 1 - ar  # latest window wins ties (update_aln semantics)
        sc = jnp.take_along_axis(wm, pick[:, None], axis=1)[:, 0]
        top_s.append(sc)
        top_e.append(pick.astype(jnp.int32))
        wm = wm.at[rows, pick].set(BIG)
    ts = jnp.stack(top_s, axis=1)    # (B, k) winner scores
    te = jnp.stack(top_e, axis=1)    # (B, k) winner window END columns

    # recover each winner's first-min position: window start from the
    # end column's local index, then the first bitwise-equal value in a
    # W-wide gather (q <= W for clipped reads)
    u_pick = jnp.take(u, te)                          # (B, k) local idx
    start = te - (u_pick % jnp.maximum(qlens, 1)[:, None])
    lrp = jnp.pad(lr, ((0, 0), (0, W)), constant_values=BIG)
    lanes = jnp.arange(W, dtype=jnp.int32)
    gidx = start[:, :, None] + lanes[None, None, :]   # (B, k, W)
    vals = jnp.take_along_axis(
        lrp[:, None, :], jnp.minimum(gidx, R + W - 1), axis=2
    )
    inwin = gidx <= te[:, :, None]
    hit = (vals == ts[:, :, None]) & inwin
    first = jnp.argmax(hit, axis=2).astype(jnp.int32)  # first True
    tp = jnp.where(ts >= BIG, -1, start + first)

    if pack:
        return jnp.concatenate(
            [ts, jax.lax.bitcast_convert_type(tp.astype(jnp.int32), jnp.float32)],
            axis=1,
        )
    return ts, tp


@partial(jax.jit, static_argnames=("R", "W", "k", "reindex", "pack"))
def device_window_top5(
    scores: jnp.ndarray,   # (B, D) diag scores (reindex=True) or (B, >=R) last row
    qlens: jnp.ndarray,    # (B,) i32 (only used for the diag reindex)
    valid: jnp.ndarray,    # (R,) bool, False on pad columns
    R: int,
    W: int,
    k: int = 5,
    reindex: bool = True,
    pack: bool = False,
):
    """Uniform-window-width candidate extraction (the production path).

    Requires the track layout from pad_tracks(..., align=W): every track
    starts at a multiple of W, so the reference's per-track windows of
    width qlen (sigfish.c:891) coincide with a static (B, R/W, W) reshape
    for every read whose qlen == W -- which is all full-length reads
    (qlen < W clipped reads go through device_topk_candidates).
    Compiles in O(1) ops regardless of R (the segmented-scan variant's
    compile time grows with R).

    Returns (top_scores (B, k) best-first, top_pos (B, k) i32 global
    columns; empty slots score >= BIG, pos -1). With pack=True the two
    are fused into one (B, 2k) f32 array (positions bitcast, exact for
    any i32) so the host fetches ONE buffer -- device->host round-trip
    latency dominates the per-batch cost on remote-device transports.
    Unpack with :func:`unpack_top5`.
    """
    B = scores.shape[0]
    if reindex:
        # diag-indexed -> column-indexed last row. For the uniform case
        # (qlen == W) this is the STATIC slice ds[:, W-1 : W-1+R] -- no
        # per-read gather. Rows whose qlen != W get garbage here; the
        # caller replaces them via the host fallback path.
        lr = jax.lax.slice_in_dim(scores, W - 1, W - 1 + R, axis=1)
    else:
        lr = scores[:, :R]
    lr = jnp.where(valid[None, :], lr, BIG)
    nwin = (R + W - 1) // W
    if nwin * W != R:  # tail-pad to a whole window (pad never wins)
        lr = jnp.pad(lr, ((0, 0), (0, nwin * W - R)), constant_values=BIG)
    wsc = lr.reshape(B, nwin, W)
    warg = jnp.argmin(wsc, axis=2)  # first-min-wins within window
    wmin = jnp.take_along_axis(wsc, warg[:, :, None], axis=2)[:, :, 0]
    wpos = warg.astype(jnp.int32) + (jnp.arange(nwin, dtype=jnp.int32) * W)[None, :]

    top_s = []
    top_p = []
    rows = jnp.arange(B)
    wm = wmin
    for _ in range(k):
        rev = wm[:, ::-1]
        ar = jnp.argmin(rev, axis=1)
        pick = nwin - 1 - ar  # latest window wins ties
        sc = jnp.take_along_axis(wm, pick[:, None], axis=1)[:, 0]
        am = jnp.take_along_axis(wpos, pick[:, None], axis=1)[:, 0]
        am = jnp.where(sc >= BIG, -1, am)
        top_s.append(sc)
        top_p.append(am)
        wm = wm.at[rows, pick].set(BIG)
    ts = jnp.stack(top_s, axis=1)
    tp = jnp.stack(top_p, axis=1)
    if pack:
        return jnp.concatenate(
            [ts, jax.lax.bitcast_convert_type(tp, jnp.float32)], axis=1
        )
    return ts, tp


def select_topk_cands(
    sc: jnp.ndarray,   # (B, C) candidate scores (BIG = empty slot)
    pos: jnp.ndarray,  # (B, C) global first-min columns (-1 for empty)
    k: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k selection rounds over an explicit candidate list: min score,
    ties resolved to the LARGEST position.

    This is update_aln's insertion order (sigfish.c:577-583, later
    candidate wins ties) expressed over an unordered candidate set:
    windows are disjoint column intervals, so comparing first-min
    positions orders candidates exactly like the reference's window
    iteration order -- the device_window_top5 selection loop's
    "latest window wins" reversed-argmin, generalized to lists whose
    array order is NOT column order (per-shard top-k lists gathered
    across a mesh). Returns (scores (B, k) best-first, pos (B, k)).
    """
    B = sc.shape[0]
    rows = jnp.arange(B)
    top_s, top_p = [], []
    for _ in range(k):
        m = jnp.min(sc, axis=1, keepdims=True)
        # among score-ties pick max position (-2 sorts below the -1 of
        # empty slots so an empty candidate only wins when all are empty)
        cp = jnp.where(sc <= m, pos, -2)
        pick = jnp.argmax(cp, axis=1)
        s = sc[rows, pick]
        p = pos[rows, pick]
        top_s.append(s)
        top_p.append(jnp.where(s >= BIG, -1, p))
        sc = sc.at[rows, pick].set(BIG)
    return jnp.stack(top_s, axis=1), jnp.stack(top_p, axis=1)


def merge_gathered_topk(
    gathered: jnp.ndarray,  # (B, n_tp * 2k) shard-major packed top-k lists
    n_tp: int,
    k: int = 5,
) -> jnp.ndarray:
    """Merge per-shard packed top-k lists into the global packed top-k.

    Correctness: any window the full-array selection would pick in round
    j <= k has at most j-1 windows ranked above it globally, hence at
    most j-1 in its own shard -- so it appears in that shard's top-k
    list, and re-running the same order relation (select_topk_cands)
    over the union of lists reproduces the full-array result exactly,
    ties included (shards hold disjoint W-aligned column ranges, so
    position order == global window order). Payload is O(B*k*n_tp) --
    the collective the north-star design calls for, replacing the
    O(B*R) row gather."""
    B = gathered.shape[0]
    blocks = gathered.reshape(B, n_tp, 2 * k)
    sc = blocks[:, :, :k].reshape(B, n_tp * k)
    pos = jax.lax.bitcast_convert_type(
        blocks[:, :, k:], jnp.int32
    ).reshape(B, n_tp * k)
    ts, tp = select_topk_cands(sc, pos, k)
    return jnp.concatenate(
        [ts, jax.lax.bitcast_convert_type(tp, jnp.float32)], axis=1
    )


def unpack_top5(packed: np.ndarray, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of device_window_top5(pack=True): (B, 2k) f32 ->
    (top_scores (B, k) f32, top_pos (B, k) i32). Returns writable copies."""
    # np.array (not ascontiguousarray): a (1, k) slice of a 1-row buffer
    # counts as contiguous, so ascontiguousarray would return a read-
    # only VIEW of the device buffer -- the callers write into these
    ts = np.array(packed[:, :k], dtype=np.float32)
    tp = np.array(packed[:, k:], dtype=np.float32).view(np.int32)
    return ts, tp
