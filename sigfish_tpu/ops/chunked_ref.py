"""Chunked-reference wavefront sDTW: bounded device memory for
multi-megabase contigs on ONE chip.

Why: the single-device path materializes the kernel's full diag-indexed
score buffer (B, D) before the fused top-5 (ops/sdtw_pallas.py
out_shape; ops/candidates_dev.py consumes it). D grows with the
reference -- at B=512 a 5M-column concatenation is a 10 GB buffer,
past v5e HBM, and DNA maps FULL contigs by default (the reference has
the same O(q*r) disease per read, sigfish.c:873 -- this module is the
"beat it" path). Fix: run the carry kernel (sdtw_wavefront_carry, the
ring-mode building block) over reference segments inside one lax.scan,
folding each segment's scores into a running per-WINDOW (min, first-pos)
accumulator. Peak device memory becomes

    O(B*Ds)                 one segment's scores (Ds ~ 32k diagonals)
  + O(B*G)                  the window accumulator, G = ~R/W windows
  + O(B*Q)                  the DP carry

-- independent of how the reference length enters the score buffer.

Exactness. The carry chain is bit-identical to one kernel call over the
concatenation (ops/sdtw_pallas.sdtw_wavefront_carry contract), and the
window fold preserves the reference's candidate semantics exactly:

  - the diag-indexed emission IS the column-indexed last row shifted by
    W-1 (lr[j] = scores[j + W - 1]), so segment s covers columns
    [s*Ds - (W-1), (s+1)*Ds - (W-1)) verbatim -- no tail carry;
  - windows of width W are globally aligned to multiples of W
    (pad_tracks(align=W) pads every track segment), so a constant left
    pad of (-(W-1)) % W == 1 column re-aligns every segment block to the
    window grid, splitting exactly one window per segment boundary;
  - the split window's two partials merge with strict `<` keeping the
    EARLIER part on ties == the reference's first-min-wins window scan
    (sigfish.c:895);
  - the final top-5 over the folded (min, pos) windows is byte-for-byte
    the selection loop of ops/candidates_dev.device_window_top5
    (latest-window-wins-ties == update_aln insertion, sigfish.c:577-583).

Clipped reads (qlen != W) are NOT served here -- their window grid is
per-read -- the pipeline routes them to the exact host per-read path
(runtime/pipeline.Core._clipped_top5), overlapped with device time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sdtw_pallas import PAD, WF_TD, sdtw_wavefront_carry

BIG = np.float32(3.0e38)

# auto-chunk once the diag-indexed score buffer would exceed this many
# columns (4*B*D bytes at B=512: 1M columns ~ 2 GB -- comfortably inside
# HBM, so the one-shot kernel keeps its lower launch overhead below it)
CHUNK_AUTO_COLS = 1 << 20


def chunk_segment_diags(W: int, td: int = WF_TD, target: int = 32768) -> int:
    """Segment length Ds: a multiple of both td (kernel grid constraint)
    and W (window grid alignment), near `target` diagonals."""
    import math

    unit = W * td // math.gcd(W, td)
    return max(1, round(target / unit)) * unit


def prepare_chunked_inputs(
    ref: np.ndarray,
    reset: np.ndarray,
    valid: np.ndarray,
    Q: int,
    W: int,
    td: int = WF_TD,
    target: int = 32768,
):
    """Host-side segment prep for :func:`sdtw_wavefront_chunked_top5`.

    ref/reset: the pad_tracks(align=W) concatenation (R,) and its track-
    start flags; valid: (R,) bool real-column mask (build_column_maps).
    Returns (ypad_seg (S,1,Ds) f32, rspad_seg (S,1,Ds) f32,
    valid_seg (S,Ds) bool, Ds, nwin_tot).
    """
    R = ref.shape[0]
    Ds = chunk_segment_diags(W, td, target)
    D = ((R + Q + Ds - 1) // Ds) * Ds
    S = D // Ds
    ypad = np.full(D, PAD, dtype=np.float32)
    ypad[:R] = ref
    rspad = np.zeros(D, dtype=np.float32)
    rspad[:R] = reset.astype(np.float32)
    assert R < D, "need Q >= 1 so the kernel has a PAD tail to flush into"
    rspad[R] = 1.0
    # segment s's diag t is column s*Ds + t - (W-1); valid outside [0, R)
    # is False (the first W-1 diagonals are partial-DP garbage, the tail
    # is PAD flush)
    vext = np.zeros(D, dtype=bool)
    vext[W - 1 : W - 1 + R] = valid
    return (
        ypad.reshape(S, 1, Ds),
        rspad.reshape(S, 1, Ds),
        vext.reshape(S, Ds),
        Ds,
        (R + W - 1) // W,
    )


@functools.partial(
    jax.jit,
    static_argnames=("lane", "W", "nwin_tot", "td", "unroll", "k", "interpret"),
)
def sdtw_wavefront_chunked_top5(
    queries: jnp.ndarray,    # (B, Q) f32 (clip-shifted like sdtw_wavefront)
    ypad_seg: jnp.ndarray,   # (S, 1, Ds) f32
    rspad_seg: jnp.ndarray,  # (S, 1, Ds) f32
    valid_seg: jnp.ndarray,  # (S, Ds) bool
    lane: int,               # W - 1
    W: int,
    nwin_tot: int,           # ceil(R / W)
    td: int = WF_TD,
    unroll: int = 8,
    k: int = 5,
    interpret: bool = False,
    start_lanes: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Segment-streamed sDTW + window fold + top-5; returns the packed
    (B, 2k) candidate buffer of device_window_top5(pack=True) --
    bit-identical to the one-shot kernel + fused top-5 at a fraction of
    the device memory. Unpack with ops.candidates_dev.unpack_top5."""
    B, Q = queries.shape
    S, _, Ds = ypad_seg.shape
    assert Ds % td == 0 and Ds % W == 0 and td % unroll == 0
    npc = Ds // W                 # whole windows per segment
    p = (-(W - 1)) % W            # left pad to the window grid (1 for W>1)
    nw_c = (p + Ds + W - 1) // W  # windows touched per segment
    G = S * npc + 2               # guard window 0 absorbs column < 0 junk

    if start_lanes is None:
        start_lanes = jnp.zeros((B,), jnp.int32)

    a1 = jnp.full((B, Q), np.float32(3.0e38), jnp.float32)
    a2 = jnp.full((B, Q), np.float32(3.0e38), jnp.float32)
    ywin = jnp.full((1, Q), np.float32(PAD), jnp.float32)
    rswin = jnp.zeros((1, Q), jnp.float32)
    wmin_g = jnp.full((B, G), BIG, jnp.float32)
    wpos_g = jnp.full((B, G), -1, jnp.int32)

    widx = jnp.arange(nw_c, dtype=jnp.int32)[None, :, None]  # (1, nw_c, 1)

    def body(carry, xs):
        a1, a2, ywin, rswin, wmin_g, wpos_g = carry
        yp, rp, vs, s = xs
        scores, a1, a2, ywin, rswin = sdtw_wavefront_carry(
            queries, yp, rp, a1, a2, ywin, rswin,
            lane=lane, td=td, unroll=unroll, interpret=interpret,
            start_lanes=start_lanes,
        )
        block = jnp.where(vs[None, :], scores, BIG)
        if p or nw_c * W != p + Ds:
            block = jnp.pad(
                block, ((0, 0), (p, nw_c * W - Ds - p)), constant_values=BIG
            )
        wsc = block.reshape(B, nw_c, W)
        amin = jnp.argmin(wsc, axis=2)  # first-min-wins (sigfish.c:895)
        pmin = jnp.take_along_axis(wsc, amin[:, :, None], axis=2)[:, :, 0]
        col0 = s * np.int32(Ds) - np.int32(W - 1) - np.int32(p)
        ppos = (col0 + widx[:, :, 0] * np.int32(W)) + amin.astype(jnp.int32)
        # fold: strict < keeps the EARLIER segment's partial on ties
        # (first-min-wins across a split window)
        gw0 = (col0 // np.int32(W)) + np.int32(1)
        cur_m = jax.lax.dynamic_slice(wmin_g, (0, gw0), (B, nw_c))
        cur_p = jax.lax.dynamic_slice(wpos_g, (0, gw0), (B, nw_c))
        take = pmin < cur_m
        wmin_g = jax.lax.dynamic_update_slice(
            wmin_g, jnp.where(take, pmin, cur_m), (0, gw0)
        )
        wpos_g = jax.lax.dynamic_update_slice(
            wpos_g, jnp.where(take, ppos, cur_p), (0, gw0)
        )
        return (a1, a2, ywin, rswin, wmin_g, wpos_g), None

    (a1, a2, ywin, rswin, wmin_g, wpos_g), _ = jax.lax.scan(
        body,
        (a1, a2, ywin, rswin, wmin_g, wpos_g),
        (ypad_seg, rspad_seg, valid_seg, jnp.arange(S, dtype=jnp.int32)),
    )

    # top-5 over the folded windows: the selection loop of
    # device_window_top5 verbatim (latest-window-wins-ties == update_aln)
    wm = jax.lax.slice_in_dim(wmin_g, 1, 1 + nwin_tot, axis=1)
    wp = jax.lax.slice_in_dim(wpos_g, 1, 1 + nwin_tot, axis=1)
    rows = jnp.arange(B)
    top_s, top_p = [], []
    for _ in range(k):
        rev = wm[:, ::-1]
        ar = jnp.argmin(rev, axis=1)
        pick = nwin_tot - 1 - ar
        sc = jnp.take_along_axis(wm, pick[:, None], axis=1)[:, 0]
        am = jnp.take_along_axis(wp, pick[:, None], axis=1)[:, 0]
        am = jnp.where(sc >= BIG, -1, am)
        top_s.append(sc)
        top_p.append(am)
        wm = wm.at[rows, pick].set(BIG)
    ts = jnp.stack(top_s, axis=1)
    tp = jnp.stack(top_p, axis=1)
    return jnp.concatenate(
        [ts, jax.lax.bitcast_convert_type(tp, jnp.float32)], axis=1
    )
