"""Batched subsequence-DTW engine (JAX; runs on TPU and CPU).

Design (TPU-first, not a port):
  the reference computes one qlen x rlen float matrix per (read, contig,
  strand) with scalar loops (src/cdtw.c:172-189) and keeps the whole
  matrix for backtracking. Here the DP runs as a *column scan* over a
  single concatenated reference track shared by the whole read batch:

    carry c[b, i] = DP column at j-1 for read b
    new[0] = |x_b0 - y_j|                     (free start on reference)
    new[i] = |x_bi - y_j| + min(c[i], c[i-1], new[i-1])

  The in-column dependency new[i-1] is eliminated with the prefix-min
  identity: with s = cumsum(local), m[i] = min(c[i], c[i-1]),
      new = s + cummin( [0, m[1]-s[0], m[2]-s[1], ...] )
  so each column is O(log Q) vector ops over the (B, Q) batch -- the shape
  the VPU wants. Track boundaries reset the carry to +inf, which exactly
  reproduces the cumulative first column of each per-contig matrix.

  Only the *last row* (row qlen-1 per read, selected by a one-hot since
  short reads have qlen < Q, ref src/sigfish.c:457-461) leaves the scan:
  that is all the candidate search needs (src/sigfish.c:891-900). The
  winner's alignment path is recovered afterwards by recomputing a small
  fresh column window on the host (exact by the subsequence free-start
  property; sigfish_tpu/native sf_subsequence + sf_subsequence_path)
  instead of storing the O(n*m) matrix. `ckpt` is the scan's column
  chunking granularity (the reference array is padded to a multiple).

  float32 everywhere: the DP is min-plus (no MXU); bf16 would corrupt
  near-tie argmin decisions that decide mapq.

The prefix-sum reassociation makes scores differ from the scalar order by
~1e-5 relative -- documented deviation, absorbed by the %.2f output format
(tests assert 1e-3 agreement and identical argmin on the real datasets).

A Pallas kernel with the same contract lives in ops/sdtw_pallas.py; this
lax.scan build is the portable fallback and the semantics oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# carry reset value; avoids inf-inf NaNs. np scalar, NOT jnp: a
# module-level jnp.float32 is a device array that every lowering embeds
# as an MLIR constant via a device->host fetch (fragile over remote-
# device transports) and forces backend init at import.
BIG = np.float32(3.0e38)


def _column_update(c: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
    """One DP column for the whole batch. c, local: (B, Q) float32."""
    s = jnp.cumsum(local, axis=1, dtype=jnp.float32)
    c_up = jnp.concatenate([jnp.full_like(c[:, :1], BIG), c[:, :-1]], axis=1)
    m = jnp.minimum(c, c_up)
    t = jnp.concatenate(
        [jnp.zeros_like(s[:, :1]), m[:, 1:] - s[:, :-1]], axis=1
    )
    g = jax.lax.associative_scan(jnp.minimum, t, axis=1)
    return s + g


def _column_update_std(c: jnp.ndarray, local: jnp.ndarray, p0: jnp.ndarray) -> jnp.ndarray:
    """Standard-DTW column: row 0 is anchored, cost[0,j] = local + cost[0,j-1].

    ref: std_dtw cdtw.c:70-94. p0 (B,) is the previous column's row-0 value
    (0 at a track start).
    """
    s = jnp.cumsum(local, axis=1, dtype=jnp.float32)
    c_up = jnp.concatenate([jnp.full_like(c[:, :1], BIG), c[:, :-1]], axis=1)
    m = jnp.minimum(c, c_up)
    t = jnp.concatenate([p0[:, None], m[:, 1:] - s[:, :-1]], axis=1)
    g = jax.lax.associative_scan(jnp.minimum, t, axis=1)
    return s + g


@partial(jax.jit, static_argnames=("ckpt", "std"))
def sdtw_scan(
    queries: jnp.ndarray,  # (B, Q) float32, padded with zeros beyond qlen
    row_onehot: jnp.ndarray,  # (B, Q) float32 one-hot at qlen-1
    ref: jnp.ndarray,  # (R,) float32 concatenated tracks (padded)
    reset: jnp.ndarray,  # (R,) bool, True at the first column of each track
    ckpt: int = 512,
    std: bool = False,
) -> jnp.ndarray:
    """Run the batched column scan; returns last_row (B, R) float32.

    No DP state is retained: the winning candidate's path is recovered on
    the host by *fresh* recompute of a bounded column window -- exact
    because subsequence DTW has a free start on the reference axis, so DP
    values at column j only depend on the columns its optimal path spans
    (the host retries with a wider window if a path touches the window
    edge). std=True switches to boundary-anchored standard DTW (RNA
    --dtw-std, ref sigfish.c:914-925), whose backtrack recomputes from the
    track start instead.
    """
    B, Q = queries.shape
    R = ref.shape[0]
    assert R % ckpt == 0, "reference must be padded to a chunk multiple"
    nchunk = R // ckpt

    ref_chunks = ref.reshape(nchunk, ckpt)
    reset_chunks = reset.reshape(nchunk, ckpt)

    def chunk_step(carry, inp):
        ref_c, reset_c = inp

        def col_step(c, inp2):
            y, rs = inp2
            local = jnp.abs(queries - y)
            if std:
                p0 = jnp.where(rs, jnp.float32(0.0), c[:, 0])
                c = jnp.where(rs, BIG, c)
                new = _column_update_std(c, local, p0)
            else:
                c = jnp.where(rs, BIG, c)
                new = _column_update(c, local)
            lr = jnp.sum(new * row_onehot, axis=1)
            return new, lr

        carry, lr_cols = jax.lax.scan(col_step, carry, (ref_c, reset_c))
        return carry, lr_cols

    init = jnp.full((B, Q), BIG, dtype=jnp.float32)
    _, lr = jax.lax.scan(chunk_step, init, (ref_chunks, reset_chunks))
    # lr: (nchunk, ckpt, B) -> (B, R)
    last_row = lr.reshape(nchunk * ckpt, B).T
    return last_row


def pad_tracks(
    tracks: list[np.ndarray], ckpt: int = 512, align: int = 1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate per-(contig,strand) tracks; pad to a ckpt multiple.

    With align > 1 every track's segment is padded to an align multiple,
    which makes the candidate windows of width `align` (the common query
    size) coincide with a static reshape on device -- the inter-track pad
    columns carry huge values, so pad windows can never beat a real
    candidate and partial last windows are handled for free (the pad
    cells lose every first-min-wins comparison).

    Returns (ref (R,) f32, reset (R,) bool, offsets (T+1,) i64 of each
    track's start inside the concatenated array).
    """
    starts = np.zeros(len(tracks), dtype=np.int64)
    pos = 0
    for i, t in enumerate(tracks):
        starts[i] = pos
        seg = t.size
        if align > 1:
            seg = ((seg + align - 1) // align) * align
        pos += seg
    total = pos
    R = ((total + ckpt - 1) // ckpt) * ckpt if total else ckpt
    # pad value is large but far from float32 max so cumulative sums over a
    # pad chunk can never overflow to inf (inf-inf NaNs would poison cummin)
    ref = np.full(R, 1.0e18, dtype=np.float32)
    reset = np.zeros(R, dtype=bool)
    for i, t in enumerate(tracks):
        ref[starts[i] : starts[i] + t.size] = t
        if t.size:
            reset[starts[i]] = True
        # the pad gap after a track is its own DP "track" so garbage
        # never leaks across the boundary
        if starts[i] + t.size < (starts[i + 1] if i + 1 < len(tracks) else total):
            reset[starts[i] + t.size] = True
    if total < R:
        reset[total] = True
    offsets = np.concatenate([starts, [total]])
    return ref, reset, offsets


def make_query_batch(
    queries: list[np.ndarray], pad_q: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad per-read z-scored query vectors to a common Q.

    Returns (queries (B, Q) f32, qlens (B,) i32, row_onehot (B, Q) f32).
    Padding rows sit *below* row qlen-1 in the DP, so they never influence
    the extracted last row.
    """
    B = len(queries)
    Q = pad_q or max((q.size for q in queries), default=1)
    Q = max(Q, 1)
    qb = np.zeros((B, Q), dtype=np.float32)
    qlens = np.zeros(B, dtype=np.int32)
    onehot = np.zeros((B, Q), dtype=np.float32)
    for b, q in enumerate(queries):
        L = min(q.size, Q)
        qb[b, :L] = q[:L]
        qlens[b] = L
        if L > 0:
            onehot[b, L - 1] = 1.0
    return qb, qlens, onehot
