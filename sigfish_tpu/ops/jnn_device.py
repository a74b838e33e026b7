"""Device-side RNA polyA autodetect: the adaptor/polyA scans of
ops/jnn.py as batched JAX passes, executed per read-LANE over a (B, S)
signal batch.

This closes the last host-bound stage of ``--host-stages device``
(PROFILE_RNA.md: jnnv2 is 0.139 s/batch of host time that cannot be
prefix-bounded -- its rolling mean/threshold is a whole-signal
statistic). Gated behind ``--host-stages device`` + RNA ``-p -1``; the
default path stays on the host.

Semantics replicated exactly (ref src/jnn.c; the host ports in
ops/jnn.py are fuzz-validated against the C binary):

  1. jnnv2 adaptor scan on raw ADC (jnn.c:100-180): outlier clamp to
     [0, 1200] (jnn.c:62-78), rolling mean w=2000 as the reference's
     f32 RUNNING accumulator (tt -= x[i-1]; tt += x[i+w-1]; t=tt/w --
     jnn.c:37-46, sequential order bit-fixed), f32 sequential
     meanf/stdvf over t (stat.h:17-48), threshold bot = mn - std*scale,
     below/above segment FSM with seg_dist merge, first segment with
     lo <= len <= hi wins (jnn.c:155-168).
  2. m_a = f32 sequential meanf of signal_pa[ax:ay] (sigfish.c:393).
  3. find_polya = rm_outlierf + jnn_core FSM over the pA tail with the
     absolute band (m_a+50, m_a+10) (jnn.c:296-376, sigfish.c:396):
     the error-tolerant in-range run detector with its c/w/err/prev_err
     counters, seg_dist merge, and segs[0] selection.

Every stage is a lax.scan over samples with (B,) state lanes (the
pattern proven by ops/events_device.py), all f32 -- no x64 scoping
needed, so unlike the eventizer's f64-emulation caveat this pass is
deterministic wherever f32 ops are IEEE (CPU backend asserted in
tests; the TPU leg is additionally byte-compared by
scripts/test_tpu.sh). One precision nuance: the polyA band compare
follows the C reference's f32 op order, while the HOST path carries
the band in f64 (its own documented, fuzz-validated deviation from
the C binary) -- the two can in principle split a sample that lands
within 1 ulp of the band edge; no such read exists in any test or
fuzz corpus, and the C order is the normative one.

Returns per-read polyA END sample indices (-1 = autodetect failed, the
reference's prefix_fail path, sigfish.c:440-447); the pipeline feeds
them into _normalise_single(py=...) exactly like the host scan's
result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .jnn import (
    JNNV1_R9_POLYA,
    JNNV1_RNA004_POLYA,
    JNNV2_RNA_R9_ADAPTOR,
    JNNV2_RNA_RNA004_ADAPTOR,
    PORE_RNA004,
)

_I1 = np.int32(1)


def _seq_mean_std(x_t, valid_t, count, need_std: bool):
    """f32 sequential meanf/stdvf (stat.h:17-48): sum in scan order,
    mean = sum/n; std re-walks with (x-m)^2. x_t/valid_t: (S, B)."""
    z = jnp.zeros(x_t.shape[1], jnp.float32)

    def s1(acc, xv):
        x, v = xv
        return jnp.where(v, acc + x, acc), None

    sum1, _ = jax.lax.scan(s1, z, (x_t, valid_t), unroll=8)
    mn = sum1 / count.astype(jnp.float32)
    if not need_std:
        return mn, None

    def s2(acc, xv):
        x, v = xv
        d = x - mn
        return jnp.where(v, acc + d * d, acc), None

    sum2, _ = jax.lax.scan(s2, z, (x_t, valid_t), unroll=8)
    std = jnp.sqrt(sum2 / count.astype(jnp.float32))
    return mn, std


@functools.partial(jax.jit, static_argnames=("window", "pore"))
def _polya_end_jit(
    sig_t,       # (S, B) i16 time-major, zero-padded
    nsamples,    # (B,) i32
    raw_unit,    # (B,) f32  range/digitisation
    offset,      # (B,) f32
    window: int,
    pore: int,
):
    S, B = sig_t.shape
    v2 = (
        JNNV2_RNA_RNA004_ADAPTOR if pore == PORE_RNA004
        else JNNV2_RNA_R9_ADAPTOR
    )
    v1 = JNNV1_RNA004_POLYA if pore == PORE_RNA004 else JNNV1_R9_POLYA

    sf = sig_t.astype(jnp.float32)
    clamped = jnp.clip(sf, np.float32(0.0), np.float32(1200.0))
    pa_t = (sf + offset[None, :]) * raw_unit[None, :]
    pa_cl = jnp.clip(pa_t, np.float32(0.0), np.float32(1200.0))

    n = nsamples
    idx = jnp.arange(S, dtype=jnp.int32)
    nt = jnp.maximum(n - np.int32(window), 0)  # len(t) per read

    # ---- P1: rolling mean (the reference's f32 running accumulator,
    # jnn.c:37-46: the subtract precedes the add) -> t plane (S, B);
    # t[j] lands at scan step k = j + window - 1
    wf = np.float32(window)

    def roll_step(tt, kx):
        k, xk, xkw = kx
        tt = jnp.where(k < window, tt + xk, (tt - xkw) + xk)
        return tt, tt / wf

    x_del = jnp.concatenate(
        [jnp.zeros((window, B), jnp.float32), clamped[: S - window]], axis=0
    )
    _, t_shift = jax.lax.scan(
        roll_step, jnp.zeros(B, jnp.float32), (idx, clamped, x_del),
        unroll=8,
    )
    # t_shift[k] = t[k - window + 1]; valid for k in [window-1, n-2]
    t_valid = (idx[:, None] >= np.int32(window - 1)) & (
        idx[:, None] <= n[None, :] - 2
    )

    # ---- P2: meanf/stdvf over t -> bot threshold (jnn.c:107-111)
    mn, std = _seq_mean_std(t_shift, t_valid, jnp.maximum(nt, 1), True)
    bot = mn - std * np.float32(v2.std_scale)

    # ---- P3: jnnv2 segment FSM over t (jnn.c:113-168). Segments close
    # on the strict t > bot test; a close either merges into the last
    # segment (gap < seg_dist) or finalizes it -- finalization applies
    # the first-qualifying filter online (segments finalize in order).
    sd2 = np.int32(v2.seg_dist)
    hi2 = np.int32(v2.hi_thresh)
    lo2 = np.int32(v2.lo_thresh)
    half = np.int32(window // 2 - 1)
    zi = jnp.zeros(B, jnp.int32)
    zb = jnp.zeros(B, bool)

    def v2_step(st, kv):
        (begin, start, end, have_l, l_s, l_e, found, r_x, r_y) = st
        k, tv, valid = kv
        j = k - np.int32(window - 1)  # t index at this scan step
        below = valid & (tv < bot)
        above = valid & (tv > bot)
        case1 = below & ~begin
        case2 = below & begin
        close = above & begin
        merge = close & have_l & ((start - l_e) < sd2)
        fin = close & have_l & ~merge
        ln = l_e - l_s
        q = fin & ~found & (ln <= hi2) & (ln >= lo2)
        r_x = jnp.where(q, l_s + half, r_x)
        r_y = jnp.where(q, l_e + half, r_y)
        found = found | q
        l_e = jnp.where(merge, end, l_e)
        new = close & ~merge
        l_s = jnp.where(new, start, l_s)
        l_e = jnp.where(new, end, l_e)
        have_l = have_l | close
        start = jnp.where(case1, j, jnp.where(close, zi, start))
        end = jnp.where(case2, j, jnp.where(close, zi, end))
        begin = jnp.where(below, True, jnp.where(close, False, begin))
        return (begin, start, end, have_l, l_s, l_e, found, r_x, r_y), None

    st0 = (zb, zi, zi, zb, zi, zi, zb, zi, zi)
    st, _ = jax.lax.scan(
        v2_step, st0, (idx, t_shift, t_valid), unroll=4
    )
    (_, _, _, have_l, l_s, l_e, found, r_x, r_y) = st
    # trailing last segment finalizes at scan end (jnn.c:155-168 runs
    # the filter over ALL collected segments)
    ln = l_e - l_s
    q = have_l & ~found & (ln <= hi2) & (ln >= lo2)
    ax = jnp.where(q, l_s + half, jnp.where(found, r_x, zi))
    ay = jnp.where(q, l_e + half, jnp.where(found, r_y, zi))
    # n <= window -> (-1, -1) (jnn.c:171-176); ay <= 0 -> fail
    short = n <= np.int32(window)
    adaptor_ok = ~short & (ay > 0)

    # ---- P4: m_a = meanf(signal_pa[ax:ay]) (sigfish.c:393)
    in_ad = (idx[:, None] >= ax[None, :]) & (idx[:, None] < ay[None, :])
    m_a, _ = _seq_mean_std(
        pa_t, in_ad & adaptor_ok[None, :], jnp.maximum(ay - ax, 1), False
    )
    # the polyA band in the C REFERENCE's own f32 op order
    # (sigfish.c:396: fl32(fl32(m_a+30)+20) / fl32(fl32(m_a+30)-20),
    # compared against f32 samples). The HOST path deviates here by
    # design: it carries the band in f64 and the native jnn_core
    # compares doubles (documented near-tie deviation, fuzz-validated
    # byte-identical vs the C binary across every campaign) -- the
    # device follows the C order, the strictest of the three.
    m30 = m_a + np.float32(30.0)
    top = m30 + np.float32(20.0)
    botp = m30 - np.float32(20.0)

    # ---- P5: jnn_core FSM over the clamped pA tail (jnn.c:191-279),
    # tracking segs[0] only (merges only ever extend the LAST segment,
    # so segs[0] grows only while it is still the last)
    corr = np.int32(v1.corrector)
    sd1 = np.int32(v1.seg_dist)
    win1 = np.int32(v1.window)
    err1 = np.int32(v1.error)
    wst = np.float32(v1.window * v1.stall_len)

    def core_step(st, kv):
        # have_l doubles as the reference's `seg_i > 0` (a merge
        # requires an existing segment, so any close implies >= 1 seg)
        (prev, err, perr, c, w, start, s0s, s0e, have0,
         last0, l_s, l_e, have_l) = st
        k, a = kv
        i_rel = k - ay
        active = (i_rel >= 0) & (k < n)
        in_r = active & (a < top) & (a > botp)
        outr = active & ~in_r

        nB = outr & prev & (err < err1)
        size_ok = (c.astype(jnp.float32) >= wst) & ~have_l
        nC = outr & prev & ~(err < err1) & ((c >= win1) | size_ok)
        nD = outr & prev & ~(err < err1) & ~((c >= win1) | size_ok)

        # branch A: in range
        start = jnp.where(in_r & ~prev, i_rel, start)
        c2 = jnp.where(in_r | nB, c + _I1, c)
        w2 = jnp.where(in_r, w + _I1, w)
        perr2 = jnp.where(in_r, zi, jnp.where(nB, perr + _I1, perr))
        err_b = jnp.where(nB, err + _I1, err)
        dec = (in_r | nB) & (c2 >= win1) & (c2 >= w2) & (c2 % jnp.maximum(w2, 1) == 0)
        err2 = err_b - dec.astype(jnp.int32)

        # branch C: close (jnn.c:249-266)
        end = i_rel - perr
        merge = nC & have_l & ((start - l_e) < sd1)
        s0e2 = jnp.where(merge & last0, end, s0e)
        l_e2 = jnp.where(merge, end, l_e)
        new = nC & ~merge
        first = new & ~have0
        s0s2 = jnp.where(first, start, s0s)
        s0e3 = jnp.where(first, end, s0e2)
        have0_2 = have0 | first
        last0_2 = jnp.where(new, first, last0)
        l_s2 = jnp.where(new, start, l_s)
        l_e3 = jnp.where(new, end, l_e2)
        have_l2 = have_l | nC

        reset = nC | nD
        prev2 = jnp.where(in_r, True, jnp.where(reset, False, prev))
        c3 = jnp.where(reset, zi, c2)
        err3 = jnp.where(reset, zi, err2)
        perr3 = jnp.where(reset, zi, perr2)
        return (
            prev2, err3, perr3, c3, w2, start,
            s0s2, s0e3, have0_2, last0_2, l_s2, l_e3, have_l2,
        ), None

    st0 = (zb, zi, zi, zi, jnp.full(B, corr, jnp.int32), zi,
           zi, zi, zb, zb, zi, zi, zb)
    st, _ = jax.lax.scan(core_step, st0, (idx, pa_cl), unroll=4)
    s0e = st[7]
    have0 = st[8]
    polya_ok = adaptor_ok & have0 & (s0e > 0)  # py <= 0 -> fail
    return jnp.where(polya_ok, s0e + ay, np.int32(-1))


def polya_end_batch(
    signals: np.ndarray,       # (B, S) i16, zero-padded
    nsamples: np.ndarray,      # (B,) i32
    digitisation: np.ndarray,  # (B,) f64
    offset: np.ndarray,        # (B,) f64
    range_: np.ndarray,        # (B,) f64
    pore: int,
) -> np.ndarray:
    """Batched device polyA-end detection; returns (B,) i32 raw-sample
    indices, -1 where the autodetect failed (== jnn.detect_polya_end's
    per-read result)."""
    window = (
        JNNV2_RNA_RNA004_ADAPTOR.window if pore == PORE_RNA004
        else JNNV2_RNA_R9_ADAPTOR.window
    )
    raw_unit = (
        range_.astype(np.float32) / digitisation.astype(np.float32)
    )
    out = _polya_end_jit(
        jnp.asarray(np.ascontiguousarray(signals.T)),
        jnp.asarray(nsamples.astype(np.int32)),
        jnp.asarray(raw_unit),
        jnp.asarray(offset.astype(np.float32)),
        window=window,
        pore=pore,
    )
    return np.asarray(out).astype(np.int64)
