"""Device-side event detection: the t-test segmentation of ops/events.py
as a batched JAX pass (prefix sums + dual t-stat + the coupled
two-detector state machine), executed per read-LANE over a (B, S)
signal batch.

This is the scaling lever for the RNA host-bound regime (PROFILE_RNA.md
round 2): on a PCIe-attached host the raw i16 upload is ~5 ms/batch and
the 0.3-0.4 s/batch of t-stat + detector host time moves onto the
device. Gated behind ``--host-stages device`` (runtime/pipeline.py);
the default stays on the host path.

f64 is scoped: detect_events_batch wraps its jit in
``jax.enable_x64(True)`` rather than requiring the global flag --
global x64 makes every gridded Pallas kernel in the process fail to
compile (Mosaic rejects the i64 index-map and roll-shift constants x64
tracing produces), and the DTW engines share the process.

Numerics contract (ref src/events.c:297-447, port semantics of
ops/events.py which is fuzz-validated against the C binary):

- prefix sums: f64 sequential accumulation of f32 values and of
  f32-SQUARED values (the reference squares in float before the double
  add -- events.c:303-305, fuzz seed 1090). Sequential order is
  bit-fixed, so this stage is a lax.scan over samples (unrolled); any
  cumsum/associative-scan reassociation would flip t-stat threshold
  crossings.
- t-stats: elementwise over shifted prefix-sum views, reproducing the
  float/double mixing of events.c:319-368 operation by operation.
- detector: the short/long coupled peak state machine as a lax.scan
  over t-stat steps with (B,) state lanes; commits scatter into a
  per-read peak list in append order (short before long within a step,
  matching the reference's inner loop order).
- events: (start, length, mean, stdv) from prefix-sum differences at
  the boundaries (events.c:461-508), vectorized on device.

Exactness: bit-exact vs ops/events.detect_events (and the native
sf_detect_events) when the backend's f64 is IEEE -- asserted on the CPU
backend in tests/test_events_device.py. On the TPU used here, XLA
emulates f64 at ~1e-15 relative error (measured: 779/5000 prefix values
off by final-ulp amounts, div/sqrt up to ~4 ulp), so an event boundary
can flip only when a t-stat sits within that slack of a threshold
crossing -- rare, but the TPU leg is therefore validated by accuracy
gates + output comparison, not guaranteed byte parity (see BENCH_r03 /
DESIGN.md). The CPU-backend device path IS byte-parity safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .events import DNA_PARAMS, RNA_PARAMS, EventTable

FLT_MAX = float(np.finfo(np.float32).max)
ETA = float(np.finfo(np.float32).tiny)


def _require_x64() -> None:
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "device eventization needs jax_enable_x64 (the t-stat chain is "
            "f64 by contract, events.c:297-368); detect_events_batch "
            "enters jax.enable_x64(True) around its own trace -- call "
            "through it, not _detect_events_jit directly"
        )


def _prefix_sums(pa_t: jnp.ndarray, nsamples: jnp.ndarray):
    """Sequential f64 prefix sums over the sample axis.

    pa_t: (S, B) f32 (time-major). Returns (A, Q): (S+1, B) f64 with
    A[k] = sum of the first k valid samples (frozen past each read's
    nsample so A[n_r] stays exact). ref events.c:297-307.
    """
    S, B = pa_t.shape
    idx = jnp.arange(S, dtype=jnp.int32)

    def step(carry, x):
        s, q = carry
        v, j = x
        valid = (j < nsamples).astype(jnp.float64)
        # f32 square BEFORE the f64 add (events.c:303-305; seed 1090)
        s = s + v.astype(jnp.float64) * valid
        q = q + (v * v).astype(jnp.float64) * valid
        return (s, q), (s, q)

    z = jnp.zeros((B,), jnp.float64)
    (_, _), (ss, qq) = jax.lax.scan(step, (z, z), (pa_t, idx), unroll=8)
    A = jnp.concatenate([jnp.zeros((1, B), jnp.float64), ss])
    Q = jnp.concatenate([jnp.zeros((1, B), jnp.float64), qq])
    return A, Q


def _tstat(A, Q, nsamples, w: int, wf32):
    """Windowed Welch t-stat, (S, B) f32; bit-exact port of
    events.c:319-368 / ops/events.compute_tstat including the exact
    float/double mixing. Entries outside [w, n_r - w] are 0.

    wf32 must be a TRACED f32 scalar holding float(w): with a
    compile-time-constant divisor XLA rewrites x / w into
    x * (1/w), a 1-ulp drift that near-zero-variance cancellation
    amplifies into wrong t-stats (found by tests/test_events_device.py:
    245 vs 246 events on a synthetic read)."""
    S = A.shape[0] - 1
    B = A.shape[1]
    zrow = jnp.zeros((w, B), jnp.float64)
    s_i, q_i = A[:S], Q[:S]
    s_im = jnp.concatenate([zrow, A[: S - w]])
    q_im = jnp.concatenate([zrow, Q[: S - w]])
    s_ip = jnp.concatenate([A[w:], zrow[: w - 1]]) if w > 1 else A[w:]
    q_ip = jnp.concatenate([Q[w:], zrow[: w - 1]]) if w > 1 else Q[w:]

    wf64 = wf32.astype(jnp.float64)
    # every division result is wrapped in an optimization_barrier:
    # XLA's algebraic simplifier otherwise folds a/b +- c into
    # (a +- c*b)/b (and contracts muls into FMAs), both of which change
    # the rounding that the t-stat's cancellation then amplifies --
    # exactly the failure class of fuzz seed 1090 (events.c:303-305)
    bar = jax.lax.optimization_barrier
    sum1 = s_i - s_im                               # f64
    sumsq1 = q_i - q_im                             # f64
    sum2 = (s_ip - s_i).astype(jnp.float32)         # float right sums
    sumsq2 = (q_ip - q_i).astype(jnp.float32)
    mean1 = bar(sum1 / wf64).astype(jnp.float32)    # double div -> float
    mean2 = bar(sum2 / wf32)                        # float division
    combined_var = (
        bar(sumsq1 / wf64)
        - bar(mean1 * mean1).astype(jnp.float64)
        + bar(sumsq2 / wf32).astype(jnp.float64)
        - bar(mean2 * mean2).astype(jnp.float64)
    ).astype(jnp.float32)
    combined_var = jnp.maximum(combined_var, jnp.float32(ETA))
    delta_mean = mean2 - mean1                      # float
    # (combined_var / wf32) is an f32 division whose result can be
    # SUBNORMAL (combined_var clamps at FLT_MIN; w up to 14): the host
    # (and the C reference) honor gradual underflow, but XLA flushes
    # f32 subnormals to zero -> 0/inf/nan t-stats where the reference
    # has huge-but-finite ones (flat-window reads). Emulate the exact
    # f32 rounding in f64: round the f64 quotient onto the subnormal
    # grid (2^-149) with ties-to-even -- safe double rounding since
    # f64's 53 bits >= 2*24+2.
    q32 = (combined_var / wf32).astype(jnp.float64)
    qtrue = combined_var.astype(jnp.float64) / wf64
    grid = jnp.float64(2.0) ** 149
    q_sub = jnp.round(qtrue * grid) / grid
    q64 = jnp.where(qtrue < jnp.float64(ETA), q_sub, q32)
    ts = (jnp.abs(delta_mean.astype(jnp.float64)) / jnp.sqrt(q64)).astype(
        jnp.float32
    )
    # 0/denominator is exactly +0 on the host for any positive
    # denominator; keep it 0 even where the flushed path would nan
    ts = jnp.where(delta_mean == 0, jnp.float32(0.0), ts)

    i_col = jnp.arange(S, dtype=jnp.int32)[:, None]
    valid = (i_col >= w) & (i_col <= nsamples[None, :] - w)
    return jnp.where(valid, ts, jnp.float32(0.0))


def _detector_scan(t1, t2, nsamples, params, E: int):
    """The coupled short/long peak state machine (events.c:375-447) as a
    lax.scan over t-stat steps, (B,) state lanes, commits scattered into
    per-read peak lists in append order."""
    S, B = t1.shape
    w1 = params["window_length1"]
    w2 = params["window_length2"]
    thr1 = jnp.float32(params["threshold1"])
    thr2 = jnp.float32(params["threshold2"])
    ph = jnp.float32(params["peak_height"])
    rows = jnp.arange(B, dtype=jnp.int32)

    def det_update(i, cv, st, thr, wl):
        """One detector at step i; st = (masked_to, pp, pv, vp).
        Returns (new state, commit mask, committed positions)."""
        masked_to, pp, pv, vp = st
        active = (masked_to < i) & (i < nsamples)
        searching = pp == -1
        # searching branch (events.c peak_pos == DEF_PEAK_POS)
        lt = cv < pv
        found = (~lt) & ((cv - pv) > ph)
        pv_s = jnp.where(lt | found, cv, pv)
        pp_s = jnp.where(found, i, jnp.int32(-1))
        # tracking branch
        gt = cv > pv
        pv_t = jnp.where(gt, cv, pv)
        pp_t = jnp.where(gt, i, pp)
        vp_t = vp | (((pv_t - cv) > ph) & (pv_t > thr))
        commit = vp_t & ((i - pp_t) > (wl // 2))
        pos = pp_t
        pp_t2 = jnp.where(commit, jnp.int32(-1), pp_t)
        pv_t2 = jnp.where(commit, cv, pv_t)
        vp_t2 = vp_t & ~commit
        # merge branches under active/searching masks
        sel_s = active & searching
        sel_t = active & ~searching
        pp_n = jnp.where(sel_s, pp_s, jnp.where(sel_t, pp_t2, pp))
        pv_n = jnp.where(sel_s, pv_s, jnp.where(sel_t, pv_t2, pv))
        vp_n = jnp.where(sel_t, vp_t2, vp)
        commit = sel_t & commit
        # tracking-state AFTER the rise update but BEFORE the commit
        # reset -- the short detector's long-masking side effect reads it
        pv_track = jnp.where(sel_t, pv_t, pv)
        pp_track = jnp.where(sel_t, pp_t, pp)
        return (masked_to, pp_n, pv_n, vp_n), commit, pos, sel_t, pv_track, pp_track

    def append(peaks, counts, overflow, commit, pos):
        # drop p <= 0 exactly like create_events' (0, nsample) filter
        # (peaks == nsample can't commit: i < nsamples)
        eff = commit & (pos > 0)
        ok = eff & (counts < E)
        peaks = peaks.at[rows, jnp.minimum(counts, E - 1)].set(
            jnp.where(ok, pos, peaks[rows, jnp.minimum(counts, E - 1)])
        )
        overflow = overflow | (eff & (counts >= E))
        counts = counts + ok.astype(jnp.int32)
        return peaks, counts, overflow

    def step(carry, x):
        (st_s, st_l, peaks, counts, overflow) = carry
        cv1, cv2, i = x
        # short detector first (events.c loop order)
        st_s, commit_s, pos_s, strack, pv_strk, pp_strk = det_update(
            i, cv1, st_s, thr1, w1
        )
        peaks, counts, overflow = append(peaks, counts, overflow, commit_s, pos_s)
        # short-over-threshold masks/resets the long detector
        # (events.c: long.masked_to = short.peak_pos + short.window_length)
        fire = strack & (pv_strk > thr1)
        m_l, pp_l, pv_l, vp_l = st_l
        m_l = jnp.where(fire, pp_strk + jnp.int32(w1), m_l)
        pp_l = jnp.where(fire, jnp.int32(-1), pp_l)
        pv_l = jnp.where(fire, jnp.float32(FLT_MAX), pv_l)
        vp_l = jnp.where(fire, False, vp_l)
        st_l, commit_l, pos_l, _, _, _ = det_update(
            i, cv2, (m_l, pp_l, pv_l, vp_l), thr2, w2
        )
        peaks, counts, overflow = append(peaks, counts, overflow, commit_l, pos_l)
        return (st_s, st_l, peaks, counts, overflow), None

    def fresh():
        return (
            jnp.zeros((B,), jnp.int32),                    # masked_to
            jnp.full((B,), -1, jnp.int32),                 # peak_pos
            jnp.full((B,), FLT_MAX, jnp.float32),          # peak_value
            jnp.zeros((B,), bool),                         # valid_peak
        )

    init = (
        fresh(),
        fresh(),
        jnp.zeros((B, E), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
    )
    idx = jnp.arange(S, dtype=jnp.int32)
    carry, _ = jax.lax.scan(step, init, (t1, t2, idx), unroll=4)
    _, _, peaks, counts, overflow = carry
    return peaks, counts, overflow


@functools.partial(jax.jit, static_argnames=("rna", "E"))
def _detect_events_jit(sig_t, nsamples, raw_unit, offset, w1f, w2f,
                       rna: bool, E: int):
    """sig_t: (S, B) i16 time-major; w1f/w2f: traced f32 scalars holding
    the window lengths (see _tstat for why they must not be constants).
    Returns (peaks, counts, overflow, psum, psumsq, end_sum, end_sumsq):
    (B, E) peak boundary indices, (B,) event counts, (B,) overflow
    flags, the (B, E) prefix sum/sumsq gathered at the peak boundaries,
    and the (B,) totals at n_r. Event assembly (start/length/mean/stdv)
    happens on the host in detect_events_batch -- see the comment below
    on why the f32 variance chain must not run under XLA."""
    _require_x64()
    S, B = sig_t.shape
    params = RNA_PARAMS if rna else DNA_PARAMS

    # pA conversion, exact f32 op order of to_pa / sf_pa_from_i16
    # (ref sigfish.c:344-347: (raw + offset) * (range / digitisation))
    pa_t = (sig_t.astype(jnp.float32) + offset[None, :]) * raw_unit[None, :]

    A, Q = _prefix_sums(pa_t, nsamples)
    t1 = _tstat(A, Q, nsamples, params["window_length1"], w1f)
    t2 = _tstat(A, Q, nsamples, params["window_length2"], w2f)
    peaks, counts, overflow = _detector_scan(t1, t2, nsamples, params, E)

    # gather the prefix sums at the peak boundaries + at n_r; the cheap
    # create_events arithmetic (events.c:461-508) runs in NUMPY on the
    # host -- XLA's algebraic simplifier rewrites the f32
    # sumsq/n - mean^2 chain (div-in-sum canonicalization + FMA
    # contraction) in ways optimization_barrier does not fully stop,
    # and the cancellation amplifies every such ulp into visible stdv
    # error. The downloads stay O(B x E).
    At, Qt = A.T, Q.T  # (B, S+1)
    pk = jnp.minimum(peaks, S).astype(jnp.int32)
    psum = jnp.take_along_axis(At, pk, axis=1)
    psumsq = jnp.take_along_axis(Qt, pk, axis=1)
    nz = nsamples[:, None].astype(jnp.int32)
    end_sum = jnp.take_along_axis(At, nz, axis=1)[:, 0]
    end_sumsq = jnp.take_along_axis(Qt, nz, axis=1)[:, 0]
    return peaks, counts, overflow, psum, psumsq, end_sum, end_sumsq


def detect_events_batch(
    signals: np.ndarray,      # (B, S) i16, zero-padded
    nsamples: np.ndarray,     # (B,) i32
    digitisation: np.ndarray,  # (B,) f64
    offset: np.ndarray,       # (B,) f64
    range_: np.ndarray,       # (B,) f64
    rna: bool,
) -> tuple[list[EventTable | None], np.ndarray]:
    """Batched device event detection. Returns (per-read EventTable list,
    overflow mask); overflow reads (event list > E cap) get None and must
    take the host path. Bit-exact vs ops/events.detect_events wherever
    the backend's f64 is IEEE (CPU; see module docstring for TPU)."""
    B, S = signals.shape
    # event cap: reads average >= 4 samples/event in practice; the cap
    # only bounds device memory -- overflow falls back to the host path
    E = max(64, S // 4)
    raw_unit = (range_.astype(np.float32) / digitisation.astype(np.float32))
    params = RNA_PARAMS if rna else DNA_PARAMS
    # x64 is scoped to THIS trace: enabling it process-wide would break
    # every gridded Pallas kernel (Mosaic rejects the i64 index-map /
    # roll-shift constants x64 tracing produces), and the DTW engines
    # run in the same process
    with jax.enable_x64(True):
        peaks, counts, overflow, psum, psumsq, end_sum, end_sumsq = (
            _detect_events_jit(
                jnp.asarray(np.ascontiguousarray(signals.T)),
                jnp.asarray(nsamples.astype(np.int32)),
                jnp.asarray(raw_unit.astype(np.float32)),
                jnp.asarray(offset.astype(np.float32)),
                jnp.float32(params["window_length1"]),
                jnp.float32(params["window_length2"]),
                rna=rna,
                E=E,
            )
        )
    counts = np.asarray(counts)
    overflow = np.asarray(overflow)
    n_pk = int(counts.max(initial=0))
    peaks = np.asarray(peaks[:, :n_pk]).astype(np.int64)
    psum = np.asarray(psum[:, :n_pk])
    psumsq = np.asarray(psumsq[:, :n_pk])
    end_sum = np.asarray(end_sum)
    end_sumsq = np.asarray(end_sumsq)
    out: list[EventTable | None] = []
    for b in range(B):
        if overflow[b]:
            out.append(None)
            continue
        c = int(counts[b])
        # create_events on host (events.c:461-508): exact numpy f32 math
        starts_b = np.empty(c + 1, np.int64)
        starts_b[0] = 0
        starts_b[1:] = peaks[b, :c]
        ends_b = np.empty(c + 1, np.int64)
        ends_b[:-1] = peaks[b, :c]
        ends_b[-1] = int(nsamples[b])
        s_sum = np.concatenate([[0.0], psum[b, :c]])
        s_sumsq = np.concatenate([[0.0], psumsq[b, :c]])
        e_sum = np.concatenate([psum[b, :c], [end_sum[b]]])
        e_sumsq = np.concatenate([psumsq[b, :c], [end_sumsq[b]]])
        length = (ends_b - starts_b).astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = (e_sum - s_sum).astype(np.float32) / length
            deltasqr = (e_sumsq - s_sumsq).astype(np.float32)
            var = deltasqr / length - mean * mean
        stdv = np.sqrt(np.maximum(var, np.float32(0.0)))
        out.append(
            EventTable(
                start=starts_b.astype(np.uint64),
                length=length,
                mean=mean.astype(np.float32),
                stdv=stdv.astype(np.float32),
            )
        )
    return out, overflow
