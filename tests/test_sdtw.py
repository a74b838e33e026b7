"""sDTW engine tests: scan engine vs exact scalar-order reference.

ref: cdtw.c:70-94 (std_dtw), :172-189 (subsequence).
"""

import numpy as np
import jax.numpy as jnp

from sigfish_tpu.ops.sdtw import make_query_batch, pad_tracks, sdtw_scan
from sigfish_tpu.ops.sdtw_ref import (
    subsequence_cost,
    subsequence_path,
    std_dtw_cost,
)
from sigfish_tpu.ops.candidates import (
    compute_mapq,
    rank_candidates,
    window_argmin,
)


def _rand(n, seed):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def test_scan_matches_exact_subsequence():
    q1, q2 = _rand(40, 0), _rand(25, 1)
    t1, t2 = _rand(300, 2), _rand(180, 3)
    qb, qlens, onehot = make_query_batch([q1, q2], pad_q=64)
    ref, reset, offs = pad_tracks([t1, t2], ckpt=128)
    lr = np.asarray(
        sdtw_scan(jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(ref),
                  jnp.asarray(reset), ckpt=128)
    )
    for b, q in enumerate([q1, q2]):
        for t_i, t in enumerate([t1, t2]):
            lo, hi = int(offs[t_i]), int(offs[t_i + 1])
            exact = np.asarray(subsequence_cost(q, t))[-1]
            got = lr[b, lo:hi]
            np.testing.assert_allclose(got, exact, rtol=2e-5, atol=2e-4)


def test_scan_matches_exact_std():
    q = _rand(30, 4)
    t = _rand(200, 5)
    qb, qlens, onehot = make_query_batch([q], pad_q=32)
    ref, reset, offs = pad_tracks([t], ckpt=128)
    lr = np.asarray(
        sdtw_scan(jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(ref),
                  jnp.asarray(reset), ckpt=128, std=True)
    )
    exact = np.asarray(std_dtw_cost(q, t))[-1]
    np.testing.assert_allclose(lr[0, : t.size], exact, rtol=2e-5, atol=2e-4)


def test_wavefront_std_bitwise_vs_oracle():
    """The boundary-anchored wavefront (--dtw-std on the TPU engine)
    must equal the scalar-order oracle BITWISE -- min is rounding-exact
    and the anchored first-row adds run in column order, so unlike the
    scan engine there is no reassociation drift. Clipped reads ride the
    clip shift; multi-track resets restart the anchor."""
    from sigfish_tpu.ops.sdtw_pallas import (
        prepare_wavefront_inputs,
        sdtw_wavefront,
        shift_queries_for_clip,
    )

    rng = np.random.default_rng(17)
    W, Q, td = 32, 64, 64
    lane = W - 1
    tracks = [rng.standard_normal(s).astype(np.float32) for s in (300, 150)]
    ref, reset, offs = pad_tracks(tracks, ckpt=td, align=W)
    qlist = [
        rng.standard_normal(n).astype(np.float32) for n in (W, 11, W - 5)
    ]
    qb, qlens, _ = make_query_batch(qlist, pad_q=Q)
    qb_k, fs = shift_queries_for_clip(qb, qlens, lane)
    ypad, rspad, D = prepare_wavefront_inputs(ref, reset, Q, td=td)
    ds = np.asarray(sdtw_wavefront(
        jnp.asarray(qb_k), jnp.asarray(ypad), jnp.asarray(rspad),
        lane=lane, td=td, start_lanes=jnp.asarray(fs), std=True,
        interpret=True,
    ))
    lr = ds[:, lane : lane + ref.shape[0]]
    for b, q in enumerate(qlist):
        for t_i, t in enumerate(tracks):
            lo = int(offs[t_i])
            exact = np.asarray(std_dtw_cost(q, t))[-1]
            np.testing.assert_array_equal(lr[b, lo : lo + t.size], exact)


def test_pipeline_dtw_std_pallas_matches_native():
    """--dtw-std through the full pipeline: the wavefront engine's output
    must be byte-identical to the exact native engine (the last
    non-byte-exact device config of round 4)."""
    import io

    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    REF = "/root/reference/test"

    def run(engine):
        opt = Options(
            rna=True, query_size=100, prefix_size=-1, dtw_std=True,
            engine=engine, num_thread=2,
        )
        core = Core(
            f"{REF}/rnasequin_sequences_2.4.fa", f"{REF}/sequin_rna.blow5",
            opt,
        )
        out = io.StringIO()
        run_dtw(core, out)
        core.close()
        return out.getvalue()

    pallas_out = run("pallas")  # interpreter off-TPU, same numerics
    native_out = run("native")
    assert pallas_out and pallas_out == native_out


def test_backtrack_path_properties():
    q = _rand(20, 6)
    t = _rand(100, 7)
    cost = np.asarray(subsequence_cost(q, t))
    starty = int(cost[-1].argmin())
    px, py = subsequence_path(cost, starty)
    # monotone non-decreasing, ends at (n-1, starty)
    assert px[-1] == q.size - 1 and py[-1] == starty
    assert (np.diff(px) >= 0).all() and (np.diff(py) >= 0).all()
    assert (np.diff(px) + np.diff(py) >= 1).all()


def test_window_argmin_first_min_wins():
    # strict < comparison: first minimum wins within a window
    # ref sigfish.c:895
    scores = np.array([5.0, 1.0, 1.0, 7.0, 0.5, 2.0, 0.5, 9.0], np.float32)
    mins, args = window_argmin(scores, 4)
    assert mins.tolist() == [1.0, 0.5]
    assert args.tolist() == [1, 4]


def test_rank_candidates_tie_semantics():
    # ties rank the NEW candidate better (score > comparison,
    # ref sigfish.c:577-583): with equal scores the later-inserted one
    # must come out ahead of the earlier one
    scores = np.array([3.0, 3.0, 5.0], np.float32)
    pos = np.array([10, 20, 30])
    best, d1, d2 = rank_candidates(scores, pos)
    assert best == 1  # later tie wins
    assert d1 == 3.0 and d2 == 3.0


def test_mapq():
    # mapq = round(500*(d2-d1)/d1) clamp 60, ref sigfish.c:979-983
    assert compute_mapq(100.0, 100.0) == 0
    assert compute_mapq(100.0, 103.0) == 15
    assert compute_mapq(1.0, 100.0) == 60
    # d2=inf: (int)round(inf) -> INT_MIN -> uint8 store wraps to 0
    # (sigfish.c:979 + sigfish.h:153; oracle-verified rna_d2inf case)
    assert compute_mapq(50.0, float("inf")) == 0


def test_wavefront_clip_shift_bit_exact():
    """Clipped reads on the wavefront kernel: shift_queries_for_clip
    moves each short query up so its last DP row lands on the kernel's
    uniform emitted lane (W-1), with the free-start row riding the
    start_lanes. The emitted last rows must be BIT-identical to the
    scalar per-track oracle at every qlen (ref short-read semantics,
    sigfish.c:450-461)."""
    from sigfish_tpu.ops.sdtw_pallas import (
        prepare_wavefront_inputs,
        sdtw_wavefront,
        shift_queries_for_clip,
    )

    rng = np.random.default_rng(17)
    W, Q, td = 48, 64, 32
    lane = W - 1
    tracks = [rng.standard_normal(s).astype(np.float32) for s in (90, 40, 70)]
    ref = np.concatenate(tracks)
    reset = np.zeros(ref.size, bool)
    pos = 0
    for t in tracks:
        reset[pos] = True
        pos += t.size
    # one full-length read + clipped reads incl. the qlen=1 and W-1 edges
    qlist = [
        _rand(W, 5), _rand(1, 6), _rand(7, 7), _rand(W - 1, 8), _rand(23, 9),
    ]
    qb, qlens, _ = make_query_batch(qlist, pad_q=Q)
    qb_k, fs_lanes = shift_queries_for_clip(qb, qlens, lane)
    # full-length rows untouched, mask stays at lane 0
    assert np.array_equal(qb_k[0], qb[0]) and fs_lanes[0] == 0
    ypad, rspad, D = prepare_wavefront_inputs(ref, reset, Q, td=td)
    ds = np.asarray(
        sdtw_wavefront(
            jnp.asarray(qb_k), jnp.asarray(ypad), jnp.asarray(rspad),
            lane=lane, td=td, unroll=4, interpret=True,
            start_lanes=jnp.asarray(fs_lanes),
        )
    )
    lr = ds[:, lane : lane + ref.size]  # column-indexed last rows
    for b, q in enumerate(qlist):
        want = np.concatenate(
            [subsequence_cost(q, t)[-1] for t in tracks]
        )
        assert np.array_equal(lr[b], want), f"read {b} qlen={q.size}"
