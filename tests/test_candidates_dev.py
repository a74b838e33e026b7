"""Device candidate extraction vs host oracle (window scan + update_aln)."""

import numpy as np
import jax.numpy as jnp

from sigfish_tpu.ops.candidates import rank_candidates, window_argmin
from sigfish_tpu.ops.candidates_dev import build_column_maps, device_topk_candidates
from sigfish_tpu.ops.sdtw import pad_tracks


def _host_top5(last_row, qlen, offsets, ntracks):
    cand_s, cand_p = [], []
    for t in range(ntracks):
        lo, hi = int(offsets[t]), int(offsets[t + 1])
        mins, args = window_argmin(last_row[lo:hi], qlen)
        cand_s.extend(mins.tolist())
        cand_p.extend((args + lo).tolist())
    cand_s = np.asarray(cand_s, np.float32)
    cand_p = np.asarray(cand_p)
    # update_aln: keep 5 best, later wins ties -> emulate by repeated
    # rank_candidates-style selection
    out = []
    s = cand_s.copy()
    for _ in range(min(5, s.size)):
        best, d1, _ = rank_candidates(s, cand_p)
        out.append((float(s[best]), int(cand_p[best])))
        s[best] = np.float32(np.inf)
    return out


def test_device_topk_matches_host():
    rng = np.random.default_rng(0)
    tracks = [rng.standard_normal(s).astype(np.float32) for s in (733, 256, 391)]
    ref, reset, offsets = pad_tracks(tracks, ckpt=128)
    R = ref.shape[0]
    B = 4
    qlens = np.array([40, 40, 33, 25], np.int32)
    last_row = rng.standard_normal((B, R)).astype(np.float32) * 10 + 100
    u, valid = build_column_maps(offsets, R)

    top_s, top_p = device_topk_candidates(
        jnp.asarray(last_row), jnp.asarray(qlens), jnp.asarray(u),
        jnp.asarray(valid), R, k=5, reindex=False,
    )
    top_s, top_p = np.asarray(top_s), np.asarray(top_p)

    for b in range(B):
        want = _host_top5(last_row[b], int(qlens[b]), offsets, len(tracks))
        for k, (ws, wp) in enumerate(want):
            assert abs(top_s[b, k] - ws) < 1e-5, (b, k, top_s[b, k], ws)
            assert top_p[b, k] == wp, (b, k, top_p[b, k], wp)


def test_device_topk_tie_later_window_wins():
    # two windows with identical minima: the later window's candidate
    # must rank first (update_aln sigfish.c:577-583)
    track = np.full(64, 50.0, np.float32)
    track[5] = 1.0
    track[37] = 1.0  # same min in a later window (width 32)
    ref, reset, offsets = pad_tracks([track], ckpt=64)
    R = ref.shape[0]
    u, valid = build_column_maps(offsets, R)
    lr = ref[None, :].copy()
    top_s, top_p = device_topk_candidates(
        jnp.asarray(lr), jnp.asarray(np.array([32], np.int32)),
        jnp.asarray(u), jnp.asarray(valid), R, k=5, reindex=False,
    )
    assert int(np.asarray(top_p)[0, 0]) == 37
    assert int(np.asarray(top_p)[0, 1]) == 5


def test_device_window_top5_uniform_matches_host():
    from sigfish_tpu.ops.candidates_dev import device_window_top5

    rng = np.random.default_rng(7)
    W = 32
    sizes = (733, 256, 391)
    tracks = [rng.standard_normal(s).astype(np.float32) for s in sizes]
    ref, reset, offsets = pad_tracks(tracks, ckpt=128, align=W)
    R = ref.shape[0]
    B = 3
    u, valid = build_column_maps(offsets, R, track_sizes=list(sizes))
    last_row = rng.standard_normal((B, R)).astype(np.float32) * 10 + 100
    last_row[:, ~valid] = 3.0e38  # pad columns carry huge scores
    qlens = np.full(B, W, np.int32)

    top_s, top_p = device_window_top5(
        jnp.asarray(last_row), jnp.asarray(qlens), jnp.asarray(valid),
        R, W=W, k=5, reindex=False,
    )
    top_s, top_p = np.asarray(top_s), np.asarray(top_p)

    for b in range(B):
        cand_s, cand_p = [], []
        for t in range(3):
            lo = int(offsets[t])
            mins, args = window_argmin(last_row[b, lo : lo + sizes[t]], W)
            cand_s.extend(mins.tolist())
            cand_p.extend((args + lo).tolist())
        s = np.asarray(cand_s, np.float32)
        p = np.asarray(cand_p)
        for k in range(5):
            best = s.size - 1 - int(np.argmin(s[::-1]))
            assert abs(top_s[b, k] - s[best]) < 1e-5
            assert top_p[b, k] == p[best]
            s[best] = np.inf


def test_device_topk_first_min_within_window():
    # within one window, first occurrence of the min wins (strict <)
    track = np.full(32, 50.0, np.float32)
    track[3] = 2.0
    track[9] = 2.0
    ref, reset, offsets = pad_tracks([track], ckpt=64)
    R = ref.shape[0]
    u, valid = build_column_maps(offsets, R)
    lr = ref[None, :].copy()
    top_s, top_p = device_topk_candidates(
        jnp.asarray(lr), jnp.asarray(np.array([32], np.int32)),
        jnp.asarray(u), jnp.asarray(valid), R, k=5, reindex=False,
    )
    assert int(np.asarray(top_p)[0, 0]) == 3
