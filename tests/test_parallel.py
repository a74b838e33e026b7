"""Multi-device sharding tests on the 8-virtual-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh
import pytest

from sigfish_tpu.ops.sdtw import make_query_batch, pad_tracks, sdtw_scan
from sigfish_tpu.parallel import make_mesh, shard_tracks, sharded_sdtw_step


def _rand(n, seed):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single_device():
    queries = [_rand(40 + i, i) for i in range(8)]
    tracks = [_rand(200 + 37 * i, 100 + i) for i in range(5)]
    mesh = make_mesh(4, 2)
    lr, qlens, offsets, assign = sharded_sdtw_step(
        mesh, queries, tracks, pad_q=64, ckpt=128
    )
    # single-device oracle
    qb, _, onehot = make_query_batch(queries, pad_q=64)
    ref, reset, offs = pad_tracks(tracks, ckpt=128)
    lr1 = np.asarray(
        sdtw_scan(jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(ref),
                  jnp.asarray(reset), ckpt=128)
    )
    n_tp = mesh.shape["tp"]
    Rs = lr.shape[1] // n_tp
    for gi, t in enumerate(tracks):
        # locate gi in its shard
        s = next(s for s, a in enumerate(assign) if gi in a)
        li = assign[s].index(gi)
        lo = int(offsets[s, li])
        sharded_scores = lr[:, s * Rs + lo : s * Rs + lo + t.size]
        lo1 = int(offs[gi])
        single_scores = lr1[:, lo1 : lo1 + t.size]
        np.testing.assert_allclose(sharded_scores, single_scores, rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_shard_tracks_balanced():
    tracks = [np.ones(s, np.float32) for s in (1000, 900, 100, 90, 80, 70)]
    ref, reset, offsets, assign = shard_tracks(tracks, 2, ckpt=128)
    loads = [sum(tracks[i].size for i in a) for a in assign]
    assert abs(loads[0] - loads[1]) <= 900
    assert ref.shape[0] == 2
    assert set(sum(assign, [])) == set(range(6))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_pipeline_matches_single_device(tmp_path):
    """Full pipeline over a 4x2 mesh == single-device output, byte for byte."""
    import io
    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    REF = "/root/reference/test"

    def run(mesh):
        opt = Options(query_size=64, mesh=mesh, use_pallas=False)
        core = Core(f"{REF}/nCoV-2019.reference.fasta", f"{REF}/sp1_dna.blow5", opt)
        out = io.StringIO()
        run_dtw(core, out)
        core.close()
        return out.getvalue()

    assert run("4x2") == run(None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_fullref_matches_single_device():
    """Reference-axis ring pipeline over one huge track == single scan."""
    from sigfish_tpu.parallel.shard import ring_fullref_lastrow

    rng = np.random.default_rng(0)
    n_tp, Rs = 4, 512
    R = n_tp * Rs
    track = rng.standard_normal(R).astype(np.float32)
    B, Q = 8, 64
    queries = [rng.standard_normal(48 + i).astype(np.float32) for i in range(B)]
    qb, qlens, onehot = make_query_batch(queries, pad_q=Q)

    mesh = Mesh(np.asarray(jax.devices()[:n_tp]).reshape(1, n_tp), ("dp", "tp"))
    seg = track.reshape(n_tp, Rs)
    reset = np.zeros(R, bool)
    reset[0] = True
    reset[1000] = True  # a second track boundary mid-segment
    lr_ring = np.asarray(
        ring_fullref_lastrow(
            jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(seg),
            jnp.asarray(reset.reshape(n_tp, Rs)), mesh, n_micro=4,
        )
    )
    # single-device oracle
    ref = track
    lr1 = np.asarray(
        sdtw_scan(jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(ref),
                  jnp.asarray(reset), ckpt=128)
    )
    np.testing.assert_allclose(lr_ring, lr1, rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_mode_pipeline_matches_single_device():
    """Auto ring mode (tracks < n_tp) == single-device output, byte for
    byte, through the full pipeline."""
    import io
    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    REF = "/root/reference/test"

    def run(mesh):
        opt = Options(query_size=64, mesh=mesh, engine="scan")
        core = Core(f"{REF}/nCoV-2019.reference.fasta", f"{REF}/sp1_dna.blow5", opt)
        if mesh:
            assert core.mesh_mode == "ring"  # 2 tracks < 4 tp
        out = io.StringIO()
        run_dtw(core, out)
        core.close()
        return out.getvalue()

    assert run("1x4") == run(None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_wavefront_matches_single_kernel():
    """Wavefront ring (carry hops via ppermute) == one single-device
    wavefront pass, bit for bit (interpret mode on the CPU mesh)."""
    from sigfish_tpu.ops.sdtw_pallas import (
        prepare_wavefront_inputs,
        sdtw_wavefront,
    )
    from sigfish_tpu.parallel.shard import ring_fullref_lastrow_wavefront

    rng = np.random.default_rng(3)
    td = 128
    n_tp, Rs = 4, 256  # Rs multiple of td
    W = 48
    lane = W - 1
    Q = 64  # padded query width > W (the production pad_q relation)
    B = 8
    # real columns end early enough to leave >= lane flush diagonals
    R_real = n_tp * Rs - Q
    tracks = [
        rng.standard_normal(s).astype(np.float32)
        for s in (R_real - 700, 400, 300)
    ]
    ref = np.concatenate(tracks)
    reset = np.zeros(R_real, bool)
    pos = 0
    for t in tracks:
        reset[pos] = True
        pos += t.size
    # segment layout: PAD-filled tail, reset at the pad boundary
    ypad = np.full(n_tp * Rs, 1.0e18, np.float32)
    ypad[:R_real] = ref
    rspad = np.zeros(n_tp * Rs, np.float32)
    rspad[:R_real] = reset
    rspad[R_real] = 1.0

    queries = [rng.standard_normal(W).astype(np.float32) for _ in range(B)]
    qb, qlens, onehot = make_query_batch(queries, pad_q=Q)

    mesh = Mesh(np.asarray(jax.devices()[:n_tp]).reshape(1, n_tp), ("dp", "tp"))
    lr_ring = np.asarray(
        ring_fullref_lastrow_wavefront(
            jnp.asarray(qb),
            jnp.asarray(ypad.reshape(n_tp, Rs)),
            jnp.asarray(rspad.reshape(n_tp, Rs)),
            mesh, n_micro=2, lane=lane, td=td, unroll=4, interpret=True,
        )
    )
    # single-device wavefront oracle over the same concatenation
    yp1, rp1, D = prepare_wavefront_inputs(ref, reset, Q, td=td)
    ds = np.asarray(
        sdtw_wavefront(
            jnp.asarray(qb), jnp.asarray(yp1), jnp.asarray(rp1),
            lane=lane, td=td, unroll=4, interpret=True,
        )
    )
    lr1 = ds[:, lane : lane + R_real]
    assert np.array_equal(lr_ring[:, :R_real], lr1)
    # and argmin-level agreement with the scan engine (different op
    # order; candidate selection must still match)
    lr_scan = np.asarray(
        sdtw_scan(jnp.asarray(qb), jnp.asarray(onehot), jnp.asarray(ref),
                  jnp.asarray(reset), ckpt=64)  # 64 divides R_real
    )
    np.testing.assert_allclose(lr_ring[:, :R_real], lr_scan, rtol=1e-5, atol=1e-4)


def test_shard_striping_reproduces_full_run(tmp_path):
    """--shard I/N maps record stripe I (global index mod N); the N
    per-shard outputs together must be exactly the full run's mapping
    set, with each shard's lines in file order (ref: load_db record
    order, sigfish.c:274-305).
    """
    from sigfish_tpu.cli import dtw_main

    fa = "/root/reference/test/nCoV-2019.reference.fasta"
    bl = "/root/reference/test/sp1_dna.blow5"

    def run(extra, name):
        out = str(tmp_path / name)
        rc = dtw_main([fa, bl, "-o", out] + extra)
        assert rc == 0
        return open(out).read().splitlines(keepends=True)

    full = run([], "full.paf")
    assert len(full) == 5
    for n_shards in (2, 3):
        parts = [
            run(["--shard", f"{i}/{n_shards}"], f"s{i}_{n_shards}.paf")
            for i in range(n_shards)
        ]
        # stripe i holds records with global index % n_shards == i, in order
        expect = [
            [ln for j, ln in enumerate(full) if j % n_shards == i]
            for i in range(n_shards)
        ]
        assert parts == expect
        assert sorted(ln for p in parts for ln in p) == sorted(full)


def test_ring_wavefront_carry_clip_shift_interpret():
    """Clipped reads through the carry kernel's new start_lanes: chained
    segments must equal one full wavefront pass AND the scalar oracle at
    every qlen (interpret mode; the hardware leg re-runs this compiled)."""
    import jax.numpy as jnp

    from sigfish_tpu.ops.sdtw import make_query_batch, pad_tracks
    from sigfish_tpu.ops.sdtw_pallas import (
        BIG, PAD, prepare_wavefront_inputs, sdtw_wavefront,
        sdtw_wavefront_carry, shift_queries_for_clip)
    from sigfish_tpu.ops.sdtw_ref import subsequence_cost

    rng = np.random.default_rng(11)
    W, Q, td, lane = 250, 256, 128, 249
    tracks = [rng.standard_normal(s).astype(np.float32) for s in (700, 320)]
    ref, reset, offs = pad_tracks(tracks, ckpt=128, align=W)
    R = ref.shape[0]
    qlist = [rng.standard_normal(n).astype(np.float32)
             for n in (W, 19, 133, W - 1)]
    qb, qlens, _ = make_query_batch(qlist, pad_q=Q)
    qb_k, fs = shift_queries_for_clip(qb, qlens, lane)
    ypad, rspad, D = prepare_wavefront_inputs(ref, reset, Q, td=td)
    sl = jnp.asarray(fs)

    full = np.asarray(sdtw_wavefront(
        jnp.asarray(qb_k), jnp.asarray(ypad), jnp.asarray(rspad),
        lane=lane, td=td, start_lanes=sl, interpret=True))

    B = qb.shape[0]
    a1 = jnp.full((B, Q), BIG, jnp.float32)
    a2 = jnp.full((B, Q), BIG, jnp.float32)
    yw = jnp.full((1, Q), PAD, jnp.float32)
    rw = jnp.zeros((1, Q), jnp.float32)
    outs = []
    half = (D // td // 2) * td
    for a, b in ((0, half), (half, D)):
        o, a1, a2, yw, rw = sdtw_wavefront_carry(
            jnp.asarray(qb_k), jnp.asarray(ypad[:, a:b]),
            jnp.asarray(rspad[:, a:b]), a1, a2, yw, rw,
            lane=lane, td=td, start_lanes=sl, interpret=True)
        outs.append(np.asarray(o))
    chained = np.concatenate(outs, axis=1)
    np.testing.assert_array_equal(chained, full)

    lr = chained[:, lane:lane + R]
    for b2, q in enumerate(qlist):
        for t, tr in enumerate(tracks):
            lo = int(offs[t])
            ex = subsequence_cost(q, tr)[-1]
            np.testing.assert_array_equal(lr[b2, lo:lo + tr.size], ex)
