"""Chunked-reference wavefront (ops/chunked_ref.py): byte parity with
the one-shot kernel + fused top-5, at unit level and through the full
pipeline (PAF lines), plus the bounded-memory accounting that motivates
it (VERDICT r3 item #4: the (B, D) score-buffer HBM cliff past ~5M
reference columns; the reference's own O(q*r) malloc, sigfish.c:873)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sigfish_tpu.ops.candidates_dev import (
    build_column_maps,
    device_window_top5,
    unpack_top5,
)
from sigfish_tpu.ops.chunked_ref import (
    chunk_segment_diags,
    prepare_chunked_inputs,
    sdtw_wavefront_chunked_top5,
)
from sigfish_tpu.ops.sdtw import make_query_batch, pad_tracks
from sigfish_tpu.ops.sdtw_pallas import (
    prepare_wavefront_inputs,
    sdtw_wavefront,
)


def _rand(n, seed):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def test_chunk_segment_diags_alignment():
    for W, td in [(250, 256), (500, 256), (48, 32), (251, 256), (1, 32)]:
        Ds = chunk_segment_diags(W, td)
        assert Ds % W == 0 and Ds % td == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chunked_top5_byte_parity(seed):
    """Segment-streamed fold == one-shot kernel + device_window_top5,
    bit for bit (scores AND positions), across random track layouts.
    Ds is forced tiny so several windows split across segment
    boundaries (the merge's first-min-wins leg)."""
    rng = np.random.default_rng(seed)
    W, Q, td = 48, 64, 32
    lane = W - 1
    sizes = rng.integers(30, 200, size=4)
    tracks = [rng.standard_normal(s).astype(np.float32) for s in sizes]
    ref, reset, offsets = pad_tracks(tracks, ckpt=32, align=W)
    R = ref.shape[0]
    _, valid = build_column_maps(offsets, R, track_sizes=[t.size for t in tracks])

    B = 6
    qlist = [_rand(W, 100 + seed * 10 + b) for b in range(B)]
    qb, qlens, _ = make_query_batch(qlist, pad_q=Q)
    # near-ties stress first-min-wins: replant some query values so
    # identical costs appear in multiple windows
    qb[1] = qb[0]
    qb_d = jnp.asarray(qb)

    # one-shot reference result
    ypad, rspad, D = prepare_wavefront_inputs(ref, reset, Q, td=td)
    scores = sdtw_wavefront(
        qb_d, jnp.asarray(ypad), jnp.asarray(rspad),
        lane=lane, td=td, unroll=4, interpret=True,
    )
    want = np.asarray(
        device_window_top5(
            scores, jnp.asarray(qlens.astype(np.int32)), jnp.asarray(valid),
            R, W=W, k=5, reindex=True, pack=True,
        )
    )

    yps, rps, vs, Ds, nwin_tot = prepare_chunked_inputs(
        ref, reset, valid, Q, W, td=td, target=td
    )
    assert yps.shape[0] >= 3, "want multiple segments for the fold"
    got = np.asarray(
        sdtw_wavefront_chunked_top5(
            qb_d, jnp.asarray(yps), jnp.asarray(rps), jnp.asarray(vs),
            lane=lane, W=W, nwin_tot=nwin_tot, td=td, unroll=4,
            interpret=True,
        )
    )
    ws, wp = unpack_top5(want)
    gs, gp = unpack_top5(got)
    assert np.array_equal(ws, gs), f"scores differ: {ws} vs {gs}"
    assert np.array_equal(wp, gp), f"positions differ: {wp} vs {gp}"


@pytest.mark.parametrize("clip_budget", [None, 0])
def test_chunked_pipeline_paf_byte_parity(tmp_path, clip_budget, monkeypatch):
    """Full pipeline on a synthetic DNA workload: --ref-chunk forced
    (tiny segments) vs the one-shot path, PAF byte-identical. Includes
    a clipped read (fewer events than prefix+query): with the default
    budget it rides the one-shot-kernel clip sub-batch (clip_dev);
    clip_budget=0 forces the exact host per-read fallback (clip_host) --
    both must produce the same bytes."""
    from sigfish_tpu.io.blow5 import Slow5Record, Slow5Writer
    from sigfish_tpu.models.genref import kmer_ranks, _seq_bytes
    from sigfish_tpu.models.pore_model import MODEL_ID_DNA_R9, load_builtin_model
    from sigfish_tpu.runtime.pipeline import Core, Options, process_batch

    rng = np.random.default_rng(7)
    model = load_builtin_model(MODEL_ID_DNA_R9)
    k = model.kmer_size
    n_bases = 3000
    seq = "".join("ACGT"[b] for b in rng.integers(0, 4, n_bases))
    fa = tmp_path / "ref.fa"
    fa.write_text(f">synth1\n{seq}\n")

    def signal_from(start, n_events):
        sub = seq[start : start + n_events + k - 1]
        levels = model.level_mean[kmer_ranks(_seq_bytes(sub), k, warn_non_acgt=False)]
        dwells = rng.integers(9, 15, size=levels.size)
        pa = np.repeat(levels, dwells).astype(np.float64)
        pa += rng.normal(0.0, 1.2, pa.size)
        raw = np.rint(pa * 8192.0 / 1400.0 - 10.0)
        return np.clip(raw, -32000, 32000).astype(np.int16)

    bl = tmp_path / "reads.blow5"
    with Slow5Writer(str(bl), header_data=None) as w:
        for i in range(6):
            sig = signal_from(int(rng.integers(0, n_bases - 600)), 450)
            w.write_record(
                Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=10.0, range=1400.0, sampling_rate=4000.0,
                    raw_signal=sig,
                )
            )
        # a short read: ~100 events -> qlen < query_size (clip route)
        w.write_record(
            Slow5Record(
                read_id="clip0", read_group=0, digitisation=8192.0,
                offset=10.0, range=1400.0, sampling_rate=4000.0,
                raw_signal=signal_from(40, 100),
            )
        )

    # query_size=64: the forced segment width is lcm(W, td) (window
    # grid x kernel grid), so at the default W=250/td=256 ANY forced
    # value quantizes up to 32,000 diagonals and this reference runs as
    # a single segment -- silently skipping the multi-segment fold the
    # test exists for. W=64 gives lcm=256 -> ~25 segments here.
    W = 64

    def run(ref_chunk):
        opt = Options(engine="pallas", num_thread=2, ref_chunk=ref_chunk,
                      query_size=W)
        core = Core(str(fa), str(bl), opt)
        blobs = core.sf.read_batch(512, 10**9)
        lines, _ = process_batch(core, blobs)
        core.close()
        return lines

    if clip_budget is not None:
        from sigfish_tpu.runtime import pipeline as pl

        monkeypatch.setattr(pl, "_CLIP_ONESHOT_BYTES", clip_budget)

    # the forced-256 run must actually fold across >= 2 segments
    from sigfish_tpu.ops.chunked_ref import chunk_segment_diags

    Ds = chunk_segment_diags(W, target=256)
    R_cols = 2 * (n_bases + 1 - k)
    assert R_cols + W > 2 * Ds, "reference too small to force multi-segment"

    base = run(-1)       # one-shot kernel path
    chunked = run(256)   # forced tiny segments (multi-segment fold)
    assert base == chunked
    assert any(line.split("\t")[0] == "clip0" for line in base)
