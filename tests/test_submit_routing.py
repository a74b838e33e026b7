"""Submission-routing regressions: DEVICE_CHUNK splitting (including
single_device sub-batches under a mesh), flag forwarding through the
parts recursion, and the tail-batch bucket floor."""

import io

import numpy as np
import pytest

import jax

from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

REF = "/root/reference/test"
FA = f"{REF}/nCoV-2019.reference.fasta"
BL = f"{REF}/sp1_dna.blow5"


def test_device_chunk_split_single_device(monkeypatch):
    """A single-device submission larger than DEVICE_CHUNK splits into
    sub-launches and reassembles identically (the split must also fire
    for single_device=True -- the ring clip sub-batch path)."""
    core = Core(FA, BL, Options(query_size=64, engine="scan"))
    try:
        rng = np.random.default_rng(3)
        B, Q = 16, core.pad_q
        qb = rng.standard_normal((B, Q)).astype(np.float32)
        qlens = np.full(B, 64, np.int64)
        qlens[3] = 20  # one clipped read rides the split too
        onehot = np.zeros((B, Q), np.float32)
        rows = np.arange(B)
        onehot[rows, np.maximum(qlens - 1, 0)] = 1.0

        base = core.sdtw_candidates(qb, qlens, onehot)

        monkeypatch.setattr(core, "DEVICE_CHUNK", 4)
        for kw in (
            dict(),
            dict(single_device=True),
            dict(force_oneshot=True),
        ):
            h = core.sdtw_candidates_submit(qb, qlens, onehot, **kw)
            assert "parts" in h, f"no split with {kw}"
            ts, tp = core.sdtw_candidates_collect(h)
            np.testing.assert_array_equal(ts, base[0])
            np.testing.assert_array_equal(tp, base[1])
    finally:
        core.close()


@pytest.mark.parametrize("k_opt,expect", [(512, 512), (1000, 512), (300, 300)])
def test_tail_bucket_floor_follows_compiled_shape(monkeypatch, k_opt, expect):
    """The tail-batch floor equals the shape full batches compiled:
    bucket-of(batch_size), capped at DEVICE_CHUNK off-mesh -- never a
    hardcoded 512 (wrong under SIGFISH_TPU_DEVICE_CHUNK / odd -K)."""
    from sigfish_tpu.runtime import pipeline as P

    core = Core(FA, BL, Options(query_size=64, batch_size=k_opt,
                                engine="pallas"))
    try:
        # pretend we're on real hardware so the floor engages
        core.wf_interpret = False
        captured = {}

        def fake_submit(qb, qlens, onehot, n_live=None, **kw):
            captured["B"] = qb.shape[0]
            return dict(native=True, top_s=np.full((qb.shape[0], 5), 3e38,
                                                   np.float32),
                        top_p=np.full((qb.shape[0], 5), -1, np.int64),
                        qlens=qlens, B=qb.shape[0], clipped_done=True)

        monkeypatch.setattr(core, "sdtw_candidates_submit", fake_submit)
        blobs = [b"\x00"] * 0  # not used; craft works directly
        # 100 live reads = a "tail" below the full batch size but > 64
        works = []
        rng = np.random.default_rng(0)
        pending = None
        # build a fake batch through submit_batch's bucket logic by
        # monkeypatching the host stages away
        monkeypatch.setattr(
            P, "_prepare_read",
            lambda c, b: _fake_work(rng, c.opt.query_size),
        )
        pending = P.submit_batch(core, [b"x"] * 100)
        assert captured["B"] == expect
    finally:
        core.close()


def _fake_work(rng, W):
    from sigfish_tpu.runtime.pipeline import ReadWork

    w = ReadWork()
    w.query = rng.standard_normal(W).astype(np.float32)
    w.qstart, w.qend = 0, W
    w.n_events = W
    w.event_start = np.arange(W, dtype=np.uint64)
    w.event_length = np.ones(W, np.float32)
    w.event_mean = w.query.copy()
    return w
