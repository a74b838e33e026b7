"""Device-side eventization (ops/events_device.py) vs the host oracle.

Bit-exactness contract: on a backend with IEEE f64 (the CPU backend used
here), detect_events_batch must reproduce ops/events.detect_events --
and therefore the native sf_detect_events and the C reference --
boundary for boundary and bit for bit in (length, mean, stdv).
ref: src/events.c:297-508.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module", autouse=True)
def _x64():
    """The t-stat chain is f64 by contract; restore the flag after so
    the rest of the suite keeps the default dtype behavior."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _random_reads(rng, n, rna):
    """Signal mix mirroring parity_fuzz's generator: stepwise
    model-like dwell signals, pure noise, near-flat, short."""
    sigs = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.5:
            n_ev = int(rng.integers(20, 220))
            lv = rng.normal(90.0, 12.0, n_ev)
            dw = rng.integers(6, 28 if rna else 13, n_ev)
            x = np.repeat(lv, dw) + rng.normal(0, 1.5, int(dw.sum()))
            sig = np.clip(np.rint(x * 8192.0 / 1400.0 - 5.0), -30000, 30000)
        elif kind < 0.75:
            sig = rng.integers(300, 900, int(rng.integers(500, 6000)))
        elif kind < 0.9:
            n_s = int(rng.integers(100, 2000))
            sig = np.full(n_s, 512) + rng.integers(-2, 3, n_s)
        else:
            sig = rng.integers(-30000, 30000, int(rng.integers(2, 200)))
        sigs.append(sig.astype(np.int16))
    return sigs


@pytest.mark.parametrize("rna", [False, True])
def test_device_events_bit_exact_vs_host(rna):
    from sigfish_tpu.ops.events import detect_events
    from sigfish_tpu.ops.events_device import detect_events_batch

    rng = np.random.default_rng(42 + rna)
    sigs = _random_reads(rng, 24, rna)
    B = len(sigs)
    S = max(s.size for s in sigs)
    batch = np.zeros((B, S), np.int16)
    ns = np.zeros(B, np.int32)
    for b, s in enumerate(sigs):
        batch[b, : s.size] = s
        ns[b] = s.size
    digi = np.full(B, 8192.0)
    off = np.full(B, 5.0)
    rng_pa = np.full(B, 1400.0)

    tables, overflow = detect_events_batch(batch, ns, digi, off, rng_pa, rna)
    assert not overflow.any()

    raw_unit = np.float32(1400.0) / np.float32(8192.0)
    for b, s in enumerate(sigs):
        pa = (s.astype(np.float32) + np.float32(5.0)) * raw_unit
        ref = detect_events(pa, rna=rna)
        et = tables[b]
        assert et is not None
        assert et.n == ref.n, f"read {b}: {et.n} vs {ref.n} events"
        np.testing.assert_array_equal(et.start, ref.start, err_msg=f"read {b}")
        np.testing.assert_array_equal(et.length, ref.length, err_msg=f"read {b}")
        np.testing.assert_array_equal(et.mean, ref.mean, err_msg=f"read {b}")
        np.testing.assert_array_equal(et.stdv, ref.stdv, err_msg=f"read {b}")


def test_device_events_real_reads():
    """All reads of the in-repo DNA + RNA test files, mixed calibration
    per file, bit-exact vs the host detector."""
    from sigfish_tpu.io.blow5 import Slow5File
    from sigfish_tpu.ops.events import detect_events
    from sigfish_tpu.ops.events_device import detect_events_batch

    for path, rna in [
        ("/root/reference/test/sp1_dna.blow5", False),
        ("/root/reference/test/sequin_rna.blow5", True),
    ]:
        with Slow5File(path) as sf:
            recs = list(sf)
        B = len(recs)
        S = max(r.raw_signal.size for r in recs)
        batch = np.zeros((B, S), np.int16)
        ns = np.zeros(B, np.int32)
        for b, r in enumerate(recs):
            batch[b, : r.raw_signal.size] = r.raw_signal
            ns[b] = r.raw_signal.size
        tables, overflow = detect_events_batch(
            batch, ns,
            np.array([r.digitisation for r in recs]),
            np.array([r.offset for r in recs]),
            np.array([r.range for r in recs]),
            rna,
        )
        assert not overflow.any()
        for b, r in enumerate(recs):
            ref = detect_events(r.to_pa(), rna=rna)
            et = tables[b]
            assert et.n == ref.n, f"{path} read {b}"
            np.testing.assert_array_equal(et.start, ref.start)
            np.testing.assert_array_equal(et.length, ref.length)
            np.testing.assert_array_equal(et.mean, ref.mean)
            np.testing.assert_array_equal(et.stdv, ref.stdv)


def test_device_events_overflow_flags_not_crashes():
    """A pathological high-frequency signal overflowing the E cap must
    flag, not mis-segment."""
    from sigfish_tpu.ops.events_device import detect_events_batch

    rng = np.random.default_rng(0)
    # alternating extremes produce near-max event density
    s = (np.tile([20000, -20000], 600) + rng.integers(-5, 5, 1200)).astype(
        np.int16
    )
    batch = s[None, :]
    tables, overflow = detect_events_batch(
        batch, np.array([s.size], np.int32),
        np.array([8192.0]), np.array([5.0]), np.array([1400.0]), False,
    )
    # either it fits the cap (fine) or it flags -- never a silent trim
    if overflow[0]:
        assert tables[0] is None
    else:
        assert tables[0] is not None and tables[0].n >= 1


def test_event_batch_device_long_read_chunk_sizing(monkeypatch):
    """ADVICE r3 (medium): once a read's padded plane would exceed the
    device cell ceiling, the 64-read bucket floor must drop (Bb down to
    1), and a read whose signal ALONE exceeds the ceiling must route to
    the exact host path -- with every read's event table identical to
    _event_single either way. Shrinks the ceiling so the test exercises
    the long-read routing with kilobyte signals."""
    import types

    from sigfish_tpu.io.blow5 import Slow5Record
    from sigfish_tpu.runtime import pipeline as pl

    monkeypatch.setattr(pl, "_DEV_EVENT_CELL_CAP", 1 << 14)
    rng = np.random.default_rng(7)
    # mix: short (shared 64-floor bucket), mid (max_b == 1 bucket:
    # Sb=16384 -> Bb=1), ultra-long (> ceiling -> host path)
    lens = [900, 1100, 1300, 9000, 12000, 17000, 20000, 700]
    works = []
    for i, n in enumerate(lens):
        n_ev = max(8, n // 40)
        lv = rng.normal(90.0, 12.0, n_ev)
        dw = rng.integers(10, 70, n_ev)
        x = np.repeat(lv, dw)[:n]
        x = np.pad(x, (0, max(0, n - x.size)), mode="edge")
        sig = np.clip(np.rint(x * 8192.0 / 1400.0 - 5.0 + rng.normal(0, 1.0, n)),
                      -30000, 30000).astype(np.int16)
        w = pl.ReadWork()
        w.rec = Slow5Record(
            read_id=f"r{i}", read_group=0, digitisation=8192.0, offset=5.0,
            range=1400.0, sampling_rate=4000.0, raw_signal=sig,
        )
        works.append(w)
    core = types.SimpleNamespace(opt=types.SimpleNamespace(rna=False))

    pl._event_batch_device(core, works)

    for i, n in enumerate(lens):
        ref = pl.ReadWork()
        ref.rec = works[i].rec
        pl._event_single(core, ref)
        w = works[i]
        assert w.n_events == ref.n_events, f"read {i} (len {n})"
        np.testing.assert_array_equal(w.event_start, ref.event_start)
        np.testing.assert_array_equal(w.event_length, ref.event_length)
        np.testing.assert_array_equal(w.event_mean, ref.event_mean)
