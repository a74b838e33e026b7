"""Device polyA autodetect (ops/jnn_device.py) vs the host oracle.

The host chain (jnn.detect_polya_end -> native jnnv2/jnn_core) is
fuzz-validated against the C binary; the device pass must match it
bit-for-bit on the CPU backend (all-f32 scans -- no f64-emulation
caveat), including the failure paths (-1) the prefix_fail counter
hangs off (sigfish.c:440-447)."""

import numpy as np
import pytest

from sigfish_tpu.io.blow5 import Slow5File
from sigfish_tpu.ops import jnn
from sigfish_tpu.ops.jnn_device import polya_end_batch

REF = "/root/reference/test"


def _batchify(signals, calib=None):
    B = len(signals)
    S = max(max(s.size for s in signals), 1)
    Sb = 1024
    while Sb < S:
        Sb *= 2
    sig = np.zeros((B, Sb), np.int16)
    ns = np.zeros(B, np.int32)
    digi = np.ones(B)
    off = np.zeros(B)
    rng = np.ones(B)
    for i, s in enumerate(signals):
        sig[i, : s.size] = s
        ns[i] = s.size
        if calib:
            digi[i], off[i], rng[i] = calib[i]
    return sig, ns, digi, off, rng


def test_device_polya_matches_host_on_sequin():
    sf = Slow5File(f"{REF}/sequin_rna.blow5")
    recs = list(sf)
    sf.close()
    host = [
        jnn.detect_polya_end(r.raw_signal, r.to_pa(), pore=0) for r in recs
    ]
    sig, ns, digi, off, rng = _batchify(
        [r.raw_signal for r in recs],
        [(r.digitisation, r.offset, r.range) for r in recs],
    )
    dev = polya_end_batch(sig, ns, digi, off, rng, pore=0)
    assert dev.tolist() == host


@pytest.mark.parametrize("pore", [0, 2])
def test_device_polya_degraded_and_failure_paths(pore):
    """Noise reads (adaptor fails -> -1), too-short signals (n <=
    rolling window -> -1), and synthetic adaptor+polyA shapes, all
    against the host scan, mixed lengths in one batch."""
    rng0 = np.random.default_rng(5)
    digi, off, rg = 8192.0, 10.0, 1400.0

    def synth(n_ad, n_pa, n_tail, lvl_ad=40.0, lvl_pa=108.0, lvl_t=90.0):
        # pA levels -> ADC; adaptor low, polyA in the band (mean_ad+30±20)
        pa = np.concatenate([
            rng0.normal(lvl_ad, 2.0, n_ad),
            rng0.normal(lvl_pa, 2.0, n_pa),
            rng0.normal(lvl_t, 14.0, n_tail),
        ])
        raw = np.rint(pa * digi / rg - off)
        return np.clip(raw, -32000, 32000).astype(np.int16)

    signals = [
        synth(6000, 3000, 9000),
        rng0.integers(-100, 1300, 30000).astype(np.int16),  # noise
        synth(4000, 1500, 2000),
        np.ones(1500, np.int16) * 300,                      # n <= window
        synth(8000, 400, 12000),                            # short polyA
        np.zeros(0, np.int16),                              # empty
        synth(2500, 2600, 5000),
    ]
    from sigfish_tpu.io.blow5 import Slow5Record

    host = []
    for s in signals:
        if s.size == 0:
            host.append(-1)
            continue
        rec = Slow5Record(
            read_id="t", read_group=0, digitisation=digi, offset=off,
            range=rg, sampling_rate=4000.0, raw_signal=s,
        )
        host.append(jnn.detect_polya_end(s, rec.to_pa(), pore=pore))
    sig, ns, d_, o_, r_ = _batchify(
        signals, [(digi, off, rg)] * len(signals)
    )
    dev = polya_end_batch(sig, ns, d_, o_, r_, pore=pore)
    assert dev.tolist() == host
    assert -1 in host  # the failure path was actually exercised


def test_pipeline_device_polya_byte_identical(tmp_path):
    """Full pipeline: --host-stages device with RNA -p -1 must be
    byte-identical to the host path on the CPU backend (the device
    polyA feeds _normalise_single the same py the host scan would)."""
    import io

    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    def run(hs):
        opt = Options(
            rna=True, query_size=500, prefix_size=-1, host_stages=hs,
            num_thread=2,
        )
        core = Core(
            f"{REF}/rnasequin_sequences_2.4.fa",
            f"{REF}/sequin_rna.blow5", opt,
        )
        out = io.StringIO()
        run_dtw(core, out)
        core.close()
        return out.getvalue(), core.prefix_fail

    dev_out, dev_pf = run("device")
    host_out, host_pf = run("host")
    assert dev_out == host_out
    assert dev_pf == host_pf
