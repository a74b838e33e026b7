#!/usr/bin/env python
"""Clipped-read throughput check on the TPU (pallas) engine.

Workload A: the 5 sp1_dna reads replicated N times (all full-length,
qlen == W). Workload B: same, but half the copies have their raw
signal truncated so eventization yields fewer than prefix+W events --
the short-read clip path (ref sigfish.c:457-461). Prints both warm
reads/s and the ratio; VERDICT r1 item 5's bar is clip50 >= 50% of
full-length throughput on the device clip pass.

Run on the TPU host: python scripts/bench_clip.py [n_copies]
"""

import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_FASTA = "/root/reference/test/nCoV-2019.reference.fasta"
REF_BLOW5 = "/root/reference/test/sp1_dna.blow5"


def build(path: str, n_copies: int, clip_every_other: bool) -> int:
    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer

    src = Slow5File(REF_BLOW5)
    recs = list(src)
    hdr = src.header_data
    src.close()
    n = 0
    with Slow5Writer(path, header_data=hdr) as w:
        for i in range(n_copies):
            for j, r in enumerate(recs):
                sig = r.raw_signal
                if clip_every_other and (i * len(recs) + j) % 2 == 1:
                    # ~150-290 events at DNA dwell ~10: below prefix+W
                    sig = sig[: 1500 + 170 * (j % 8)]
                w.write_record(
                    Slow5Record(
                        read_id=f"{r.read_id}_{i}",
                        read_group=r.read_group,
                        digitisation=r.digitisation,
                        offset=r.offset,
                        range=r.range,
                        sampling_rate=r.sampling_rate,
                        raw_signal=sig,
                    )
                )
                n += 1
    return n


def run(blow5: str) -> float:
    from sigfish_tpu.runtime.pipeline import Core, Options, process_batch, run_dtw

    opt = Options(engine="pallas")
    core = Core(REF_FASTA, blow5, opt)
    blobs = core.sf.read_batch(opt.batch_size, opt.batch_size_bytes)
    process_batch(core, blobs)  # warmup: compile + axon first touch
    core.close()
    best = 0.0
    for _ in range(2):
        core = Core(REF_FASTA, blow5, Options(engine="pallas"))
        t0 = time.time()
        run_dtw(core, io.StringIO())
        best = max(best, core.total_reads / (time.time() - t0))
        n_clip = core.too_short
        core.close()
    return best, n_clip


def main() -> None:
    import sigfish_tpu

    sigfish_tpu.enable_xla_cache()
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    a = tempfile.mktemp(suffix=".blow5")
    b = tempfile.mktemp(suffix=".blow5")
    try:
        build(a, n_copies, False)
        build(b, n_copies, True)
        full_rps, _ = run(a)
        clip_rps, n_clip = run(b)
        print(
            f"full-length: {full_rps:.0f} reads/s | 50%-clipped: "
            f"{clip_rps:.0f} reads/s ({n_clip} clipped) | ratio "
            f"{100 * clip_rps / full_rps:.0f}%"
        )
    finally:
        for p in (a, b):
            if os.path.exists(p):
                os.unlink(p)


if __name__ == "__main__":
    main()
