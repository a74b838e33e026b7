#!/usr/bin/env python
"""Hardware test: multi-megabase reference on ONE chip via the chunked
wavefront path (ops/chunked_ref.py; VERDICT r3 item #4).

Synthesizes a DNA contig of --mbases megabases (default 2.6 -> R ~ 5.2M
concatenated columns across both strands, past the v5e HBM cliff of the
one-shot (B, D) score buffer at B=512), simulates reads from planted
positions, maps them with the production pipeline, and asserts:

  1. the run completes on one chip (the one-shot path would need a
     ~10.7 GB score buffer per 512-read launch at this R);
  2. planted positions are recovered (eval-style correctness:
     tid+strand and min(|dst|,|dend|) < 100, ref eval.c:219-242);
  3. the auto threshold engaged (R + Q > CHUNK_AUTO_COLS).

Usage: python scripts/test_bigref.py [--mbases 2.6] [--reads 64]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbases", type=float, default=2.6)
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--ref-chunk", type=int, default=0, help="0=auto")
    ap.add_argument(
        "--mesh", default=None,
        help="DPxTP ring mesh (CPU virtual devices: set XLA_FLAGS "
        "--xla_force_host_platform_device_count + JAX_PLATFORMS=cpu)",
    )
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import sigfish_tpu

    sigfish_tpu.enable_xla_cache()
    from sigfish_tpu.io.blow5 import Slow5Record, Slow5Writer
    from sigfish_tpu.models.genref import _seq_bytes, kmer_ranks
    from sigfish_tpu.models.pore_model import MODEL_ID_DNA_R9, load_builtin_model
    from sigfish_tpu.ops.chunked_ref import CHUNK_AUTO_COLS
    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    rng = np.random.default_rng(args.seed)
    model = load_builtin_model(MODEL_ID_DNA_R9)
    k = model.kmer_size
    n_bases = int(args.mbases * 1e6)

    print(f"[bigref] synthesizing {n_bases:,} base contig ...", flush=True)
    seq = "".join("ACGT"[b] for b in rng.integers(0, 4, n_bases))
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    fa.write(f">bigsynth\n{seq}\n")
    fa.close()

    def signal_from(start: int, n_events: int) -> np.ndarray:
        sub = seq[start : start + n_events + k - 1]
        levels = model.level_mean[
            kmer_ranks(_seq_bytes(sub), k, warn_non_acgt=False)
        ]
        dwells = rng.integers(9, 15, size=levels.size)
        pa = np.repeat(levels, dwells).astype(np.float64)
        pa += rng.normal(0.0, 1.2, pa.size)
        raw = np.rint(pa * 8192.0 / 1400.0 - 10.0)
        return np.clip(raw, -32000, 32000).astype(np.int16)

    truths: dict[str, tuple[int, int]] = {}
    bl = tempfile.NamedTemporaryFile(suffix=".blow5", delete=False)
    bl.close()
    n_clip = 0
    with Slow5Writer(bl.name, header_data=None) as w:
        for i in range(args.reads):
            start = int(rng.integers(0, n_bases - 800))
            # every 4th read is SHORT (~150 events after the prefix ->
            # qlen < 250): exercises the chunked path's clipped-read
            # route (one-shot kernel sub-batch / host fallback) at the
            # full reference scale, not just full-length reads
            n_ev = 200 if i % 4 == 3 else 450
            n_clip += n_ev < 300
            truths[f"r{i}"] = (start, n_ev)
            w.write_record(
                Slow5Record(
                    read_id=f"r{i}", read_group=0, digitisation=8192.0,
                    offset=10.0, range=1400.0, sampling_rate=4000.0,
                    raw_signal=signal_from(start, n_ev),
                )
            )
    print(f"[bigref] {n_clip}/{args.reads} reads clipped (short)", flush=True)

    # pallas explicitly: the chunked path is a wavefront-engine feature
    # (off-TPU this runs the interpreter -- tiny --mbases only)
    opt = Options(
        ref_chunk=args.ref_chunk, num_thread=4, engine="pallas",
        mesh=args.mesh,
    )
    t0 = time.time()
    core = Core(fa.name, bl.name, opt)
    R = core.ref_cat.shape[0]
    auto_on = R + core.pad_q > CHUNK_AUTO_COLS or args.ref_chunk > 0
    print(
        f"[bigref] R = {R:,} columns; chunked path engaged: {auto_on} "
        f"(auto threshold {CHUNK_AUTO_COLS:,})",
        flush=True,
    )
    if not auto_on:
        print("[bigref] FAIL: reference too small to exercise the chunked path")
        return 1
    import io

    out = io.StringIO()
    run_dtw(core, out)
    dt = time.time() - t0
    core.close()

    n_ok = 0
    n_map = 0
    for line in out.getvalue().splitlines():
        f = line.split("\t")
        rid, strand, st, end = f[0], f[4], int(f[7]), int(f[8])
        n_map += 1
        t_st, t_nev = truths[rid]
        t_end = t_st + t_nev + k - 1
        if strand == "+" and min(abs(st - t_st), abs(end - t_end)) < 100:
            n_ok += 1
    print(
        f"[bigref] mapped {n_map}/{args.reads}, correct {n_ok} "
        f"({100.0 * n_ok / max(1, args.reads):.1f}%), wall {dt:.1f}s",
        flush=True,
    )
    # random-sequence self-mapping at q=250 events is essentially exact;
    # demand >= 90% planted-position recovery
    if n_map < args.reads or n_ok < 0.9 * args.reads:
        print("[bigref] FAIL")
        return 1
    print("[bigref] PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
