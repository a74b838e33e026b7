#!/usr/bin/env python
"""Empirical VPU speed-of-light for the wavefront kernel (VERDICT r4 #3).

The sDTW wavefront is min-plus: no MXU path, the VPU is the roofline.
DESIGN §1's op-budget argument assumed ~1 vector instruction/cycle
without a measurement; this script MEASURES the achievable peak:

  1. per-op-class peak throughput (Gop/s on (B, Q) f32 resident in
     VMEM): independent-chain add / min / select / cross-lane roll --
     a Pallas kernel with zero recurrence, the practical ceiling for
     any elementwise schedule on this chip;
  2. the kernel's exact 8-op recurrence (roll, 2x min, 2x select, sub,
     abs, add -- see ops/sdtw_pallas.py _wavefront_tile) replayed as a
     bare loop-carried chain ("mix"; the gap to the real kernel is
     grid/emission/SMEM overhead) and as two independent interleaved
     chains ("mix2"; the gap to mix is recurrence-latency headroom --
     the split-B-for-ILP experiment);
  3. the real kernel's device-time rate (grid overhead included),
     and the resulting percent-of-peak.

Usage: python scripts/bench_vpu_peak.py [--td 128] [--iters 512]
Prints one summary block; the final line is machine-readable JSON.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _device_time(fn) -> float:
    """Run fn under the JAX profiler; return the PER-LAUNCH device time
    (seconds) of the dominant XLA op (the kernel under test). Wall
    clock through the axon relay carries multi-ms jitter per call;
    device_duration from the xplane is the clean number."""
    import glob
    import tempfile

    import jax

    d = tempfile.mkdtemp(prefix="sfpk_trace_")
    with jax.profiler.trace(d):
        fn()
    pbs = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        raise RuntimeError("no xplane.pb produced by the profiler")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: ~10 s

    space = xplane_pb2.XSpace()
    space.ParseFromString(open(pbs[0], "rb").read())
    best_total = 0.0
    best_cnt = 1
    for p in space.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            tot = {}
            cnt = {}
            for e in line.events:
                name = p.event_metadata[e.metadata_id].name
                tot[name] = tot.get(name, 0.0) + e.duration_ps / 1e12
                cnt[name] = cnt.get(name, 0) + 1
            if tot:
                top = max(tot, key=tot.get)
                if tot[top] > best_total:
                    best_total, best_cnt = tot[top], cnt[top]
    if best_total == 0.0:
        raise RuntimeError("no device ops found in trace")
    return best_total / max(best_cnt, 1)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--td", type=int, default=128)
    # iters = UNROLLED body size (Mosaic compile cost scales with it --
    # keep small); grid repeats the body so runtime work is iters*grid
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Q = 512, 256
    CH = 4  # independent chains: enough ILP to hide op latency

    def peak_kernel(x_ref, o_ref, *, iters, mode):
        # one grid step = `iters` unrolled op groups; VMEM-resident
        # state carries across grid steps via o_ref accumulation, so
        # nothing is hoistable and compile cost stays O(iters)
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            o_ref[:] = x_ref[:]

        a = [o_ref[:] + np.float32(i) for i in range(CH)]
        b = x_ref[:] * np.float32(0.5)
        half = np.float32(0.5)
        one = np.int32(1)
        mask = x_ref[:] > half
        for _ in range(iters):
            # single-op chains feed PAIRS mutually: an idempotent chain
            # like min(min(v,b),b) or where(m,where(m,v,b),b) folds
            # algebraically (the first run "measured" select at 37
            # Top/s -- eliminated), while mutual feeds stay live
            if mode == "add":
                for c in range(0, CH, 2):
                    a[c] = a[c] + a[c + 1]
                    a[c + 1] = a[c + 1] + a[c]
            elif mode == "min":
                for c in range(0, CH, 2):
                    a[c] = jnp.minimum(a[c], a[c + 1])
                    a[c + 1] = jnp.minimum(a[c + 1], a[c])
            elif mode == "select":
                for c in range(0, CH, 2):
                    a[c] = jnp.where(mask, a[c + 1], a[c])
                    a[c + 1] = jnp.where(mask, a[c], a[c + 1])
            elif mode == "roll":
                a = [pltpu.roll(v, shift=one, axis=1) for v in a]
            elif mode in ("mix", "mix2"):
                # the EXACT _wavefront_tile recurrence on dummy data
                # (loop-carried like the real kernel, so nothing can be
                # hoisted/DCE'd): 8 vector ops per step = roll + 2 min
                # + 2 select + sub + abs + add. mix = one chain (the
                # kernel's dependency structure); mix2 = two independent
                # interleaved chains -- the "split B in half for ILP"
                # experiment: if mix2 sustains more ops/s than mix, the
                # recurrence latency (not issue rate) limits the kernel
                n_ch = 1 if mode == "mix" else 2
                for c in range(n_ch):
                    a1, b2 = a[2 * c], a[2 * c + 1]
                    up = pltpu.roll(a1, shift=one, axis=1)
                    ld = jnp.where(mask, b, jnp.minimum(a1, b2))
                    local = jnp.abs(a1 - b)
                    anew = local + jnp.minimum(up, ld)
                    anew = jnp.where(mask, local, anew)
                    a[2 * c], a[2 * c + 1] = anew, up
            else:
                raise ValueError(mode)
        acc = a[0]
        for v in a[1:]:
            acc = acc + v
        o_ref[:] = acc

    def run_peak(mode, iters):
        k = pl.pallas_call(
            functools.partial(peak_kernel, iters=iters, mode=mode),
            out_shape=jax.ShapeDtypeStruct((B, Q), jnp.float32),
            grid=(args.grid,),
            in_specs=[pl.BlockSpec((B, Q), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, Q), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        x = jnp.asarray(
            np.random.default_rng(0).random((B, Q), np.float32)
        )
        n_launch = 4  # chained inside one jit: amortizes link latency

        @jax.jit
        def f(x):
            for _ in range(n_launch):
                x = k(x) * np.float32(1e-3)  # keep values finite
            return x

        float(np.asarray(f(x))[0, 0])  # compile + first-touch
        # DEVICE time from the profiler: wall clock through the axon
        # relay carries multi-ms jitter per call -- useless for a
        # utilization ratio (it "measured" the add peak below the real
        # kernel's sustained rate)
        dt = _device_time(lambda: float(np.asarray(f(x))[0, 0]))
        ops_per_iter = {"mix": 8, "mix2": 16}.get(mode, CH)
        gops = B * Q * iters * args.grid * ops_per_iter / dt / 1e9
        return gops, dt

    print(f"(B, Q) = ({B}, {Q}), {CH} independent chains, "
          f"{args.iters} iters", flush=True)
    peaks = {}
    for mode in ("add", "min", "select", "roll", "mix", "mix2"):
        gops, dt = run_peak(mode, args.iters)
        peaks[mode] = gops
        print(f"  {mode:7s} {gops:9.1f} Gop/s   ({dt*1e3:.2f} ms)",
              flush=True)

    # ---- the real kernel: device-time rate via timed chained launches
    from sigfish_tpu.models.genref import gen_ref
    from sigfish_tpu.models.pore_model import (
        MODEL_ID_DNA_R9,
        load_builtin_model,
    )
    from sigfish_tpu.ops.sdtw import pad_tracks
    from sigfish_tpu.ops.sdtw_pallas import (
        prepare_wavefront_inputs,
        sdtw_wavefront,
    )

    model = load_builtin_model(MODEL_ID_DNA_R9)
    ref = gen_ref(
        "/root/reference/test/nCoV-2019.reference.fasta", model, rna=False
    )
    tracks = []
    for j in range(ref.num_ref):
        tracks.append(ref.forward[j])
        tracks.append(ref.reverse[j])
    ref_cat, reset, _ = pad_tracks(tracks, ckpt=512)
    ypad, rspad, D = prepare_wavefront_inputs(ref_cat, reset, Q, td=args.td)
    qb = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, Q)).astype(np.float32)
    )
    ypad_d, rspad_d = jnp.asarray(ypad), jnp.asarray(rspad)

    n_it = 5

    @jax.jit
    def chain(q0, yp, rp):
        q = q0
        for _ in range(n_it):
            o = sdtw_wavefront(q, yp, rp, lane=Q - 1, td=args.td)
            q = q + o[:, :Q] * 0.0
        return q

    float(np.asarray(chain(qb, ypad_d, rspad_d))[0, 0])
    # per-launch device time of the wavefront custom-call
    dt = _device_time(
        lambda: float(np.asarray(chain(qb, ypad_d, rspad_d))[0, 0])
    )
    kcells = B * Q * D / dt / 1e9
    OPS_PER_CELL = 8  # roll + 2 min + 2 select + sub + abs + add
    kops = kcells * OPS_PER_CELL

    # speed of light for THIS op mix = the bare same-mix step chain
    # (mix2 if ILP buys anything); the ALU ceiling is the add peak
    sol = max(peaks["mix"], peaks["mix2"])
    pct_mix = 100.0 * kops / sol
    pct_alu = 100.0 * kops / peaks["add"]
    print(f"\nkernel td={args.td}: {kcells:7.1f} Gcell/s "
          f"= {kops:7.1f} Gop/s at {OPS_PER_CELL} vector ops/cell")
    print(f"  vs same-mix step chain ({sol:.0f} Gop/s attainable): "
          f"{pct_mix:5.1f}%")
    print(f"  vs pure-ALU add peak ({peaks['add']:.0f} Gop/s): "
          f"{pct_alu:5.1f}%")
    ilp_gain = peaks["mix2"] / max(peaks["mix"], 1e-9)
    print(f"  mix2/mix ILP gain: {ilp_gain:.2f}x "
          f"({'latency-bound: split-B would help' if ilp_gain > 1.15 else 'issue-bound: no ILP headroom'})")
    print(json.dumps(dict(
        td=args.td, kernel_gcells_per_s=round(kcells, 1),
        ops_per_cell=OPS_PER_CELL,
        kernel_gops_per_s=round(kops, 1),
        peak_gops=dict((k, round(v, 1)) for k, v in peaks.items()),
        pct_of_mix_peak=round(pct_mix, 1),
        pct_of_alu_peak=round(pct_alu, 1),
    )), flush=True)


if __name__ == "__main__":
    main()
