#!/usr/bin/env python
"""Wavefront-kernel microbench: Gcell/s on the real device.

Workload: nCoV-scale single-device shapes (B=512 reads x Q=256 lanes,
D = padded diagonals covering the 60k-column two-strand reference).
Cells = B * Q * D_real... more precisely the kernel computes B * Q
cells per diagonal step over D steps, so rate = B * Q * D / t.

Usage: python scripts/bench_kernel.py [td ...] [--unroll N ...] [--q N]
Prints one line per (td, unroll) combo, including the COLD compile
time (the fully-unrolled tile body's Mosaic cost scales with td; the
grid dimension is the partial-unroll mechanism -- a smaller td is
exactly "unroll td diagonals per grid step"). Set
SIGFISH_TPU_NO_XLA_CACHE=1 to defeat the persistent cache and measure
true cold compiles.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sigfish_tpu.models.genref import gen_ref
    from sigfish_tpu.models.pore_model import MODEL_ID_DNA_R9, load_builtin_model
    from sigfish_tpu.ops.sdtw import pad_tracks
    from sigfish_tpu.ops.sdtw_pallas import (
        prepare_wavefront_inputs,
        sdtw_wavefront,
    )

    argv0 = sys.argv[1:]
    Q, B = 256, 512
    for flag, name in (("--q", "Q"), ("--b", "B")):
        if flag in argv0:
            k0 = argv0.index(flag)
            if name == "Q":
                Q = int(argv0[k0 + 1])
            else:
                B = int(argv0[k0 + 1])
            argv0 = argv0[:k0] + argv0[k0 + 2 :]
    sys.argv[1:] = argv0
    model = load_builtin_model(MODEL_ID_DNA_R9)
    ref = gen_ref(
        "/root/reference/test/nCoV-2019.reference.fasta", model, rna=False
    )
    tracks = []
    for j in range(ref.num_ref):
        tracks.append(ref.forward[j])
        tracks.append(ref.reverse[j])
    ref_cat, reset, _ = pad_tracks(tracks, ckpt=512)
    rng = np.random.default_rng(0)
    qb = rng.standard_normal((B, Q)).astype(np.float32)

    argv = sys.argv[1:]
    if "--unroll" in argv:
        k = argv.index("--unroll")
        unrolls = [int(a) for a in argv[k + 1 :]]
        argv = argv[:k]
    else:
        unrolls = [8]
    tds = [int(a) for a in argv] or [128]

    # pay the axon first-touch stall before any timed compile
    float(np.asarray(jnp.ones((8, 128)) + 1)[0, 0])

    for td in tds:
        ypad, rspad, D = prepare_wavefront_inputs(ref_cat, reset, Q, td=td)
        ypad_d = jnp.asarray(ypad)
        rspad_d = jnp.asarray(rspad)
        qb_d = jnp.asarray(qb)
        for unroll in unrolls:
            if td % unroll:
                continue
            def sync(x):
                # the axon transport's block_until_ready returns early;
                # a 1-element fetch is the reliable fence
                return float(np.asarray(x[0, 0]))

            @jax.jit
            def chain(q0, yp, rp):
                # n_it dependent kernel launches inside ONE computation:
                # timing excludes per-launch link latency; the (B, Q)
                # feedback add is noise vs the (B, Q, D) kernel work
                q = q0
                for _ in range(n_it):
                    o = sdtw_wavefront(
                        q, yp, rp, lane=Q - 1, td=td, unroll=unroll
                    )
                    q = q + o[:, :Q] * 0.0
                return q

            n_it = 5
            tc0 = time.time()
            sync(chain(qb_d, ypad_d, rspad_d))  # compile + first-touch
            t_compile = time.time() - tc0
            t0 = time.time()
            sync(chain(qb_d, ypad_d, rspad_d))
            dt = (time.time() - t0) / n_it
            cells = B * Q * D
            print(
                f"td={td:4d} unroll={unroll:3d} Q={Q} D={D} "
                f"{dt*1e3:8.2f} ms  {cells/dt/1e9:7.1f} Gcell/s  "
                f"compile {t_compile:6.1f} s",
                flush=True,
            )


if __name__ == "__main__":
    main()
