#!/usr/bin/env python
"""Sustained-scale soak: a generated multi-10k-read BLOW5 through the
full production pipeline on the real device, timed INCLUDING cold start
(compile + first host<->device touch), plus the compiled wavefront
step's device-memory analysis.

Usage: python scripts/soak.py [n_reads] [--trace DIR]
Prints one JSON line:
  {"soak_reads": N, "wall_s": ..., "reads_per_s_sustained": ...,
   "cold_start_s": ..., "hbm_bytes": ..., "output_lines": N}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(path: str, n_copies: int) -> int:
    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer

    src = Slow5File("/root/reference/test/sp1_dna.blow5")
    recs = list(src)
    hdr = src.header_data
    src.close()
    with Slow5Writer(path, header_data=hdr) as w:
        for i in range(n_copies):
            for r in recs:
                w.write_record(
                    Slow5Record(
                        read_id=f"{r.read_id}_{i}",
                        read_group=r.read_group,
                        digitisation=r.digitisation,
                        offset=r.offset,
                        range=r.range,
                        sampling_rate=r.sampling_rate,
                        raw_signal=r.raw_signal,
                    )
                )
    return len(recs) * n_copies


def main() -> None:
    import sigfish_tpu

    sigfish_tpu.enable_xla_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_reads = int(args[0]) if args else 50_000
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]

    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    tmp = tempfile.mktemp(suffix=".blow5")
    try:
        n = build(tmp, (n_reads + 4) // 5)
        sys.stderr.write(f"[soak] workload: {n} reads\n")

        class CountSink:
            lines = 0

            def write(self, s: str) -> None:
                self.lines += s.count("\n")

            def flush(self) -> None:
                pass

        t_start = time.time()
        core = Core(
            "/root/reference/test/nCoV-2019.reference.fasta", tmp, Options()
        )
        sink = CountSink()
        # cold start = init + first batch (compile + axon first touch)
        from sigfish_tpu.runtime.pipeline import process_batch

        blobs = core.sf.read_batch(512, 20_000_000)
        lines, _ = process_batch(core, blobs)
        sink.lines += sum(1 for l in lines if l)
        cold = time.time() - t_start

        if trace_dir:
            import jax

            with jax.profiler.trace(trace_dir):
                run_dtw(core, sink)
        else:
            run_dtw(core, sink)
        wall = time.time() - t_start
        total = core.total_reads + len(blobs)

        hbm = None
        try:
            import jax

            d = jax.devices()[0]
            stats = d.memory_stats()
            if stats:
                hbm = int(stats.get("peak_bytes_in_use", 0))
        except Exception:
            pass

        core.close()
        print(
            json.dumps(
                {
                    "soak_reads": total,
                    "wall_s": round(wall, 1),
                    # sustained = steady state AFTER the cold start
                    # (first-touch + compile); total/wall buried a 224 s
                    # cold start in a 241 s run and reported 207 r/s for
                    # a ~2,960 r/s steady state. The warmup batch's
                    # reads are excluded from the numerator too -- they
                    # were processed inside the cold window
                    "reads_per_s_sustained": round(
                        core.total_reads / max(wall - cold, 1e-9), 1
                    ),
                    "reads_per_s_incl_cold": round(total / wall, 1),
                    "cold_start_s": round(cold, 1),
                    "hbm_peak_bytes": hbm,
                    "output_lines": sink.lines,
                }
            )
        )
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
