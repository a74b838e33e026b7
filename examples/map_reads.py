"""Programmatic use of sigfish-tpu (the library behind the CLI).

Three things a script might do beyond `python -m sigfish_tpu.cli`:

  1. map reads and consume PAF records in-process (no subprocess, no
     stdout parsing),
  2. stream batch-by-batch with access to per-batch stats/counters,
  3. read and write BLOW5 directly (slow5lib-equivalent read/write/aux
     surface, `io/blow5.py`).

Run from the repo root:  python examples/map_reads.py
(uses the reference quick-test data under /root/reference/test).
"""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_FASTA = "/root/reference/test/nCoV-2019.reference.fasta"
READS = "/root/reference/test/sp1_dna.blow5"


def one_shot() -> None:
    """Whole-file mapping through the production pipeline -> PAF text."""
    from sigfish_tpu.runtime.pipeline import Core, Options, run_dtw

    core = Core(REF_FASTA, READS, Options())  # defaults == `sigfish dtw`
    sink = io.StringIO()
    run_dtw(core, sink)
    core.close()
    for line in sink.getvalue().splitlines():
        cols = line.split("\t")
        print(f"{cols[0]}  ->  {cols[5]}:{cols[7]}-{cols[8]}  mapq={cols[11]}")


def streaming() -> None:
    """Batch-at-a-time control: filter/transform results as they land."""
    from sigfish_tpu.runtime.pipeline import Core, Options, process_batch

    opt = Options(batch_size=2)  # tiny batches for the demo
    core = Core(REF_FASTA, READS, opt)
    batch_no = 0
    while True:
        blobs = core.sf.read_batch(opt.batch_size, opt.batch_size_bytes)
        if not blobs:
            break
        outs, stats = process_batch(core, blobs)
        mapped = [o for o in outs if o]
        print(
            f"batch {batch_no}: {stats.n_rec} reads, {len(mapped)} mapped, "
            f"{stats.sum_bytes} record bytes"
        )
        batch_no += 1
    core.close()


def blow5_io() -> None:
    """Standalone BLOW5 reading/writing (no mapping involved)."""
    from sigfish_tpu.io.blow5 import Slow5File, Slow5Record, Slow5Writer

    with Slow5File(READS) as f:
        recs = list(f)
        print(
            f"{READS}: {len(recs)} reads, "
            f"sampling_rate={recs[0].sampling_rate}, "
            f"first read {recs[0].read_id} has {recs[0].len_raw_signal} samples"
        )
        print("header experiment_type =", f.header_get("experiment_type"))

    out = "/tmp/example_out.blow5"
    with Slow5File(READS) as f:
        hdr = f.header_data
        with Slow5Writer(out, header_data=hdr) as w:
            for r in recs:
                w.write_record(
                    Slow5Record(
                        read_id=r.read_id,
                        read_group=r.read_group,
                        digitisation=r.digitisation,
                        offset=r.offset,
                        range=r.range,
                        sampling_rate=r.sampling_rate,
                        raw_signal=r.raw_signal,
                    )
                )
    with Slow5File(out) as f:
        n = sum(1 for _ in f)
    print(f"wrote + re-read {n} records via {out}")
    os.unlink(out)


if __name__ == "__main__":
    blow5_io()
    one_shot()
    streaming()
