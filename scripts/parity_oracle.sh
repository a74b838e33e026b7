#!/usr/bin/env bash
# Differential parity: our pipeline vs the C reference binary, both using
# the same trained k-mer model (--kmer-model), across the option matrix.
#
# The reference cannot ship its builtin models (src/model.h is a stripped
# blob), but read_model() accepts nanopolish-style TSVs, so byte-level
# parity is checked end-to-end with OUR trained model on both sides.
#
# Setup is automatic: scripts/build_oracle.sh bootstraps /tmp/refbuild
# (stub model.h for the stripped blob) + /tmp/sigfish_models TSVs.
set -u
cd "$(dirname "$0")/.." 2>/dev/null || true
# bootstrap the oracle + model TSVs if absent (idempotent)
[ -x "${ORACLE:-/tmp/refbuild/sigfish}" ] || bash scripts/build_oracle.sh
# byte parity is engine-independent (all engines are bit-exact; the
# native CPU engine is the fastest oracle-comparable path) -- run our
# CLI on the CPU so no case pays device compile / axon first-touch cost.
# Clearing PALLAS_AXON_POOL_IPS keeps the axon TPU client from engaging
# at interpreter start: back-to-back processes otherwise serialize for
# minutes on the relay handshake.
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
ORACLE=${ORACLE:-/tmp/refbuild/sigfish}
REF=${REF:-/root/reference/test}
DNA_TSV=${DNA_TSV:-/tmp/sigfish_models/r9.4_dna_6mer.tsv}
RNA_TSV=${RNA_TSV:-/tmp/sigfish_models/r9.4_rna_5mer.tsv}
OUT=${OUT:-/tmp/parity}
mkdir -p "$OUT"
PASS=0; FAIL=0

run_case() {
  local name="$1"; shift
  local model="$1"; shift
  timeout 600 "$ORACLE" dtw "$@" --kmer-model "$model" -t 1 \
      > "$OUT/$name.oracle" 2>/dev/null
  timeout 600 python -m sigfish_tpu.cli dtw "$@" --kmer-model "$model" \
      > "$OUT/$name.ours" 2> "$OUT/$name.err"
  if diff -q "$OUT/$name.oracle" "$OUT/$name.ours" > /dev/null; then
    echo "PASS $name (byte-identical)"
    PASS=$((PASS+1))
  else
    local no=$(wc -l < "$OUT/$name.oracle")
    local nu=$(wc -l < "$OUT/$name.ours")
    local nd=$(diff "$OUT/$name.oracle" "$OUT/$name.ours" | grep -c '^<')
    echo "DIFF $name: $nd/$no lines differ (ours: $nu)"
    FAIL=$((FAIL+1))
  fi
}

DNA_ARGS="$REF/nCoV-2019.reference.fasta $REF/sp1_dna.blow5"
RNA_ARGS="$REF/rnasequin_sequences_2.4.fa $REF/sequin_rna.blow5"

run_case dna_default   "$DNA_TSV" $DNA_ARGS
run_case dna_from_end  "$DNA_TSV" $DNA_ARGS --from-end
run_case dna_q100      "$DNA_TSV" $DNA_ARGS -q 100
run_case dna_p30       "$DNA_TSV" $DNA_ARGS -p 30
run_case dna_sam       "$DNA_TSV" $DNA_ARGS --sam
run_case rna_default   "$RNA_TSV" $RNA_ARGS --rna -q 500 -p -1
run_case rna_fullref   "$RNA_TSV" $RNA_ARGS --rna -q 500 -p -1 --full-ref
run_case rna_from_end  "$RNA_TSV" $RNA_ARGS --rna -q 500 --from-end
run_case rna_dtw_std   "$RNA_TSV" $RNA_ARGS --rna -q 500 -p -1 --dtw-std
run_case rna_sam       "$RNA_TSV" $RNA_ARGS --rna -q 500 -p -1 --sam
run_case rna_invert    "$RNA_TSV" $RNA_ARGS --rna -q 500 --invert --full-ref -p 0
run_case dna_multibatch "$DNA_TSV" $DNA_ARGS -K 2
run_case dna_B_small    "$DNA_TSV" $DNA_ARGS -B 10K
run_case rna_q250_p100  "$RNA_TSV" $RNA_ARGS --rna -q 250 -p 100
run_case rna_fe_fr      "$RNA_TSV" $RNA_ARGS --rna -q 500 --from-end --full-ref
run_case dna_sam_q100   "$DNA_TSV" $DNA_ARGS --sam -q 100

# clipped reads (too_short, qlen < query-size host-fallback path)
python - <<'PYGEN'
import numpy as np
from sigfish_tpu.io.blow5 import Slow5File, Slow5Writer, Slow5Record
src = Slow5File("/root/reference/test/sp1_dna.blow5")
recs = list(src); hdr = src.header_data; src.close()
with Slow5Writer("/tmp/parity_mixed.blow5", header_data=hdr) as w:
    for r in recs:
        w.write_record(r)
        for cut in (2000, 1200, 800):
            w.write_record(Slow5Record(read_id=f"{r.read_id}_cut{cut}",
                read_group=r.read_group, digitisation=r.digitisation,
                offset=r.offset, range=r.range, sampling_rate=r.sampling_rate,
                raw_signal=r.raw_signal[:cut]))
PYGEN
run_case dna_clipped "$DNA_TSV" "$REF/nCoV-2019.reference.fasta" /tmp/parity_mixed.blow5

# multi-contig DNA (candidate order across contig fwd/rev tracks, with
# an intentionally duplicated revcomp'd region for strand ambiguity)
python - <<'PYGEN2'
from sigfish_tpu.io.fasta import read_fasta
name, seq = next(iter(read_fasta("/root/reference/test/nCoV-2019.reference.fasta")))
h = len(seq)//2
comp = {'A':'T','C':'G','G':'C','T':'A'}
with open("/tmp/parity_split.fa", "w") as f:
    f.write(f">half1\n{seq[:h+300]}\n>half2\n{seq[h-300:]}\n>halfrc\n")
    f.write("".join(comp.get(c,'T') for c in reversed(seq[5000:12000])) + "\n")
PYGEN2
run_case dna_multicontig "$DNA_TSV" /tmp/parity_split.fa /tmp/parity_mixed.blow5

# two read groups (header attr tables + per-record group indices)
python - <<'PYGEN3'
from sigfish_tpu.io.blow5 import Slow5File, Slow5Writer, Slow5Record
src = Slow5File("/root/reference/test/sp1_dna.blow5")
recs = list(src); hdr = src.header_data; src.close()
h2 = [dict(hdr[0]), dict(hdr[0])]
h2[1]["asic_id"] = "999999"
with Slow5Writer("/tmp/parity_2groups.blow5", header_data=h2) as w:
    for i, r in enumerate(recs):
        w.write_record(Slow5Record(read_id=r.read_id, read_group=i % 2,
            digitisation=r.digitisation, offset=r.offset, range=r.range,
            sampling_rate=r.sampling_rate, raw_signal=r.raw_signal))
PYGEN3
run_case dna_2groups "$DNA_TSV" "$REF/nCoV-2019.reference.fasta" /tmp/parity_2groups.blow5

# single-candidate reference (one 40-base RNA contig, q > track events -> one
# window -> d2=inf): exercises the (int)round(inf) -> uint8_t wrap that makes
# the reference print mapq 0 (sigfish.c:979-983 + sigfish.h:153)
python - <<'PYGEN5'
import random
random.seed(7)
with open("/tmp/parity_tiny.fa", "w") as f:
    f.write(">tiny\n" + "".join(random.choice("ACGT") for _ in range(40)) + "\n")
PYGEN5
run_case rna_d2inf "$RNA_TSV" /tmp/parity_tiny.fa "$REF/sequin_rna.blow5" --rna -q 50

# ring mode vs the oracle: a single --full-ref contig on a 1x4 virtual
# CPU mesh forces the column-split ring pipeline (tracks < n_tp); the
# wavefront engine (Pallas interpreter off-TPU) is bit-exact, so the
# ring path is held to ORACLE byte parity, not just sharding invariance
python - <<'PYGEN6'
from sigfish_tpu.io.fasta import read_fasta
recs = list(read_fasta("/root/reference/test/rnasequin_sequences_2.4.fa"))
name, seq = max(recs, key=lambda r: len(r[1]))
open("/tmp/parity_ring.fa", "w").write(f">{name}\n{seq}\n")
PYGEN6
RING_CASE_ARGS="/tmp/parity_ring.fa $REF/sequin_rna.blow5 --rna -q 250 -p -1 --full-ref --kmer-model $RNA_TSV"
timeout 900 "$ORACLE" dtw $RING_CASE_ARGS -t 1 > "$OUT/ring.oracle" 2>/dev/null
XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=4" \
  timeout 1800 python -m sigfish_tpu.cli dtw $RING_CASE_ARGS \
    --mesh 1x4 --engine pallas > "$OUT/ring.ours" 2> "$OUT/ring.err"
if diff -q "$OUT/ring.oracle" "$OUT/ring.ours" > /dev/null && [ -s "$OUT/ring.oracle" ]; then
  echo "PASS ring_1x4_wavefront (byte-identical)"; PASS=$((PASS+1))
else
  echo "DIFF ring_1x4_wavefront"; diff "$OUT/ring.oracle" "$OUT/ring.ours" | head -6
  FAIL=$((FAIL+1))
fi

# eval subtool output parity
"$ORACLE" eval "$REF/sp1_dna.minimap2.paf" "$OUT/dna_default.oracle" \
    > "$OUT/eval.oracle" 2>/dev/null
python -m sigfish_tpu.cli eval "$REF/sp1_dna.minimap2.paf" "$OUT/dna_default.oracle" \
    > "$OUT/eval.ours" 2>/dev/null
if diff -q "$OUT/eval.oracle" "$OUT/eval.ours" > /dev/null; then
  echo "PASS eval (byte-identical)"; PASS=$((PASS+1))
else
  echo "DIFF eval"; diff "$OUT/eval.oracle" "$OUT/eval.ours" | head -10
  FAIL=$((FAIL+1))
fi

# eval flag variants
for ev_flags in "--secondary no" "--tid-only"; do
  "$ORACLE" eval $ev_flags "$REF/sequin_rna.minimap2.paf" "$OUT/rna_default.oracle" \
      > "$OUT/eval_v.oracle" 2>/dev/null
  python -m sigfish_tpu.cli eval $ev_flags "$REF/sequin_rna.minimap2.paf" "$OUT/rna_default.oracle" \
      > "$OUT/eval_v.ours" 2>/dev/null
  if diff -q "$OUT/eval_v.oracle" "$OUT/eval_v.ours" > /dev/null; then
    echo "PASS eval $ev_flags"; PASS=$((PASS+1))
  else
    echo "DIFF eval $ev_flags"; diff "$OUT/eval_v.oracle" "$OUT/eval_v.ours" | head -6
    FAIL=$((FAIL+1))
  fi
done

echo "== $PASS pass, $FAIL diff =="
