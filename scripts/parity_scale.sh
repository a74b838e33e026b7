#!/usr/bin/env bash
# At-scale differential parity vs the C reference (see parity_oracle.sh
# header for oracle setup): replicated workloads, byte-diffed.
set -u
# CPU platform for the differential runs: byte-compare work, and each
# fresh process on the axon backend pays a long first-touch stall
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
ORACLE=${ORACLE:-/tmp/refbuild/sigfish}
[ -x "$ORACLE" ] || bash "$(dirname "$0")/build_oracle.sh"
REF=${REF:-/root/reference/test}
DNA_TSV=${DNA_TSV:-/tmp/sigfish_models/r9.4_dna_6mer.tsv}
RNA_TSV=${RNA_TSV:-/tmp/sigfish_models/r9.4_rna_5mer.tsv}

python - <<'PYGEN'
from sigfish_tpu.io.blow5 import Slow5File, Slow5Writer, Slow5Record
for src_path, out_path, n in (
    ("/root/reference/test/sp1_dna.blow5", "/tmp/scale_dna.blow5", 600),
    ("/root/reference/test/sequin_rna.blow5", "/tmp/scale_rna.blow5", 64),
):
    src = Slow5File(src_path)
    recs = list(src); hdr = src.header_data; src.close()
    with Slow5Writer(out_path, header_data=hdr) as w:
        for i in range(n):
            for r in recs:
                w.write_record(Slow5Record(read_id=f"{r.read_id}_{i}",
                    read_group=r.read_group, digitisation=r.digitisation,
                    offset=r.offset, range=r.range,
                    sampling_rate=r.sampling_rate, raw_signal=r.raw_signal))
PYGEN

echo "== DNA 3000 reads =="
"$ORACLE" dtw "$REF/nCoV-2019.reference.fasta" /tmp/scale_dna.blow5 -t 8 \
    --kmer-model "$DNA_TSV" > /tmp/scale_dna.oracle 2>/dev/null
python -m sigfish_tpu.cli dtw "$REF/nCoV-2019.reference.fasta" /tmp/scale_dna.blow5 \
    --kmer-model "$DNA_TSV" > /tmp/scale_dna.ours 2>/dev/null
diff -q /tmp/scale_dna.oracle /tmp/scale_dna.ours && echo "PASS (byte-identical)"

echo "== RNA 512 reads =="
"$ORACLE" dtw "$REF/rnasequin_sequences_2.4.fa" /tmp/scale_rna.blow5 -t 8 \
    --rna -q 500 -p -1 --kmer-model "$RNA_TSV" > /tmp/scale_rna.oracle 2>/dev/null
python -m sigfish_tpu.cli dtw "$REF/rnasequin_sequences_2.4.fa" /tmp/scale_rna.blow5 \
    --rna -q 500 -p -1 --kmer-model "$RNA_TSV" > /tmp/scale_rna.ours 2>/dev/null
diff -q /tmp/scale_rna.oracle /tmp/scale_rna.ours && echo "PASS (byte-identical)"
