#!/usr/bin/env bash
# One-command acceptance gate (the reference's `make test` equivalent,
# ref /root/reference/test/test.sh + .github/workflows/c-cpp.yml):
#
#   scripts/test_all.sh            # unit+e2e suite, accuracy gates
#   scripts/test_all.sh full       # + oracle byte-parity matrix + bench
#
# Nonzero exit on any regression. Stages:
#   1. pytest tests/ (unit, golden, e2e, parallel, distributed)
#   2. accuracy gates via the eval subtool on both in-repo datasets
#      (DNA mapped>=100% correct>=85%; RNA mapped>=100% correct>=75%,
#       thresholds from test/test.sh:54-55,66-67)
#   3. [full] scripts/parity_oracle.sh -- 23-case byte-diff vs the C
#      binary (requires the /tmp/refbuild oracle, see that script)
#      + scripts/parity_fuzz.py, 10 fixed-seed randomized differentials
#   4. [full] bench.py JSON (real device)
set -u
cd "$(dirname "$0")/.."
FAIL=0
note() { printf '\n== %s ==\n' "$*"; }

note "stage 1: pytest"
python -m pytest tests/ -x -q || FAIL=1

note "stage 2: accuracy gates"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
export JAX_PLATFORMS=cpu
_SAVED_AXON="${PALLAS_AXON_POOL_IPS:-}"
export PALLAS_AXON_POOL_IPS=   # no axon client for CPU-only gate runs
python -m sigfish_tpu.cli dtw /root/reference/test/nCoV-2019.reference.fasta \
    /root/reference/test/sp1_dna.blow5 > "$TMP/dna.paf" 2>/dev/null || FAIL=1
python -m sigfish_tpu.cli dtw /root/reference/test/rnasequin_sequences_2.4.fa \
    /root/reference/test/sequin_rna.blow5 --rna -q 500 -p -1 \
    > "$TMP/rna.paf" 2>/dev/null || FAIL=1

check_gate() { # name truth test mapped_min correct_min
  local name=$1 truth=$2 test=$3 mmin=$4 cmin=$5
  python -m sigfish_tpu.cli eval "$truth" "$test" 2>/dev/null > "$TMP/ev.txt"
  local mapped correct
  mapped=$(awk -F'[(%]' '/^mapped_testset/{print $2}' "$TMP/ev.txt")
  correct=$(awk -F'[(%]' '/^correct/{print $2}' "$TMP/ev.txt")
  if awk -v m="$mapped" -v c="$correct" -v mm="$mmin" -v cm="$cmin" \
       'BEGIN{exit !(m>=mm && c>=cm)}'; then
    echo "PASS $name (mapped $mapped% >= $mmin%, correct $correct% >= $cmin%)"
  else
    echo "FAIL $name (mapped $mapped% need >=$mmin%, correct $correct% need >=$cmin%)"
    FAIL=1
  fi
}
check_gate dna /root/reference/test/sp1_dna.minimap2.paf "$TMP/dna.paf" 100.0 85.0
check_gate rna /root/reference/test/sequin_rna.minimap2.paf "$TMP/rna.paf" 100.0 75.0

if [ "${1:-}" = "full" ]; then
  note "stage 3: oracle byte-parity matrix"
  bash scripts/build_oracle.sh || echo "WARN: oracle bootstrap failed"
  if [ -x /tmp/refbuild/sigfish ]; then
    bash scripts/parity_oracle.sh | tee "$TMP/parity.txt"
    grep -q "0 diff" "$TMP/parity.txt" || FAIL=1
  else
    echo "SKIP: /tmp/refbuild/sigfish oracle not built (see parity_oracle.sh header)"
  fi

  note "stage 3b: randomized differential fuzz (fixed seeds)"
  if [ -x /tmp/refbuild/sigfish ]; then
    python scripts/parity_fuzz.py 10 2000 || FAIL=1
    python scripts/parity_fuzz_eval.py 10 6000 || FAIL=1
    # 9-mer chemistry legs (R10 / RNA004 via header auto-detection)
    [ -f /tmp/sigfish_models/rna004_rna_9mer.tsv ] || \
        python -m sigfish_tpu.models.export_tsv
    SIGFISH_FUZZ_PORE=r10 SIGFISH_FUZZ_MAPPABLE=1 \
        python scripts/parity_fuzz.py 3 60000 || FAIL=1
    SIGFISH_FUZZ_PORE=rna004 SIGFISH_FUZZ_MAPPABLE=1 \
        python scripts/parity_fuzz.py 3 61000 || FAIL=1
  else
    echo "SKIP: oracle not built"
  fi

  note "stage 3c: ring-mode sharding invariance (1-contig --full-ref, 1x4 mesh)"
  python - <<'PYRING'
from sigfish_tpu.io.fasta import read_fasta
recs = list(read_fasta("/root/reference/test/rnasequin_sequences_2.4.fa"))
name, seq = max(recs, key=lambda r: len(r[1]))
open("/tmp/ring_one.fa", "w").write(f">{name}\n{seq}\n")
PYRING
  for RING_ENGINE in scan pallas; do
    RING_ARGS="/tmp/ring_one.fa /root/reference/test/sequin_rna.blow5 --rna -q 500 -p -1 --full-ref --engine $RING_ENGINE"
    XLA_FLAGS="--xla_force_host_platform_device_count=4" \
      timeout 2400 python -m sigfish_tpu.cli dtw $RING_ARGS > "$TMP/ring_s.paf" 2>/dev/null || FAIL=1
    XLA_FLAGS="--xla_force_host_platform_device_count=4" \
      timeout 2400 python -m sigfish_tpu.cli dtw $RING_ARGS --mesh 1x4 > "$TMP/ring_m.paf" 2>/dev/null || FAIL=1
    if cmp -s "$TMP/ring_s.paf" "$TMP/ring_m.paf" && [ -s "$TMP/ring_s.paf" ]; then
      echo "PASS ring invariance/$RING_ENGINE (byte-identical, $(wc -l < "$TMP/ring_s.paf") lines)"
    else
      echo "FAIL ring invariance/$RING_ENGINE"; FAIL=1
    fi
  done

  note "stage 4: bench"
  unset JAX_PLATFORMS
  export PALLAS_AXON_POOL_IPS="$_SAVED_AXON"  # bench needs the device
  python bench.py || FAIL=1
fi

note "result"
if [ "$FAIL" = 0 ]; then echo "ALL GATES PASS"; else echo "GATE FAILURES"; fi
exit $FAIL
