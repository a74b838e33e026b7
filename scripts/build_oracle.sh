#!/usr/bin/env bash
# Bootstrap the C reference oracle used by every differential-parity
# harness (parity_oracle.sh, parity_fuzz.py, parity_fuzz_eval.py,
# fuzz_distributed.py). Idempotent: skips work that is already done.
#
# The mounted reference strips src/model.h (the builtin pore tables), so
# the oracle is built with a stub declaring the four float arrays and is
# always driven with --kmer-model TSVs exported from this package
# (read_model() accepts nanopolish-style TSVs; %.9g round-trips f32
# exactly, so byte parity is end-to-end meaningful).
#
# Usage: bash scripts/build_oracle.sh [dest_dir]   (default /tmp/refbuild)
set -eu
cd "$(dirname "$0")/.."
DEST=${1:-/tmp/refbuild}

if [ ! -x "$DEST/sigfish" ]; then
    echo "[build_oracle] copying reference -> $DEST"
    rm -rf "$DEST"
    cp -r /root/reference "$DEST"
    printf '%s\n' \
        '#ifndef MODEL_H' '#define MODEL_H' \
        'static float r9_4_450bps_nucleotide_6mer_template_model_builtin_data[4096*2];' \
        'static float r9_4_70bps_u_to_t_rna_5mer_template_model_builtin_data[1024*2];' \
        'static float r10_4_400bps_nucleotide_9mer_template_model_builtin_data[262144*2];' \
        'static float rna004_130bps_u_to_t_rna_9mer_template_model_builtin_data[262144*2];' \
        '#endif' > "$DEST/src/model.h"
    make -C "$DEST" -j"$(nproc)"
    echo "[build_oracle] built $DEST/sigfish"
else
    echo "[build_oracle] oracle already at $DEST/sigfish"
fi

if [ ! -f /tmp/sigfish_models/rna004_rna_9mer.tsv ]; then
    echo "[build_oracle] exporting model TSVs"
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        python -m sigfish_tpu.models.export_tsv
else
    echo "[build_oracle] model TSVs already at /tmp/sigfish_models"
fi
