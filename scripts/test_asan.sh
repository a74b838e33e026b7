#!/usr/bin/env bash
# Sanitizer leg (the reference's `make asan=1` + valgrind CI equivalent,
# ref Makefile:29-32, test/test.sh:10-22): rebuild the native host
# kernels with -fsanitize=address,undefined and run every test file
# that exercises them.
#
# Scope note: jaxlib's own native code is incompatible with the ASan
# preload in this image (a bare `import jax; jnp.arange(4).sum()`
# aborts inside jaxlib before any sigfish code runs), so the leg runs
# the native-kernel test files, not the JAX-engine ones — that is the
# code ASan can meaningfully check here anyway: sigfish_native.cpp
# (decode/events/jnn/zscore/DP/backtrack) plus the BLOW5 parser fuzz
# tests that feed it hostile input.
#
# Exits nonzero on any test failure or sanitizer report. Restores the
# normal (non-ASan) native build afterwards.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
export SIGFISH_TPU_ASAN=1
export ASAN_OPTIONS=detect_leaks=0   # CPython itself leaks at exit
LIBASAN=$(g++ -print-file-name=libasan.so)

rm -f sigfish_tpu/native/_sigfish_native.so
LD_PRELOAD="$LIBASAN" python -m pytest \
    tests/test_native.py tests/test_events_jnn.py \
    tests/test_blow5.py tests/test_blow5_fuzz.py -q
rc=$?

# force a clean non-sanitized rebuild on next import
rm -f sigfish_tpu/native/_sigfish_native.so
if [ $rc -eq 0 ]; then echo "ASAN LEG PASS"; else echo "ASAN LEG FAIL"; fi
exit $rc
