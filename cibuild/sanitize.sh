#!/bin/bash
# TSAN/ASAN CI over the native host tier (SURVEY §5: "the C++ host tier
# cache needs TSAN CI"; VERDICT r3 #9).
#
# Builds native/{host_kv,criteo_parser}.cc and native/processor_capi.cc
# with -fsanitize=thread / -fsanitize=address into sanitizer-specific cache
# dirs (DEEPREC_TPU_SANITIZE hook in data/native.py + serve/capi.py), then
# runs the concurrency-heavy test files against the instrumented .so with
# the sanitizer runtime preloaded into the python host.
#
#   bash cibuild/sanitize.sh            # both sanitizers
#   bash cibuild/sanitize.sh thread     # one
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_PLATFORMS=cpu

# the concurrency-bearing surfaces: host-KV stress (writers+eraser+
# compactor), the tiered background-demotion lane, the embedded-CPython
# C ABI, and the multithreaded parser.  (TSAN costs ~10-20x wall — the
# full test files would take hours; these are the files exercising every
# native thread.)
TESTS="tests/test_hostkv_stress.py
       tests/test_processor_capi.py
       tests/test_tiered.py::test_host_kv_ssd_spill_and_compact
       tests/test_tiered.py::test_two_phase_background_demotion
       tests/test_tiered.py::test_concurrent_demotion_read_barrier
       tests/test_data.py::test_native_parser_basic
       tests/test_data.py::test_native_parser_missing_fields
       tests/test_data.py::test_tsv_reader_throughput"
FAIL=0
for san in ${1:-thread address}; do
  rt=$(g++ -print-file-name=lib${san/thread/tsan}.so)
  rt=${rt/libaddress.so/$(g++ -print-file-name=libasan.so)}
  echo "== sanitizer: $san (runtime $rt) =="
  export DEEPREC_TPU_SANITIZE=$san
  export DEEPREC_TPU_CACHE=/tmp/deeprec_san_$san
  rm -rf "$DEEPREC_TPU_CACHE"
  # halt_on_error=0: collect every report; log_path so reports survive
  # python's own exit path.  detect_leaks=0 under ASAN (the CPython host
  # intentionally leaks at shutdown — not our code).
  export TSAN_OPTIONS="halt_on_error=0 log_path=/tmp/san_${san}_report exitcode=66"
  export ASAN_OPTIONS="detect_leaks=0 halt_on_error=0 log_path=/tmp/san_${san}_report exitcode=66"
  rm -f /tmp/san_${san}_report.*
  LD_PRELOAD="$rt" python -m pytest $TESTS -q -p no:cacheprovider \
      2>&1 | tail -4
  PYRC=${PIPESTATUS[0]}
  if ls /tmp/san_${san}_report.* >/dev/null 2>&1; then
    echo "-- $san reports: --"
    grep -h "SUMMARY" /tmp/san_${san}_report.* | sort | uniq -c
    FAIL=1
  elif [ "$PYRC" != 0 ]; then
    echo "-- $san: tests failed (rc=$PYRC) --"
    FAIL=1
  else
    echo "-- $san: clean --"
  fi
done
exit $FAIL
