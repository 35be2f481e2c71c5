#!/bin/bash
# TSAN/ASAN CI over the native host tier (SURVEY §5: "the C++ host tier
# cache needs TSAN CI"; VERDICT r3 #9).
#
# Builds native/{host_kv,criteo_parser}.cc and native/processor_capi.cc
# with -fsanitize=thread / -fsanitize=address into sanitizer-specific cache
# dirs (DEEPREC_TPU_SANITIZE hook in data/native.py + serve/capi.py), then
# runs the concurrency-bearing tests against the instrumented .so with the
# sanitizer runtime preloaded into the python host.
#
# Scope note: the sanitizers also observe the (uninstrumented) jaxlib XLA
# runtime, which emits TSAN reports of its own; CLEANLINESS IS JUDGED ON
# REPORTS WHOSE STACKS TOUCH OUR LIBRARIES (libdeeprec_native.so /
# libdeeprec_processor.so).  Leg split, measured on this image:
#   * TSAN runs the full concurrency surface — host-KV writers/eraser/
#     compactor, the multi-threaded parser, SSD spill+compaction, the
#     tiered background-demotion lane, and the embedded-CPython C ABI.
#     TSAN coexists with jaxlib (reports third-party races, filtered).
#   * ASAN is restricted to the jax-free native tests: gcc-12's libasan
#     CHECK-fails in its __cxa_throw interceptor the moment jaxlib's
#     clang-built MLIR bindings throw (asan_interceptors.cpp:320
#     real___cxa_throw == 0) and aborts the process — an ASAN/jaxlib
#     toolchain mismatch, not a finding.  The native .so's memory behavior
#     is fully exercised by the host-KV stress + parser + spill tests.
# detect_leaks=0 under ASAN: CPython intentionally leaks at shutdown.
#
#   bash cibuild/sanitize.sh            # both sanitizers
#   bash cibuild/sanitize.sh thread     # one
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_PLATFORMS=cpu

# (test_tsv_reader_throughput is excluded: it asserts parse SPEED, which
# the sanitizers' 10-20x slowdown fails by construction; the parser's
# multi-threading is still exercised by test_native_parser_* + the reader)
NATIVE_TESTS="tests/test_hostkv_stress.py
       tests/test_data.py::test_native_parser_basic
       tests/test_data.py::test_native_parser_missing_fields
       tests/test_data.py::test_tsv_reader_batches
       tests/test_tiered.py::test_host_kv_ssd_spill_and_compact
       tests/test_tiered.py::test_host_kv_erase_reinsert_cycles_reclaim_tombstones"
TSAN_TESTS="$NATIVE_TESTS
       tests/test_processor_capi.py
       tests/test_tiered.py::test_two_phase_background_demotion
       tests/test_tiered.py::test_concurrent_demotion_read_barrier"
ASAN_TESTS="$NATIVE_TESTS"
FAIL=0
for san in ${1:-thread address}; do
  case $san in
    thread)  rt=$(g++ -print-file-name=libtsan.so); TESTS=$TSAN_TESTS ;;
    address) rt=$(g++ -print-file-name=libasan.so); TESTS=$ASAN_TESTS ;;
    *) echo "unknown sanitizer $san"; exit 2 ;;
  esac
  echo "== sanitizer: $san (runtime $rt) =="
  export DEEPREC_TPU_SANITIZE=$san
  export DEEPREC_TPU_CACHE=/tmp/deeprec_san_$san
  rm -rf "$DEEPREC_TPU_CACHE"
  export TSAN_OPTIONS="halt_on_error=0 log_path=/tmp/san_${san}_report exitcode=0"
  export ASAN_OPTIONS="detect_leaks=0 halt_on_error=0 log_path=/tmp/san_${san}_report exitcode=0"
  rm -f /tmp/san_${san}_report.*
  LD_PRELOAD="$rt" python -m pytest $TESTS -q -p no:cacheprovider \
      2>&1 | tail -3
  PYRC=${PIPESTATUS[0]}
  OURS=0
  if ls /tmp/san_${san}_report.* >/dev/null 2>&1; then
    OURS=$(grep -l "deeprec_native\|deeprec_processor\|host_kv\|criteo_parser\|processor_capi" \
           /tmp/san_${san}_report.* 2>/dev/null | wc -l)
    TOTAL=$(cat /tmp/san_${san}_report.* | grep -c "^SUMMARY")
    echo "-- $san: $TOTAL third-party-runtime reports in log (informational) --"
  fi
  if [ "$OURS" != 0 ]; then
    echo "-- $san: REPORTS TOUCH OUR NATIVE CODE: --"
    grep -h "SUMMARY\|deeprec\|host_kv\|criteo_parser\|processor_capi" \
        /tmp/san_${san}_report.* | head -40
    FAIL=1
  fi
  if [ "$PYRC" != 0 ]; then
    echo "-- $san: tests failed (rc=$PYRC) --"
    FAIL=1
  elif [ "$OURS" = 0 ]; then
    echo "-- $san: clean (no reports in our native code; tests green) --"
  fi
done
exit $FAIL
