#!/usr/bin/env bash
# ASan/UBSan run over the five native C++ modules (WAL engine, BM25,
# epoll HTTP front, batch image decode/resize, text tokenize/minhash)
# — the race/memory-safety check the reference gets
# from Rust itself (SURVEY §5). Builds sanitized .san.so artifacts
# beside the production ones and drives them through a jax-free driver
# (XLA's runtime is not sanitizer-clean and would drown our reports).
#
#   scripts/sanitize.sh            # address,undefined (default)
#   scripts/sanitize.sh address    # ASan only
#   scripts/sanitize.sh thread     # TSAN: concurrent WAL group-commit,
#                                  # lock-disciplined BM25, epoll front
set -euo pipefail
cd "$(dirname "$0")/.."

SAN="${1:-address,undefined}"
case "$SAN" in
  *thread*) PRELOAD="$(g++ -print-file-name=libtsan.so)" ;;
  *address*) PRELOAD="$(g++ -print-file-name=libasan.so)" ;;
  *) PRELOAD="$(g++ -print-file-name=libubsan.so)" ;;
esac

# leak checking off: the host process is CPython, whose arenas and
# interned objects report as leaks; we are after the C++ modules' bugs
export ASAN_OPTIONS="detect_leaks=0:halt_on_error=1"
export UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1"
export TSAN_OPTIONS="halt_on_error=1:second_deadlock_stack=1"
export UCFP_NATIVE_SANITIZE="$SAN"

LD_PRELOAD="$PRELOAD" python scripts/native_sanitize_driver.py
echo "sanitized native run clean ($SAN)"
