#!/usr/bin/env bash
# CI gate (reference parity: /root/reference/.travis.yml runs cargo+go tests).
#
#   scripts/ci.sh fast   — host-side integer machinery + codecs (< ~2 min,
#                          no jit-heavy EC pipelines); every-commit tier.
#   scripts/ci.sh full   — the whole suite on the CPU backend with the 8-device
#                          virtual mesh (compile-heavy; nightly tier).
set -euo pipefail
cd "$(dirname "$0")/.."
tier="${1:-fast}"

case "$tier" in
  fast)
    # test_e2e_fast is the end-to-end engine gate (three-way MSM agreement
    # vs the oracle): an engine regression cannot pass this tier. It is
    # compile-heavy only on a COLD .jax_cache (~6 min once); warm runs are
    # seconds — CI seeds the cache by running the full tier nightly.
    exec python -m pytest -q -x \
      tests/test_recode.py tests/test_native.py tests/test_exports.py tests/test_api_surface.py \
      tests/test_serialize.py tests/test_fields.py \
      tests/test_e2e_fast.py \
      "tests/test_golden.py::test_oracle_matches_blst_binary"
    ;;
  full)
    # xdist -n 2: the suite is compile-bound and single-threaded per test;
    # two workers keep both host cores compiling (cache-warm runs unaffected)
    exec python -m pytest -q -n 2 tests/
    ;;
  *)
    echo "usage: scripts/ci.sh [fast|full]" >&2; exit 2
    ;;
esac
