#!/bin/sh
# Build the unmodified reference blst + the golden-vector harness.
# (libblst.a / *.o are build artifacts, gitignored; the committed output is
# tests/fixtures/golden_msm.json produced by make_fixtures.py.)
set -e
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
cc -O2 -D__ADX__ -I"$REF"/bindings -I"$REF"/src -c "$REF"/src/server.c -o server.o
cc -D__ADX__ -c "$REF"/build/assembly.S -o assembly.o
ar rcs libblst.a server.o assembly.o
cc -O2 -I"$REF"/bindings gen_golden.c libblst.a -o gen_golden
echo built: ./gen_golden
