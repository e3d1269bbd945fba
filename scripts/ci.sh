#!/usr/bin/env bash
# CI entry (reference .travis.yml role, SURVEY.md §2.1 #20): build the native
# library (plus ASAN/UBSAN variant, SURVEY.md §5.2), run the test pyramid, and
# smoke-run the CLI end-to-end.
set -euo pipefail
HERE="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$HERE"

echo "== native build =="
make -C rapmap_tpu/native
make -C rapmap_tpu/native asan

echo "== native tests under ASAN =="
# run only the native-focused tests with the sanitized library preloaded;
# a sanitizer failure fails CI whenever the toolchain provides libasan
LIBASAN="$(gcc -print-file-name=libasan.so)"
if [ -e "$LIBASAN" ]; then
  TQM_NATIVE_ASAN=1 LD_PRELOAD="$LIBASAN" ASAN_OPTIONS=detect_leaks=0 \
    python -m pytest tests/test_native.py -q
else
  echo "libasan not found; skipping sanitizer run"
fi

echo "== test pyramid =="
# XLA:CPU segfaults a worker process nondeterministically once it has
# compiled ~140 programs (environment defect — see pytest.ini). A crashed
# worker marks its in-flight test failed even though it passes isolated, so
# a red first pass gets ONE serial --last-failed retry in a fresh process;
# CI is green iff the retry (or the first pass) is green.
if ! python -m pytest tests/ -q; then
  echo "== first pass red; retrying last-failed serially (worker-crash guard) =="
  python -m pytest tests/ -q --last-failed -p no:xdist
fi

echo "== CLI smoke =="
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
python - "$TMP" <<'EOF'
import sys, numpy as np
tmp = sys.argv[1]
rng = np.random.default_rng(0)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
with open(f"{tmp}/t.fa", "w") as f:
    for i in range(4):
        f.write(f">t{i}\n{bases[rng.integers(0,4,200)].tobytes().decode()}\n")
seq = open(f"{tmp}/t.fa").read().splitlines()[1]
with open(f"{tmp}/r.fq", "w") as f:
    f.write(f"@r0\n{seq[10:60]}\n+\n{'I'*50}\n")
EOF
export TQM_FORCE_CPU=1
export XLA_FLAGS="--xla_cpu_parallel_codegen_split_count=1 ${XLA_FLAGS:-}"
scripts/RunTqm.sh quasiindex -t "$TMP/t.fa" -i "$TMP/idx" -k 15
scripts/RunTqm.sh quasimap -i "$TMP/idx" -r "$TMP/r.fq" -o "$TMP/out.sam" --statsJson "$TMP/st.json"
grep -q "r0" "$TMP/out.sam"
python -c "import json,sys; st=json.load(open('$TMP/st.json')); assert st['reads_mapped']==1, st"
echo "CI OK"
