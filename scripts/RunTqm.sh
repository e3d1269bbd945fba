#!/usr/bin/env bash
# Convenience wrapper (reference scripts/RunRapMap.sh role, SURVEY.md §2.1 #19):
# locates the repo and forwards arguments to the tqm CLI, so downstream tools
# can embed the mapper without knowing the python layout.
set -euo pipefail
HERE="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${HERE}${PYTHONPATH:+:$PYTHONPATH}"
exec python -m rapmap_tpu.cli "$@"
