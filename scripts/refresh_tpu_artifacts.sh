#!/usr/bin/env bash
# Re-run every TPU-stage artifact in order (speed sweep, e2e queries,
# headline bench, hardware validation). Use after kernel/bench changes:
#   PYTHONPATH=/root/.axon_site bash scripts/refresh_tpu_artifacts.sh
set -e
cd "$(dirname "$0")/.."
python scripts/bench_speed.py
python scripts/bench_e2e.py
python bench.py
python scripts/validate_tpu.py
echo "ALL TPU ARTIFACTS REFRESHED"
