#!/usr/bin/env bash
# CI recipe: collect-only sanity, then the quick test tier on a virtual
# 8-device CPU mesh (pytest.ini tiers; full suite = drop -m).
#   ./scripts/ci.sh            quick tier (< ~5 min)
#   ./scripts/ci.sh --full     full suite (~30 min)
set -euo pipefail
cd "$(dirname "$0")/.."

MARK='-m "not slow"'
if [[ "${1:-}" == "--full" ]]; then MARK=""; fi

echo "== collect =="
python -m pytest tests/ --collect-only -q | tail -1

echo "== tests =="
eval python -m pytest tests/ -q -x "$MARK"

echo "== package import =="
python -c "import simplellminference_tpu as s; print('import OK', s.__name__)"
echo "CI OK"
