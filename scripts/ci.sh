#!/usr/bin/env bash
# Full local validation: native build, test suite, driver contract.
set -euo pipefail
cd "$(dirname "$0")/.."
make -C csrc
python -m pytest tests/ -q
python __graft_entry__.py
echo "CI OK"
