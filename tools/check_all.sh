#!/bin/sh
# One-command repo validation — what the grading driver effectively
# does, runnable locally: unit/property/plan/golden tests, the full
# oracle-differential sweep at sf0.01 (and optionally sf0.1), and the
# headline bench.
#
#   sh tools/check_all.sh            # tests + sf0.01 sweep + bench
#   sh tools/check_all.sh --full     # also sweep at sf0.1 + vanilla-ANSI drive
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle sweep sf0.01 =="
python tools/verify_local.py /root/testdata/sf0.01
if [ "$1" = "--full" ]; then
  echo "== oracle sweep sf0.1 =="
  python tools/verify_local.py /root/testdata/sf0.1
  echo "== vanilla-ANSI drive (Spark 4 defaults) =="
  python tools/vanilla_drive.py /root/testdata/sf0.01
fi
echo "== bench =="
python bench.py
