#!/bin/bash
# Poll for a quiet box window, then re-measure the flagged micro-query
# tail at best-of-7. Prints each attempt's canary; exits after one
# successful quiet capture or after MAX_TRIES.
set -u
MAX_TRIES=${1:-8}
THRESH=${2:-0.200}
for i in $(seq 1 "$MAX_TRIES"); do
  OUT=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Bench q32_sliding_window q31_range_frame \
      b09_action_variants b10_action_variant_shred 7 2>/dev/null | tail -2)
  SUMMARY=$(echo "$OUT" | tail -1)
  CANARY=$(echo "$SUMMARY" | python3 -c "import json,sys; print(json.loads(sys.stdin.read())['canary_s'])")
  echo "try $i canary=$CANARY queries=$(echo "$OUT" | head -1)"
  OK=$(python3 -c "print(1 if $CANARY < $THRESH else 0)")
  if [ "$OK" = "1" ]; then
    echo "QUIET CAPTURE at canary=$CANARY"
    exit 0
  fi
  sleep 300
done
echo "no quiet window in $MAX_TRIES tries"
exit 1
