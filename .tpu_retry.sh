#!/bin/bash
# Run a python script on the TPU with hang-retry: attempt with timeout,
# retry after cooldown on failure to produce output.
SCRIPT="$1"; shift
for attempt in 1 2 3; do
  timeout 900 python "$SCRIPT" "$@" 2>&1 | grep --line-buffered -v WARNING
  rc=${PIPESTATUS[0]}
  if [ "$rc" = "0" ]; then exit 0; fi
  echo "# attempt $attempt rc=$rc; cooldown..."
  sleep 90
done
exit 1
