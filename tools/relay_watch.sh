#!/bin/bash
# Probe the axon TPU relay until it answers, then touch a marker and exit.
# The r3 session launches this in the background; when it exits, the chip
# queue (tools/r2_chip_queue.sh) should be started.
set -u
MARKER=${1:-/tmp/relay_up.marker}
rm -f "$MARKER"
i=0
while true; do
  i=$((i + 1))
  if timeout 60 python3 -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d; print(d)" \
      > /tmp/relay_probe.log 2>&1; then
    echo "relay up after $i probes: $(cat /tmp/relay_probe.log)"
    touch "$MARKER"
    exit 0
  fi
  sleep 120
done
