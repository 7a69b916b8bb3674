#!/bin/bash
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache
while [ ! -f /tmp/r5_queue4.done ]; do sleep 30; done
TPUJPEG_TEST_TPU=1 python -m pytest \
  "tests/test_fsm_spec.py::test_spec_sync_slots_compiled_on_chip" \
  "tests/test_materialize.py::test_slots_compiled_on_chip" \
  -q > /tmp/r5_chip_suite.log 2>&1
echo rc=$? >> /tmp/r5_chip_suite.log
echo DONE > /tmp/r5_queue5.done
