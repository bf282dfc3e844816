#!/bin/bash
# Poll the axon TPU backend; write status when it comes back.
for i in $(seq 1 200); do
  if timeout 240 python -c "import jax; d=jax.devices(); assert d[0].platform!='cpu', d; print('TPU UP:', d)" > /tmp/tpu_status.txt 2>&1; then
    echo "TPU AVAILABLE at $(date)" >> /tmp/tpu_status.txt
    exit 0
  fi
  sleep 120
done
exit 1
