#!/bin/bash
for i in $(seq 1 40); do
  date +%H:%M:%S >> .tpu_watch.log
  timeout 90 python -c "
import jax, jax.numpy as jnp
print('TPU-OK', float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))
" >> .tpu_watch.log 2>&1
  if grep -q TPU-OK .tpu_watch.log; then echo RECOVERED >> .tpu_watch.log; exit 0; fi
  sleep 120
done
exit 1
