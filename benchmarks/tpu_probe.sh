#!/bin/bash
# Probe the axon TPU tunnel; append one status line to /tmp/tpu_probe.log
ts=$(date +%H:%M:%S)
out=$(timeout 600 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.arange(8.0))))" 2>&1 | tail -1)
echo "$ts $out" >> /tmp/tpu_probe.log
