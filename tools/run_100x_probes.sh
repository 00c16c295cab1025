#!/bin/bash
# One fresh process per query (same-JVM probes contaminate via leftover
# localCheckpoint blocks). Sequential on purpose: probes are timing runs.
cd /root/repo
for q in "$@"; do
  timeout 1200 env CDA_PROBE_FACTOR=100 python tools/probe10x.py "$q" 2>/dev/null
done
