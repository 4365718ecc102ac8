#!/bin/bash
# Round-5 measurement battery — run serially (never two Spark jobs at
# once on this host). Each step appends to its own log under /tmp/r5.
set -u
mkdir -p /tmp/r5
cd /root/repo

echo "=== ann sweep start $(date +%T)" >> /tmp/r5/status
python tools/ann_planes_sweep.py 100000 64 16 > /tmp/r5/ann_sweep.json 2> /tmp/r5/ann_sweep.err
echo "=== ann sweep done rc=$? $(date +%T)" >> /tmp/r5/status

echo "=== amdahl probe start $(date +%T)" >> /tmp/r5/status
python tools/amdahl_probe.py > /tmp/r5/amdahl.json 2> /tmp/r5/amdahl.err
echo "=== amdahl probe done rc=$? $(date +%T)" >> /tmp/r5/status
