#!/bin/bash
# Round-4 on-chip measurement round, run AFTER the ladder frees the TPU
# (ONE client at a time).  Outputs land under output/r4/.
set -u
cd /root/repo
mkdir -p output/r4
note() { echo "$(date -u '+%H:%M:%S') $*"; }

note "pyramid A/B"
python tools/bench_pyramid.py > output/r4/bench_pyramid.json 2> output/r4/bench_pyramid.err
note "component attribution"
python tools/bench_components.py > output/r4/bench_components.json 2> output/r4/bench_components.err
note "pallas on-chip parity"
python tools/verify_pallas.py > output/r4/verify_pallas.json 2> output/r4/verify_pallas.err
note "headline bench"
python bench.py > output/r4/bench.json 2> output/r4/bench.err
note "done"
tail -n1 output/r4/bench_pyramid.json output/r4/verify_pallas.json \
    output/r4/bench.json
