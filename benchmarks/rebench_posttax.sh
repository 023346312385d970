#!/bin/bash
# Post-tax official-bench re-runs (2026-08-20).
#
# Every published bench row before 2026-08-19 was measured with the
# full-stack readback inside the timed region — a pure relay-D2H harness
# tax of 0.68 ms/push at 4,096 streams growing to ~3.6 ms at 24,576
# (benchmarks/exp_readback_tax.py).  bench.py now forces the scan with a
# 32-byte dependent slice; this script re-measures every row that
# BASELINE.md / README.md / CLAUDE.md publishes, one fresh process per
# point (official-bench methodology), sequentially (one chip job at a
# time — relay protocol).
set -u
cd "$(dirname "$0")/.."
run() { echo "### $*" >&2; env "$@" python bench.py 2>/dev/null; }

run BENCH_STREAMS=4096                                  # headline scattered
run BENCH_STREAMS=8192
run BENCH_STREAMS=10240                                 # scattered + sort
run BENCH_STREAMS=10240 BENCH_UNIFORM_PALETTE=1
run BENCH_STREAMS=10240 BENCH_PALETTE_LAYOUT=default    # blockwise single-palette
run BENCH_STREAMS=10240 BENCH_PALETTE_LAYOUT=clustered
run BENCH_STREAMS=16384                                 # global sort + blocking
run BENCH_STREAMS=20480
run BENCH_STREAMS=4096 BENCH_CHUNK_HOPS=8               # k=8 display mode
run BENCH_STREAMS=4096 BENCH_UNIFORM_PALETTE=1          # bench-geometry uniform
