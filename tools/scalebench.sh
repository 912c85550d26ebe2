#!/usr/bin/env bash
# One-command cross-scale bench (round-12 judge task 7): runs
# graft.CrossScaleBench with the settings the round-12 campaign proved
# necessary ABOVE sf0.1, so BENCH-style runs at 10x data measure the
# operators instead of the garbage collector:
#   - SPARK_DRIVER_MEM=48g  : the 8 g default heap thrashes GC once the
#     replicated corpus' shuffle blocks + cached fixtures exceed ~6 g
#     (BASELINE.md round-12: same queries 3-5x slower at 8 g, flat at 48 g)
#   - GRAFT_SCALE_REPS=3    : min-of-3 passes per query — this box is
#     co-tenant-noisy (disjoint outlier sets across same-HEAD runs); the
#     least-displaced pass measures the operator
# Artifact: bench_scale<k>x_<sf>.json in the repo root (committed per round).
#
# Usage: tools/scalebench.sh [k] [query...]        (defaults: k=10, the
#        15-query DefaultQueries list; SPARK_GRAFT_SF_DIR for the base SF)
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"
export GRAFT_SCALE_REPS="${GRAFT_SCALE_REPS:-3}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
exec sbt -batch "runMain graft.CrossScaleBench $*"
