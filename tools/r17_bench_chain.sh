#!/bin/bash
# r17 measurement chain — launch detached AFTER all code is committed
# (any compile mid-chain contaminates timings). Phases run sequentially;
# NOTHING else may run against this machine while the chain is live.
#
#   A: s22 skew A/B (sf1, sf10), streaming cooccur monitor (sf1),
#      PIT A/B (sf10)
#   B: s22 isolated sf100 probe (the r17 plan: distributed fit +
#      kmeans-of-centroids groups)
#   C: a36_resample_sink isolated sf100 probe (new no-exchange writer,
#      scratch rooted at GRAFT_SCRATCH_DIR)
#   D: PIT A/B at sf100; b46 isolated 3-trial sf100 stamp (task 5)
#   E: m06 isolated sf100 with the windowed WAV lifetime (task 4 probe)
#   F: full records — sf0.1 3-trial, sf1, sf10 (8g), sf100 (64g, m06 IN,
#      only the 3 formula/output exclusions remain)
set -u
cd /root/repo
LOG=tools/r17_chain.log
exec >> "$LOG" 2>&1
echo "=== r17 chain start $(date -u +%FT%TZ)"

run() { echo "--- RUN: $* @ $(date -u +%T)"; "$@" < /dev/null; echo "--- RC=$? @ $(date -u +%T)"; }

mkdir -p .scratch

# ---- A: quick measurements
run sbt -batch "runMain graft.tools.S22SkewProbe testdata_sf1"
run sbt -batch "runMain graft.tools.S22SkewProbe testdata_sf10"
run sbt -batch "runMain graft.tools.StreamingCooccurDemo testdata_sf1 8"
run sbt -batch "runMain graft.tools.PitAb testdata_sf10 3"

# ---- B: s22 isolated sf100 (r16 isolated baseline: 890.1 s dirty / 762.0 in-record)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  GRAFT_BENCH_SUBSET_RECORD=/tmp/r17_s22_sf100.json \
  run sbt -batch "runMain graft.Bench s22_semdedup_sampled 1"

# ---- C: a36 sink isolated sf100 (r16: 146.1 in-record / 165 isolated)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  GRAFT_SCRATCH_DIR=/root/repo/.scratch \
  GRAFT_BENCH_SUBSET_RECORD=/tmp/r17_a36sink_sf100.json \
  run sbt -batch "runMain graft.Bench a36_resample_sink 1"

# ---- D: PIT A/B sf100 + b46 isolated 3-trial stamp
SPARK_DRIVER_MEM=64g run sbt -batch "runMain graft.tools.PitAb testdata_sf100 2"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  GRAFT_BENCH_SUBSET_RECORD=/tmp/r17_b46_sf100.json \
  run sbt -batch "runMain graft.Bench b46_pagerank 3"

# ---- E: m06 isolated sf100 with windowed WAV (render untimed, deleted after)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  SPARK_GRAFT_BENCH_WAV_WINDOWED=1 \
  GRAFT_BENCH_SUBSET_RECORD=/tmp/r17_m06_sf100.json \
  run sbt -batch "runMain graft.Bench m06_audio_dedup 1"
df -h / | tail -1

# ---- F: full records (final binary)
run sbt -batch "runMain graft.Bench '' 3"
SPARK_GRAFT_SF_DIR=testdata_sf1 GRAFT_SCRATCH_DIR=/root/repo/.scratch \
  run sbt -batch "runMain graft.Bench '' 1"
SPARK_GRAFT_SF_DIR=testdata_sf10 GRAFT_SCRATCH_DIR=/root/repo/.scratch \
  run sbt -batch "runMain graft.Bench '' 1"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  SPARK_GRAFT_BENCH_WAV_WINDOWED=1 GRAFT_SCRATCH_DIR=/root/repo/.scratch \
  SPARK_GRAFT_BENCH_EXCLUDE=a36_resample,s21_semdedup,d14_sparse_sim_frac \
  run sbt -batch "runMain graft.Bench '' 1"
df -h / | tail -1
echo "=== r17 chain done $(date -u +%FT%TZ)"
