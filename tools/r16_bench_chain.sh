#!/bin/bash
# r16 bench chain: sequential timed runs on the r16 binary (dfb2544).
# Bench discipline: nothing else runs while this chain is live.
cd /root/repo
set -x
SF100_EXCL=a36_resample,s21_semdedup,d14_sparse_sim_frac,m06_audio_dedup

# 1. canonical sf0.1 full-registry 3-trial record
sbt -batch "runMain graft.Bench '' 3" > /tmp/r16_bench_sf01.log 2>&1
echo "PHASE1 rc=$?" >> /tmp/r16_chain.log

# 2. sf1 full registry, 1 trial
SPARK_GRAFT_SF_DIR=testdata_sf1 sbt -batch "runMain graft.Bench" \
  > /tmp/r16_bench_sf1.log 2>&1
echo "PHASE2 rc=$?" >> /tmp/r16_chain.log

# 3. sf10 full registry at the 8g DEFAULT (envelope proof)
SPARK_GRAFT_SF_DIR=testdata_sf10 sbt -batch "runMain graft.Bench" \
  > /tmp/r16_bench_sf10.log 2>&1
echo "PHASE3 rc=$?" >> /tmp/r16_chain.log

# 4. sf100 probe of the two NEW keys before they enter the record
#    (disk-risk check for the a36 sink; first s22 fourth-decade number)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  GRAFT_BENCH_SUBSET_RECORD=/tmp/r16_probe_new_sf100.json \
  sbt -batch "runMain graft.Bench a36_resample_sink,s22_semdedup_sampled" \
  > /tmp/r16_probe_new_sf100.log 2>&1
echo "PHASE4 rc=$?" >> /tmp/r16_chain.log
df -h / | tail -1 >> /tmp/r16_chain.log

# 5. isolated 3-trial stamps: the three 10-12x in-record keys + s22
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  GRAFT_BENCH_SUBSET_RECORD=/tmp/r16_stamp3_sf100.json \
  sbt -batch "runMain graft.Bench b30_salted_join,d04_simhash,t16_unigram_score,s22_semdedup_sampled 3" \
  > /tmp/r16_stamp3_sf100.log 2>&1
echo "PHASE5 rc=$?" >> /tmp/r16_chain.log

# 6. b55 isolated 3-trial re-stamp (code changed: DISK_ONLY checkpoint)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  GRAFT_BENCH_SUBSET_RECORD=/tmp/r16_b55_sf100.json \
  sbt -batch "runMain graft.Bench b55_cooccur 3" \
  > /tmp/r16_b55_sf100.log 2>&1
echo "PHASE6 rc=$?" >> /tmp/r16_chain.log

# 7. sf100 full-registry record (4 analyzed exclusions, as r15)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=testdata_sf100 \
  SPARK_GRAFT_BENCH_EXCLUDE=$SF100_EXCL \
  sbt -batch "runMain graft.Bench" > /tmp/r16_bench_sf100.log 2>&1
echo "PHASE7 rc=$?" >> /tmp/r16_chain.log
df -h / | tail -1 >> /tmp/r16_chain.log

# 8. CurationPipeline + PackingPipeline at sf100 (task 4)
SPARK_DRIVER_MEM=64g sbt -batch "runMain graft.tools.PipelineBench testdata_sf100" \
  > /tmp/r16_pipeline_sf100.log 2>&1
echo "PHASE8 rc=$?" >> /tmp/r16_chain.log

# 9. streaming IVF-PQ demo at sf10 (task 6)
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.tools.StreamingIvfPqDemo testdata_sf10 8 /tmp/ivfpq_stream_sf10" \
  > /tmp/r16_ivfpq_sf10.log 2>&1
echo "PHASE9 rc=$?" >> /tmp/r16_chain.log
echo "CHAIN COMPLETE" >> /tmp/r16_chain.log
