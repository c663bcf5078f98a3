#!/bin/bash
# Round-21 measurement chain (run AFTER gates + commit; sequential for
# clean numbers). Artifacts land in bench_out/. Mirrors tools/r20_measure.sh
# so sweep values stay comparable round over round.
set -x
cd /root/repo

# 1. final bench at sf0.1 (the round's after-measurement; cpu_queries now
#    rides the artifact for load-vs-code adjudication)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench_out/r21_final.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r21.log 2>&1
echo "BENCH_EXIT=$?"

# 2. 300x default sweep (the Dedup-change gate: this round fused the
#    jaccard verify + gram kernels the miners run per candidate)
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_SCALE_QUERIES=dedup_minhash,jaccard_join_pairs,winnow_pairs,dedup_clusters \
  SPARK_GRAFT_SCALE_SECTIONS=none \
  SPARK_GRAFT_SCALE_OUT=/root/repo/bench_out/scale300_r21.json \
  sbt -batch "runMain graft.bench.ScaleBench 300" > /tmp/scale300_r21.log 2>&1
echo "S300_EXIT=$?"

# 3. standard sweeps at HEAD (both sources, same invocations as r20)
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_SCALE_OUT=/root/repo/bench_out/scale.json \
  sbt -batch "runMain graft.bench.ScaleBench 1 10 30 100" > /tmp/scale_std_r21.log 2>&1
echo "STD_EXIT=$?"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_SCALE_OUT=/root/repo/bench_out/scale100.json \
  sbt -batch "runMain graft.bench.ScaleBench 1 10 30 100" > /tmp/scale100_std_r21.log 2>&1
echo "STD100_EXIT=$?"
echo ALL_DONE
