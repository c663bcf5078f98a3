#!/bin/bash
# Round-20 measurement chain (run AFTER gates + commit; sequential for
# clean numbers). Artifacts land in bench_out/.
set -x
cd /root/repo

# 1. bench at sf0.1 (BENCH_r20 + epoch adjudication vs r19)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r20.log 2>&1
echo "BENCH_EXIT=$?"

# 2. admission stage split (Task 5): factors 1/10/30/100 on sf0.1
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.bench.AdmitProbe 1 10 30 100" > /tmp/admitprobe.log 2>&1
echo "ADMIT_EXIT=$?"

# 3. 300x default sweep (Dedup-materialization-change gate + pair-miner baselines)
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_SCALE_QUERIES=dedup_minhash,jaccard_join_pairs,winnow_pairs,dedup_clusters \
  SPARK_GRAFT_SCALE_SECTIONS=none \
  SPARK_GRAFT_SCALE_OUT=/root/repo/bench_out/scale300_r20.json \
  sbt -batch "runMain graft.bench.ScaleBench 300" > /tmp/scale300_r20.log 2>&1
echo "S300_EXIT=$?"

# 4. 300x durable sweep (Task 4: pair-miner durable premium)
rm -rf /tmp/graft_ckpt300 && mkdir -p /tmp/graft_ckpt300
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CHECKPOINT_DIR=/tmp/graft_ckpt300 \
  SPARK_GRAFT_SCALE_QUERIES=dedup_minhash,jaccard_join_pairs,winnow_pairs,dedup_clusters \
  SPARK_GRAFT_SCALE_SECTIONS=none \
  SPARK_GRAFT_SCALE_OUT=/root/repo/bench_out/scale300_durable_r20.json \
  sbt -batch "runMain graft.bench.ScaleBench 300" > /tmp/scale300_durable_r20.log 2>&1
echo "S300D_EXIT=$?"
du -sh /tmp/graft_ckpt300 2>/dev/null; ls /tmp/graft_ckpt300 | head -20

# 5. standard sweeps at HEAD (both sources)
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  SPARK_GRAFT_SCALE_OUT=/root/repo/bench_out/scale.json \
  sbt -batch "runMain graft.bench.ScaleBench 1 10 30 100" > /tmp/scale_std.log 2>&1
echo "STD_EXIT=$?"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_SCALE_OUT=/root/repo/bench_out/scale100.json \
  sbt -batch "runMain graft.bench.ScaleBench 1 10 30 100" > /tmp/scale100_std.log 2>&1
echo "STD100_EXIT=$?"
echo ALL_DONE
