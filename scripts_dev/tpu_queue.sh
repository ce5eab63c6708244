#!/bin/bash
# Dev: serialized TPU measurement queue (one chip — never overlap runs).
# Fire after the axon relay recovers; logs land in /tmp/tpuq_*.log.
set -x
cd /root/repo

# 1. new dbscan_pp timing (compare vs 637 ms pre-optimization)
timeout 3000 python scripts_dev/seed_gen_profile.py > /tmp/tpuq_seedprof.log 2>&1

# 2. pipeline bench (pp score + seed-gen scans/s, target >=3)
timeout 3600 python bench_pipeline.py > /tmp/tpuq_pipeline.log 2>&1

# 3. loader-included train throughput (VERDICT r1 item 2 BENCH row)
timeout 3600 python scripts_dev/train_loader_bench.py > /tmp/tpuq_loader.log 2>&1

# 4. headline bench regression check
timeout 1200 python bench.py > /tmp/tpuq_bench.log 2>&1

echo DONE > /tmp/tpuq_done
