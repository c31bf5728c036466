#!/bin/bash
# Reproduce + profile the bench pipeline at one parallelism level.
# Usage: profile_pipeline.sh <ncpus>   (e.g. 8 or 32)
N=$1
MASTER="local[$N]"
LOG=/tmp/prof_$N
mkdir -p $LOG
# sampler: every 2s record aggregate java vs python CPU%, plus steal
(
  for i in $(seq 1 200); do
    ts=$(date +%s.%N)
    ps -eo comm,pcpu,rss --no-headers | awk -v ts=$ts '
      /java/ {j+=$2; jr+=$3}
      /python/ {p+=$2; pr+=$3}
      END {printf "%s java_cpu=%.0f java_rss_mb=%.0f py_cpu=%.0f py_rss_mb=%.0f\n", ts, j, jr/1024, p, pr/1024}'
    grep -E '^cpu ' /proc/stat | awk -v ts=$ts '{print ts, "stat", $2+$4, $5, $9}'
    sleep 2
  done
) > $LOG/sampler.txt &
SAMPLER=$!
cd /root/repo
XUTIL_BENCH_TRIALS=1 taskset -c 0-$((N-1)) python bench.py --stage pipeline --master $MASTER 2>$LOG/stderr.txt | tee $LOG/out.json
kill $SAMPLER 2>/dev/null
tail -5 $LOG/stderr.txt
