#!/bin/bash
# Poll the sustained-capacity probe; when the host is clean twice in a row,
# run the scaling bench (N vs 4N) and exit. Writes /tmp/bench_running.lock
# while the measurement is live so interactive work can stay off the CPUs.
cd /root/repo
THRESH=${THRESH:-0.92}
while true; do
  if [ -f /tmp/bench_pause ]; then sleep 60; continue; fi
  R1=$(python tools/throttle_probe.py 6 | python -c 'import json,sys; print(json.load(sys.stdin)["sustained_ratio"])')
  echo "$(date +%T) probe1=$R1"
  if python -c "exit(0 if $R1 >= $THRESH else 1)"; then
    sleep 20
    R2=$(python tools/throttle_probe.py 6 | python -c 'import json,sys; print(json.load(sys.stdin)["sustained_ratio"])')
    echo "$(date +%T) probe2=$R2"
    if python -c "exit(0 if $R2 >= $THRESH else 1)"; then
      touch /tmp/bench_running.lock
      echo "$(date +%T) host clean, running scaling bench"
      SPARK_GRAFT_SCALE_N=${SCALE_N:-4} SPARK_GRAFT_SCALE_REST=${SCALE_REST:-240} python tools/bench_scaling.py /root/testdata/sf0.1
      rc=$?
      rm -f /tmp/bench_running.lock
      echo "$(date +%T) bench done rc=$rc"
      exit $rc
    fi
  fi
  sleep 150
done
