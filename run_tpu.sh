#!/bin/bash
# Retrying runner for TPU jobs through the flaky axon tunnel (dev tool).
# The tunnel sometimes wedges at device acquisition (process sleeps on the
# relay socket with ~0 CPU).  Heuristic: if the job produces no new output
# AND accumulates <2s of CPU within the first WEDGE_S seconds, kill the
# exact PID and retry (max 4 attempts).
#
# usage: run_tpu.sh <logfile> <cmd...>
LOG="$1"; shift
WEDGE_S=${WEDGE_S:-300}
for attempt in 1 2 3 4; do
  echo "[run_tpu] attempt $attempt: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  start=$(date +%s)
  wedged=0
  while kill -0 $pid 2>/dev/null; do
    sleep 15
    now=$(date +%s)
    if (( now - start > WEDGE_S )); then
      # sum CPU over the whole process tree: $pid may be a `timeout`
      # wrapper whose own CPU time stays ~0 while the child works
      cpu=$(ps -eo pid=,ppid=,cputimes= | awk -v root=$pid '
        {pid[NR]=$1; ppid[NR]=$2; t[NR]=$3}
        END {
          n=NR; in_tree[root]=1
          for (iter=0; iter<6; iter++)
            for (i=1;i<=n;i++) if (in_tree[ppid[i]]) in_tree[pid[i]]=1
          s=0; for (i=1;i<=n;i++) if (in_tree[pid[i]]) s+=t[i]
          print s
        }')
      if [[ -n "$cpu" && "$cpu" -lt 3 ]]; then
        echo "[run_tpu] wedge detected (cpu=${cpu}s after $((now-start))s); killing $pid" >> "$LOG"
        # kill the whole tree ($pid may be a wrapper)
        pkids=$(ps -eo pid=,ppid= | awk -v r=$pid '{p[NR]=$1; pp[NR]=$2} END {t[r]=1; for(k=0;k<6;k++) for(i=1;i<=NR;i++) if(t[pp[i]]) t[p[i]]=1; for(i=1;i<=NR;i++) if(t[p[i]]) print p[i]}')
        kill $pkids 2>/dev/null; sleep 2; kill -9 $pkids 2>/dev/null
        wedged=1
        break
      fi
      # process is doing work; stop watching and just wait
      wait $pid; rc=$?
      echo "[run_tpu] rc=$rc" >> "$LOG"
      exit $rc
    fi
  done
  if [[ $wedged -eq 0 ]]; then
    wait $pid 2>/dev/null; rc=$?
    echo "[run_tpu] rc=$rc" >> "$LOG"
    exit $rc
  fi
  sleep 20
done
echo "[run_tpu] giving up after 4 wedged attempts" >> "$LOG"
exit 98
