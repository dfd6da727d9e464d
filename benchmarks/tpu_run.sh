#!/bin/bash
# Watchdog runner for axon-tunnel TPU jobs.
#
# The tunnel's remote compile service intermittently wedges: the client
# blocks forever in socket wait (0 CPU ticks, no stdout) and never
# errors. A fresh process usually succeeds, so: run the command, watch
# for stalls (no stdout progress AND no CPU ticks for STALL_S), kill the
# exact pid and retry up to 3 times. Scripts driven by this should print
# progress between compile stages (all benchmarks/*.py labs do).
#
# Usage: tpu_run.sh LOGFILE TOTAL_S STALL_S cmd [args...]
set -u
LOG=$1; TOTAL=$2; STALL=$3; shift 3

for attempt in 1 2 3; do
  : > "$LOG"
  "$@" >>"$LOG" 2>&1 &
  pid=$!
  start=$(date +%s)
  stalled=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 20
    now=$(date +%s)
    if [ $((now - start)) -gt "$TOTAL" ]; then
      echo "[tpu_run] total timeout (${TOTAL}s), attempt $attempt" >>"$LOG"
      kill "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      exit 124
    fi
    # Wedges usually strike at the FIRST device contact, where a short
    # stall window applies. They can also strike later (e.g. while a
    # remote compile is queued); after the handshake line the window is
    # 3x STALL so legit multi-minute compiles survive.
    eff_stall=$STALL
    if grep -q "handshake ok" "$LOG" 2>/dev/null; then
      eff_stall=$((3 * STALL))
    fi
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$eff_stall" ]; then
      t1=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo 0)
      sleep 10
      t2=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo "$t1")
      if [ $((t2 - t1)) -le 1 ]; then
        echo "[tpu_run] stall (${eff_stall}s no output, no cpu), kill attempt $attempt" >>"$LOG"
        kill "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
        stalled=1
        break
      fi
    fi
  done
  if [ "$stalled" -eq 0 ]; then
    wait "$pid" 2>/dev/null
    exit $?
  fi
  sleep 5
done
echo "[tpu_run] gave up after 3 stalled attempts" >>"$LOG"
exit 125
