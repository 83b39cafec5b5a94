#!/bin/bash
# Watchdog for the in-image reference campaign (benchmarks/refrun/run_reference_hi.py).
# The campaign process has twice been found SIGSTOPPED (state T) mid-run — cause
# unknown (likely the session driver suspending background children).  This loop
# resumes it within 30 s whenever that happens and logs the event.
#
# Usage: nohup bash benchmarks/refrun/watchdog.sh <pidfile> >> /tmp/refrun_watchdog.log 2>&1 &
PIDFILE="${1:-/tmp/refrun.pid}"
while true; do
  PID=$(cat "$PIDFILE" 2>/dev/null)
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    echo "$(date -Is) target pid ${PID:-<none>} gone; watchdog exiting"
    exit 0
  fi
  STAT=$(ps -o stat= -p "$PID" 2>/dev/null | tr -d ' ')
  case "$STAT" in
    T*)
      echo "$(date -Is) pid $PID found stopped (stat=$STAT); sending SIGCONT"
      kill -CONT "$PID"
      # also resume any stopped children (the harness forks workers)
      for c in $(ps -o pid= --ppid "$PID" 2>/dev/null); do
        CS=$(ps -o stat= -p "$c" 2>/dev/null | tr -d ' ')
        case "$CS" in T*) kill -CONT "$c";; esac
      done
      ;;
  esac
  sleep 30
done
