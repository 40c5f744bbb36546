#!/bin/bash
# Round-4 deferred bench chain (VERDICT r3 #1): the four round-3 serving
# features that shipped without chip numbers. Serial on the one chip,
# logging to /tmp/bench_logs/.
set -u
cd /root/repo
mkdir -p /tmp/bench_logs
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%T)) ==="
  timeout 2400 "$@" >/tmp/bench_logs/$name.log 2>&1
  rc=$?
  echo "--- $name rc=$rc ($(date +%T)) ---"
  tail -25 /tmp/bench_logs/$name.log
}
run chunked       python tools/bench_chunked_prefill.py
run session       python tools/bench_session.py
run spec_pool     python tools/bench_spec_pool.py
run spec_session  python tools/bench_spec_session.py
echo "=== r4 chain done ($(date +%T)) ==="
