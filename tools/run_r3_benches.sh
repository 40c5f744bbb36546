#!/bin/bash
# Round-3 bench chain (reconstructed after the Aug 17 tunnel outage).
# Runs each blocked bench serially on the real chip, logging to
# /tmp/bench_logs/. Order = value: the reference's training headline
# first, then the round-3 feature benches, then bench.py cache warm.
set -u
cd /root/repo
mkdir -p /tmp/bench_logs
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%T)) ==="
  timeout 1500 "$@" >/tmp/bench_logs/$name.log 2>&1
  rc=$?
  echo "--- $name rc=$rc ---"
  tail -20 /tmp/bench_logs/$name.log
}
run train_otterhd python tools/bench_train_otterhd.py
run cache4096     python tools/bench_int8_cache.py 4096 1 all
run speculative   python tools/bench_speculative.py
run session       python tools/bench_session.py
run spec_session  python tools/bench_spec_session.py
run chunked       python tools/bench_chunked_prefill.py
run bench         python bench.py
echo "=== chain done ($(date +%T)) ==="
