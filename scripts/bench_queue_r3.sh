#!/bin/bash
# Round-3 TPU bench queue — STRICTLY SEQUENTIAL (two TPU processes wedge
# the tunneled chip; see docs/BENCH.md notes).  Each line logs to its own
# file; reruns are cheap once the compile cache is warm.
set -u
cd /root/repo
run() {
  local log=$1; shift
  echo "=== $(date +%H:%M:%S) START: $* (log $log)"
  timeout 2400 python "$@" > "/tmp/$log" 2>&1
  echo "=== $(date +%H:%M:%S) DONE ($?): tail:"
  tail -2 "/tmp/$log"
}
run r3_w2_4096.log      bench.py --env walker2d --batch 4096
run r3_w2_8192.log      bench.py --env walker2d --batch 8192
run r3_w2_16384.log     bench.py --env walker2d --batch 16384
run r3_hop_4096.log     bench.py --env hopper --batch 4096
run r3_w2_dantzig.log   bench.py --env walker2d --batch 4096 --solver dantzig
run r3_hw_1024.log      bench.py --env humanwalker --batch 1024
run r3_hw_2048.log      bench.py --env humanwalker --batch 2048
run r3_prof_w2.log      scripts/profile_step.py 4096 --env walker2d
run r3_prof_hw.log      scripts/profile_step.py 1024 --env humanwalker
echo "=== QUEUE COMPLETE $(date +%H:%M:%S)"
