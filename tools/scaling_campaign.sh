#!/bin/bash
# Gated N→4N scaling campaign — PRE-COMMITTED PROTOCOL (round 4).
#
# The shared host is bimodal on 15-30 min windows (round-3 BENCH/BASELINE.md
# campaigns A-D: t_8 ranged 136-488 s for identical binaries). Rule, fixed
# BEFORE any engine measurement of this campaign:
#
#   1. A measurement SLOT = pre-gate, engine pair, post-gate:
#        gate      : control 2 + control 8 (pure-CPU)  AND
#                    control-mem 2 + control-mem 8 (memory-bandwidth),
#                    each measurement its own JVM
#        engine    : run 2  +  run 8                   (own JVMs)
#      GATE CALIBRATION (fixed before any engine pair of this campaign
#      ran): each probe is thresholded against ITS OWN measured clean-host
#      value from the round-3 campaigns — pure-CPU clean median 0.929 →
#      gate >= 0.85; memory-bandwidth clean ceiling 0.652 → gate >= 0.60.
#      (The flat ">= 0.8 memctl" rule originally suggested is ABOVE the
#      memctl probe's own clean ceiling and rejects an idle box — three
#      discarded calibration slots at 0.62-0.71 with no engine runs are
#      logged above the first valid slot.)
#   2. A slot is VALID iff BOTH pre- and post-gates pass BOTH probe
#      thresholds. Otherwise the window was contended: the engine pair of
#      that slot is DISCARDED (dropped from the run history so report()
#      never blends it), the slot is logged, and the campaign sleeps
#      COOLDOWN seconds before the next slot.
#   3. The campaign runs until PAIRS_WANTED valid slots or MAX_SLOTS total.
#   4. Headline = report()'s median over the VALID pairs; every gate value
#      and every discarded slot is disclosed in the gate log, which is
#      appended to BENCH/BASELINE.md.
#
# Nothing else may run on the box during a slot (one concurrent sbt run
# turned a 0.83 pair into 0.69 in round 2).
set -u
cd /root/repo
JAR=target/scala-2.13/bloopspark_2.13-0.1.0.jar
GATE_CPU_MIN=${GATE_CPU_MIN:-0.85}
GATE_MEM_MIN=${GATE_MEM_MIN:-0.60}
PAIRS_WANTED=${PAIRS_WANTED:-6}
MAX_SLOTS=${MAX_SLOTS:-12}
COOLDOWN=${COOLDOWN:-180}
GATELOG=/tmp/graft-scaling-gatelog.txt

submit() { # cmd args... ; heap = 3 GiB/core for run, 3 GiB/core for probes
  local cmd=$1; shift
  local cores=$1
  local hist=/tmp/graft-scaling-hist-$cmd-$cores.txt
  local before
  before=$(wc -l < "$hist" 2>/dev/null || echo 0)
  /opt/spark/bin/spark-submit --class graft.ScalingBench \
    --master "local[$cores]" --driver-memory "$((3 * cores))g" \
    --driver-java-options "-XX:+UseParallelGC" \
    "$JAR" "$cmd" "$@" >/dev/null 2>&1
  # A failed spark-submit (broken JAR, bad classpath) leaves the history
  # file untouched; lastline then feeds awk an empty value and EVERY slot
  # gets discarded until MAX_SLOTS with no hint why (round-4 ADVICE).
  # Abort loudly instead.
  local after v
  after=$(wc -l < "$hist" 2>/dev/null || echo 0)
  v=$(lastline "$hist")
  if [ "$after" -le "$before" ] || \
     ! echo "$v" | awk '{ exit !($1 + 0 > 0) }'; then
    echo "ABORT: '$cmd $cores' added no numeric line to $hist — broken JAR/submit?" | tee -a "$GATELOG"
    exit 1
  fi
}

lastline() { tail -n 1 "$1" 2>/dev/null | awk '{print $1}'; }

gate() { # runs one CPU + one mem control pair; echoes "cpuEff memEff"
  submit control 2
  submit control 8
  submit control-mem 2
  submit control-mem 8
  local c2 c8 m2 m8
  c2=$(lastline /tmp/graft-scaling-hist-control-2.txt)
  c8=$(lastline /tmp/graft-scaling-hist-control-8.txt)
  m2=$(lastline /tmp/graft-scaling-hist-control-mem-2.txt)
  m8=$(lastline /tmp/graft-scaling-hist-control-mem-8.txt)
  awk -v a="$c2" -v b="$c8" -v x="$m2" -v y="$m8" \
    'BEGIN { printf "%.3f %.3f", (a/b)/4, (x/y)/4 }'
}

gatefail() { # $1 = "cpuEff memEff"; exit 0 (true) iff the gate FAILS
  echo "$1" | awk -v cm="$GATE_CPU_MIN" -v mm="$GATE_MEM_MIN" \
    '{ exit !($1 < cm || $2 < mm) }'
}

droplast() { # discard the just-run engine pair from both run histories
  for c in 2 8; do
    f=/tmp/graft-scaling-hist-run-$c.txt
    [ -f "$f" ] && sed -i '$d' "$f"
  done
}

echo "# gated campaign $(date -u +%FT%TZ) GATE cpu>=$GATE_CPU_MIN mem>=$GATE_MEM_MIN" >> "$GATELOG"
valid=0
slot=0
while [ "$valid" -lt "$PAIRS_WANTED" ] && [ "$slot" -lt "$MAX_SLOTS" ]; do
  slot=$((slot + 1))
  pre=$(gate)
  if gatefail "$pre"; then
    echo "slot $slot DISCARDED pre-gate [$pre] (no engine run)" >> "$GATELOG"
    sleep "$COOLDOWN"
    continue
  fi
  submit run 2
  submit run 8
  post=$(gate)
  if gatefail "$post"; then
    droplast
    echo "slot $slot DISCARDED post-gate [$post] (pre [$pre]) engine pair dropped" >> "$GATELOG"
    sleep "$COOLDOWN"
    continue
  fi
  valid=$((valid + 1))
  t2=$(lastline /tmp/graft-scaling-hist-run-2.txt)
  t8=$(lastline /tmp/graft-scaling-hist-run-8.txt)
  eff=$(awk -v a="$t2" -v b="$t8" 'BEGIN { printf "%.3f", (a/b)/4 }')
  echo "slot $slot VALID pre [$pre] post [$post] t2 $t2 t8 $t8 eff $eff" >> "$GATELOG"
done
echo "# campaign end: $valid valid pairs in $slot slots" >> "$GATELOG"
