#!/bin/bash
# Supervises the round-4 synthetic ladder (tools/synthetic_ladder.py)
# against TPU-relay outages and wedges (CLAUDE.md: relay drops strand the
# client in futex-wait with silent logs).  Loop:
#   1. probe the relay with a tiny bounded program; sleep while it is down
#   2. relaunch the ladder resuming from the furthest stage with artifacts
#   3. watch the log; if it goes silent >7 min, kill the client and loop
# Exits 0 when the ladder's final JSON (with "mota") has been printed.
#
# Stage-resume decision (see synthetic_ladder.py CLI):
#   final JSON in log            -> done
#   stage3 ckpt at --epochs3     -> --eval_ckpt  (training all done)
#   stage2 ckpts exist           -> --stage1_ckpt <latest stage2 ckpt>
#                                   (train.py --ckpt restores epoch +
#                                   optimizer, so stage 2 CONTINUES; a
#                                   finished stage 2 restores at its last
#                                   epoch and falls through to stage 3)
#   stage1 finished (stage2 dir) -> --stage1_ckpt <latest stage1 ckpt>
#   stage1 ckpts exist           -> --resume1 <latest stage1 ckpt>
#   nothing                      -> fresh run
set -u
cd /root/repo
OUT=output/ladder4
LOG=output/ladder4.log
SLOG=output/ladder_supervisor.log
EPOCHS3=100
ARGS=(--out "$OUT" --wide --seqs 8 --frames 48 --epochs1 1200
      --epochs2 600 --epochs3 100 --lr 3e-4 --batch 4)
SETKV=(--set RCNN.CLS_FG_THRESH 0.35 RCNN.CLS_BG_THRESH 0.25
       RCNN.REG_FG_THRESH 0.35 REID.FG_THRESH 0.35)

note() { echo "$(date -u '+%m-%d %H:%M:%S') $*" >> "$SLOG"; }

latest_stem() {  # newest checkpoint stem in dir $1, empty if none
  local f
  f=$(ls -t "$1"/checkpoint_epoch_*.ckpt 2>/dev/null | head -1) || true
  [ -n "${f:-}" ] && echo "${f%.ckpt}"
}

relay_ok() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128)))))
" >/dev/null 2>&1
}

done_yet() { grep -q '"mota"' "$LOG" 2>/dev/null; }

while true; do
  if done_yet; then note "ladder complete"; exit 0; fi
  if ! relay_ok; then note "relay down"; sleep 180; continue; fi
  note "relay up; choosing resume point"

  EXTRA=()
  if [ -f "$OUT/stage3/ckpt/checkpoint_epoch_${EPOCHS3}.ckpt" ]; then
    EXTRA=(--eval_ckpt "$OUT/stage3/ckpt/checkpoint_epoch_${EPOCHS3}")
  elif s2=$(latest_stem "$OUT/stage2/ckpt"); [ -n "${s2:-}" ]; then
    EXTRA=(--stage1_ckpt "$s2")
  elif [ -d "$OUT/stage2" ] && s1=$(latest_stem "$OUT/stage1/ckpt"); \
       [ -n "${s1:-}" ]; then
    EXTRA=(--stage1_ckpt "$s1")
  elif s1=$(latest_stem "$OUT/stage1/ckpt"); [ -n "${s1:-}" ]; then
    EXTRA=(--resume1 "$s1")
  fi
  note "launching: ${EXTRA[*]:-fresh}"
  # NOTE --set must stay LAST (argparse.REMAINDER swallows later flags)
  python tools/synthetic_ladder.py "${ARGS[@]}" "${EXTRA[@]}" \
      "${SETKV[@]}" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/ladder.pid
  sleep 30
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
    if [ "$age" -gt 420 ]; then
      note "wedge: log silent ${age}s; killing $PID"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      sleep 10
      break
    fi
  done
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID" 2>/dev/null; rc=$?
    note "ladder process exited rc=$rc"
    done_yet && { note "ladder complete"; exit 0; }
    # crashed or was killed: loop re-probes and resumes
    sleep 30
  fi
done
