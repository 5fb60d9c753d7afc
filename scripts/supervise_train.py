#!/usr/bin/env python
"""Stall-detecting supervisor for long TPU training runs.

The hosted-TPU tunnel in this environment occasionally wedges a device
call indefinitely (observed twice in round 4: a trainer goes from ~45%
host CPU to 0% and never returns — no exception, no exit). The reference
has nothing like this because it runs single-GPU locally; for us it is
the failure-detection/elastic-recovery slot of SURVEY §5.3.

Mechanism: run train.py as a child, watch its /proc CPU jiffies; if the
child burns < 1% CPU for --stall-seconds, kill it and restart with
`--resume <ckpt-dir>` appended (train.py resumes from the last `latest`
checkpoint — pair the run with --save-every-steps so mid-epoch progress
survives). Exits with the child's code on a normal exit.

Usage:
  python scripts/supervise_train.py --ckpt-dir outputs/train_distill/X \
      [--stall-seconds 300] [--max-restarts 4] -- \
      python train.py --config ... --run-id X --save-every-steps 2000
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def cpu_seconds(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
    except (FileNotFoundError, ProcessLookupError):
        return -1.0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        print("usage: supervise_train.py [opts] -- <train command ...>",
              file=sys.stderr)
        return 2
    split = argv.index("--")
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt-dir", required=True,
                        help="run dir train.py checkpoints into (appended "
                             "as --resume on restarts)")
    parser.add_argument("--stall-seconds", type=int, default=300)
    parser.add_argument("--poll-seconds", type=int, default=30)
    parser.add_argument("--max-restarts", type=int, default=4)
    parser.add_argument("--restart-on-crash", action="store_true",
                        help="also restart (with --resume) on nonzero child "
                             "exits, not just stalls")
    args = parser.parse_args(argv[:split])
    cmd = argv[split + 1:]

    restarts = 0
    while True:
        run_cmd = list(cmd)
        if restarts and os.path.isdir(os.path.join(args.ckpt_dir, "latest")):
            run_cmd += ["--resume", args.ckpt_dir]
        print(f"[supervisor] launch (restart {restarts}): "
              f"{' '.join(run_cmd)}", flush=True)
        # Own session/process group: a stall kill must reach any grandchild
        # (data-loader workers, shell wrappers) or it can keep the TPU
        # tunnel held and make the restart's attach fail.
        child = subprocess.Popen(run_cmd, start_new_session=True)
        last_cpu = cpu_seconds(child.pid)
        quiet = 0.0
        while True:
            try:
                code = child.wait(timeout=args.poll_seconds)
                break
            except subprocess.TimeoutExpired:
                pass
            now = cpu_seconds(child.pid)
            if now < 0:
                continue
            burn = now - last_cpu
            last_cpu = now
            if burn < 0.01 * args.poll_seconds:
                quiet += args.poll_seconds
            else:
                quiet = 0.0
            if quiet >= args.stall_seconds:
                print(f"[supervisor] STALL: <1% cpu for {quiet:.0f}s — "
                      "killing child process group", flush=True)
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    child.send_signal(signal.SIGKILL)
                child.wait()
                code = None
                break
        if code is not None:
            print(f"[supervisor] child exited {code}", flush=True)
            if code == 0 or not args.restart_on_crash:
                return code
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] restart budget exhausted", flush=True)
            return 1
        time.sleep(10)  # let the tunnel settle before re-attaching


if __name__ == "__main__":
    sys.exit(main())
