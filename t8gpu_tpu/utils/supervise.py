"""Failure-detecting run supervisor: checkpoint/resume + log-silence watchdog.

Long accelerator runs fail in ways a plain retry-on-exit loop cannot
handle: the device transport can WEDGE the client forever (zero CPU,
blocked in a device wait — the process never exits, so an exit-triggered
retry never fires) or drop entirely mid-transfer.  The reference has no
answer to this (its 20 000-step flagship, examples/compressible_euler/
main.cu:27-38, simply dies and loses the run); this repo's drivers are
resumable (`--checkpoint-every` / `--resume`, io/checkpoint.py), and this
module supplies the missing supervisor half:

  * spawn the driver with its output appended to a log file;
  * HEALTH = the log file advancing.  A healthy driver prints a progress
    line at least once per watchdog interval (the drivers print every
    adapt/IO event, flush=True);
  * if the log stalls longer than `--silence`, the child is presumed
    wedged and is terminated (by exact PID — never by name/pattern);
  * on any child death the run is relaunched, resuming from the last
    checkpoint when one exists;
  * the run is DONE when the child exits 0 (and, if given, the log
    matches `--done-regex` — belt and braces for drivers that exit 0
    on partial work).

The `--silence` threshold must exceed the worst-case healthy quiet
period — in particular a FRESH XLA compile of the largest program
(~30+ min through a remote-device relay, during which the client sits
at 0% CPU, indistinguishable from a wedge).  Killing mid-compile is
worse than useless: the compile cache entry is only written on
completion, so an impatient watchdog restarts forever at the same
point.  Default 2700 s; with a warm persistent compile cache
(utils/cache.enable_persistent_cache) a few minutes suffice.

Usage (the 20 000-step reference-protocol endurance run; --resume-flag
needs the `=` form — argparse rejects a separate value starting with
`-` — and `--resume` is its default anyway):

    python -m t8gpu_tpu.utils.supervise \
        --log run.log --ckpt ck.npz --resume-flag=--resume \
        --silence 2700 --done-regex "^steps=20000" -- \
        python examples/kh_sphere.py --amr --steps 20000 \
            --adapt-every 100 --checkpoint-every 1000 \
            --checkpoint-path ck.npz
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time


def _log_mtime(path: str, fallback: float) -> float:
    try:
        return os.stat(path).st_mtime
    except OSError:
        return fallback


def run_supervised(child_argv: list[str], log_path: str,
                   ckpt: str | None = None,
                   resume_flag: str = "--resume",
                   silence: float = 2700.0,
                   done_regex: str | None = None,
                   max_restarts: int = 100,
                   restart_delay: float = 30.0,
                   poll: float = 10.0,
                   status=None) -> int:
    """Run `child_argv` until it completes, restarting (with resume) on
    crash or log-silence wedge.  Returns 0 on completion, 1 when
    max_restarts is exhausted.  `status` is an optional callable fed
    one-line progress strings (defaults to stderr)."""
    status = status or (lambda s: print(f"[supervise] {s}",
                                        file=sys.stderr, flush=True))
    pattern = re.compile(done_regex, re.M) if done_regex else None
    # completion is judged only on output written by THIS supervision run:
    # the log is opened in append mode, so a done marker left by an
    # earlier run must not mark a new partial run complete
    try:
        log_start = os.path.getsize(log_path)
    except OSError:
        log_start = 0

    for attempt in range(max_restarts + 1):
        argv = list(child_argv)
        if ckpt and os.path.exists(ckpt):
            argv += [resume_flag, ckpt]
        with open(log_path, "ab") as log_f:
            start = time.time()
            proc = subprocess.Popen(argv, stdout=log_f,
                                    stderr=subprocess.STDOUT)
            status(f"attempt {attempt}: pid {proc.pid}"
                   + (" (resuming)" if len(argv) > len(child_argv) else ""))
            wedged = False
            while proc.poll() is None:
                time.sleep(poll)
                # clamp to THIS attempt's start: after a wedge kill the
                # log mtime is stale, and without the clamp every
                # relaunched child would get only ~poll seconds of grace
                # (a kill-restart loop that exhausts max_restarts)
                age = time.time() - max(_log_mtime(log_path, start), start)
                if age > silence:
                    status(f"watchdog: {age:.0f}s of log silence — "
                           f"killing pid {proc.pid}")
                    wedged = True
                    proc.terminate()          # exact PID, never a pattern
                    try:
                        proc.wait(timeout=15)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                        proc.wait()
                    break
            rc = proc.wait()
        if not wedged and rc == 0:
            if pattern is not None:
                with open(log_path, "r", errors="replace") as f:
                    f.seek(log_start)
                    if not pattern.search(f.read()):
                        status("exit 0 but done-regex not found — "
                               "relaunching")
                        time.sleep(restart_delay)
                        continue
            status("run complete")
            return 0
        status(f"child {'wedged' if wedged else f'exited rc={rc}'} — "
               f"restarting in {restart_delay:.0f}s")
        time.sleep(restart_delay)
    status("max restarts exhausted")
    return 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        usage="python -m t8gpu_tpu.utils.supervise [options] -- CMD ...")
    p.add_argument("--log", required=True, help="child output (appended); "
                   "its mtime is the health signal")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint path: when it exists, "
                        "'RESUME_FLAG CKPT' is appended to the command")
    p.add_argument("--resume-flag", default="--resume")
    p.add_argument("--silence", type=float, default=2700.0,
                   help="seconds of log silence before the child is "
                        "declared wedged (must exceed the worst-case "
                        "fresh compile; default 2700)")
    p.add_argument("--done-regex", default=None,
                   help="log must match this (multiline) for the run to "
                        "count as complete in addition to exit 0")
    p.add_argument("--max-restarts", type=int, default=100)
    p.add_argument("--restart-delay", type=float, default=30.0)
    p.add_argument("--poll", type=float, default=10.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- followed by the child command line")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no child command given (append: -- python driver.py ...)")
    return run_supervised(cmd, args.log, ckpt=args.ckpt,
                          resume_flag=args.resume_flag,
                          silence=args.silence, done_regex=args.done_regex,
                          max_restarts=args.max_restarts,
                          restart_delay=args.restart_delay, poll=args.poll)


if __name__ == "__main__":
    sys.exit(main())
