"""The run supervisor (utils/supervise.py): failure detection + resume.

Exercises the three failure modes the endurance protocol met in the
wild (BENCHMARKS.md "Reference-scale endurance run"): a WEDGED child
(alive, zero progress — only the log-silence watchdog can catch it), a
crashing child, and a child that exits 0 without completing."""

import os
import subprocess
import sys
import textwrap

from t8gpu_tpu.utils.supervise import run_supervised


def _child(tmp_path, body: str) -> list:
    path = tmp_path / "child.py"
    path.write_text(textwrap.dedent(body))
    return [sys.executable, str(path)]


def test_wedge_is_killed_and_resumed(tmp_path):
    """First launch writes a checkpoint then hangs silently; the watchdog
    must kill it (silence > threshold) and the relaunch must carry the
    resume flag and finish."""
    ck = tmp_path / "ck.npz"
    log = tmp_path / "run.log"
    cmd = _child(tmp_path, f"""
        import sys, time
        if "--resume" in sys.argv:
            print("resumed from", sys.argv[-1], flush=True)
            print("steps=5 integral drift=0", flush=True)
            sys.exit(0)
        print("progress step=1", flush=True)
        open({str(ck)!r}, "w").write("step 1")
        time.sleep(300)     # wedge: alive but silent forever
    """)
    msgs = []
    rc = run_supervised(cmd, str(log), ckpt=str(ck),
                        silence=1.5, poll=0.2, restart_delay=0.1,
                        done_regex=r"^steps=5", max_restarts=3,
                        status=msgs.append)
    assert rc == 0
    text = log.read_text()
    assert "progress step=1" in text           # first attempt ran
    assert "steps=5" in text                   # resumed attempt finished
    assert any("watchdog" in m for m in msgs)  # the wedge was detected
    assert any("resuming" in m for m in msgs)  # relaunch used the ckpt


def test_crash_is_restarted(tmp_path):
    """A crashing child (nonzero exit) is relaunched until it succeeds."""
    marker = tmp_path / "ran_once"
    log = tmp_path / "run.log"
    cmd = _child(tmp_path, f"""
        import os, sys
        if not os.path.exists({str(marker)!r}):
            open({str(marker)!r}, "w").write("x")
            print("boom", flush=True)
            sys.exit(3)
        print("steps=2 ok", flush=True)
    """)
    rc = run_supervised(cmd, str(log), silence=30, poll=0.1,
                        restart_delay=0.1, max_restarts=3,
                        status=lambda s: None)
    assert rc == 0
    assert "steps=2 ok" in log.read_text()


def test_exit_zero_without_done_marker_relaunches(tmp_path):
    """Exit 0 alone is not completion when --done-regex is given (guards
    against drivers that exit cleanly on partial work)."""
    marker = tmp_path / "ran_once"
    log = tmp_path / "run.log"
    cmd = _child(tmp_path, f"""
        import os, sys
        if not os.path.exists({str(marker)!r}):
            open({str(marker)!r}, "w").write("x")
            print("partial", flush=True)
            sys.exit(0)        # clean exit, but not done
        print("steps=7 finished", flush=True)
    """)
    rc = run_supervised(cmd, str(log), silence=30, poll=0.1,
                        restart_delay=0.1, done_regex=r"^steps=7",
                        max_restarts=3, status=lambda s: None)
    assert rc == 0
    assert "steps=7 finished" in log.read_text()


def test_max_restarts_exhausted(tmp_path):
    """A child that always fails terminates the supervisor with rc 1."""
    log = tmp_path / "run.log"
    cmd = _child(tmp_path, """
        import sys
        sys.exit(1)
    """)
    rc = run_supervised(cmd, str(log), silence=30, poll=0.1,
                        restart_delay=0.05, max_restarts=2,
                        status=lambda s: None)
    assert rc == 1


def test_cli_entry(tmp_path):
    """python -m t8gpu_tpu.utils.supervise -- CMD works end to end."""
    log = tmp_path / "run.log"
    child = tmp_path / "child.py"
    child.write_text('print("steps=1 ok", flush=True)\n')
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "t8gpu_tpu.utils.supervise",
         "--log", str(log), "--silence", "30", "--poll", "0.1",
         "--done-regex", r"^steps=1", "--",
         sys.executable, str(child)],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "steps=1 ok" in log.read_text()
