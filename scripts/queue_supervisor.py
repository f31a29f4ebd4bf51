"""Round-5 TPU queue supervisor (VERDICT r4 item 2).

Round 4's queue chain (round4_queue.sh -> r4b -> r4c -> r4d) died silently:
stages vanished without markers, /tmp logs ended up empty, and 8 queued
measurements produced zero artifacts. This supervisor fixes the failure mode
structurally:

  * ONE process owns the WHOLE stage list (no chained shells that "proceed
    past a vanished predecessor").
  * Every stage transition is appended to a ledger INSIDE the repo
    (results/QUEUE_LEDGER.jsonl) the moment it happens — started / done /
    failed / retry, with rc, elapsed, attempt and log-tail — so a dead stage
    is a committed failure record, never an empty /tmp file.
  * Stage logs live in results/queue_logs/<stage>.log (repo, not /tmp).
  * A heartbeat thread rewrites results/queue_logs/heartbeat.txt every 30 s
    with the supervisor pid + current stage, so an external watcher can
    distinguish "long stage" from "supervisor died".
  * A TPU health gate runs before every attempt (subprocess probe, patient
    570 s timeout — first op after a worker recovery can take minutes).
  * Each stage gets a hard wall-clock timeout and up to MAX_ATTEMPTS tries
    with a recovery wait between them; a stage that exhausts retries is
    recorded FAILED and the queue moves on (prioritised list, so the most
    valuable artifacts land first).
  * The stage list is re-read from scripts/queue_r5_stages.tsv before every
    pick, so stages can be appended/reordered while the queue runs.
  * Restart-safe: stages already marked done in the ledger are skipped.

Usage: python -u scripts/queue_supervisor.py
"""
import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = "/root/repo"
STAGES_TSV = os.path.join(REPO, "scripts", "queue_r5_stages.tsv")
LEDGER = os.path.join(REPO, "results", "QUEUE_LEDGER.jsonl")
LOG_DIR = os.path.join(REPO, "results", "queue_logs")
HEARTBEAT = os.path.join(LOG_DIR, "heartbeat.txt")
MAX_ATTEMPTS = 3
GATE_DEADLINE_S = 14400
RECOVERY_WAIT_S = 240
# Stall killer: an axon worker restart can orphan a client RPC with NO
# timeout — the stage then blocks in a socket wait forever (observed live on
# the round-5 compat stage: log + CPU frozen 42 min while a fresh probe
# process got served immediately). Legit silent gaps (server-side remote
# compiles) run 10-40 min, so a stage whose log hasn't advanced in 50 min is
# declared wedged, killed, and retried. (Tightened 3000->1800 s: the
# longest legit silent gap observed live is ~15 min; wedges cost 50 min at
# the old threshold.)
STALL_KILL_S = 1800
# First-output killer: every stage script's first act is a 64x64 health op +
# a "TPU healthy" print (seconds, normally). A stage that produced <200 bytes
# of output in 15 min is wedged on its FIRST op (also observed live: a gate
# passed, then the very next process's first op hung) — no reason to wait
# the full stall threshold.
FIRST_OUTPUT_KILL_S = 900
FIRST_OUTPUT_MIN_BYTES = 200

os.makedirs(LOG_DIR, exist_ok=True)
_state = {"stage": "(starting)", "since": time.time()}
T0 = time.time()


def log(msg: str) -> None:
    print(f"[qsup +{time.time()-T0:7.0f}s] {msg}", flush=True)


def ledger_append(rec: dict) -> None:
    rec = dict(rec, ts=round(time.time(), 1),
               iso=time.strftime("%Y-%m-%dT%H:%M:%S"))
    with open(LEDGER, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())


def ledger_terminal_stages() -> set:
    """Stages that must not be picked again: done, or terminally failed
    ('failed' is only written when retries are exhausted or the TPU gate
    gave up — without this the main loop would re-pick a deterministically
    failing stage forever and starve the queue tail)."""
    terminal = set()
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("event") in ("done", "failed"):
                    terminal.add(rec["stage"])
    return terminal


def ledger_done_stages() -> set:
    done = set()
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("event") == "done":
                    done.add(rec["stage"])
    return done


def read_stages() -> list:
    """name<TAB>timeout_s<TAB>shell-command. '#' lines are comments."""
    stages = []
    if not os.path.exists(STAGES_TSV):
        return stages
    with open(STAGES_TSV) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, timeout_s, cmd = line.split("\t", 2)
            stages.append((name, int(timeout_s), cmd))
    return stages


def heartbeat_loop() -> None:
    while True:
        try:
            with open(HEARTBEAT, "w") as f:
                f.write(json.dumps({
                    "pid": os.getpid(), "ts": round(time.time(), 1),
                    "iso": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "stage": _state["stage"],
                    "stage_elapsed_s": round(time.time() - _state["since"], 1),
                }) + "\n")
        except OSError:
            pass
        time.sleep(30)


def tpu_gate(deadline_s: int) -> bool:
    """Serial jax-free-shell probes until the first op completes (gate2)."""
    start = time.time()
    probe = ("import jax, jax.numpy as jnp; "
             "assert float(jnp.ones((64,64)).sum())==4096.0; "
             "print('HEALTHY')")
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-u", "-c", probe], capture_output=True,
                text=True, timeout=570).stdout.strip().splitlines()
            healthy = bool(out) and out[-1] == "HEALTHY"
        except subprocess.TimeoutExpired:
            healthy = False
        if healthy:
            log(f"gate: healthy after {time.time()-start:.0f}s")
            return True
        if time.time() - start > deadline_s:
            log(f"gate: FAILED after {time.time()-start:.0f}s")
            return False
        time.sleep(90)


def tail(path: str, n: int = 12) -> str:
    try:
        with open(path, "rb") as f:
            f.seek(0, 2)
            f.seek(max(0, f.tell() - 8192))
            return "\n".join(
                f.read().decode("utf-8", "replace").splitlines()[-n:])
    except OSError:
        return "(no log)"


def run_stage(name: str, timeout_s: int, cmd: str) -> bool:
    logf = os.path.join(LOG_DIR, f"{name}.log")
    for attempt in range(1, MAX_ATTEMPTS + 1):
        if not tpu_gate(GATE_DEADLINE_S):
            ledger_append({"stage": name, "event": "failed", "attempt": attempt,
                           "rc": None, "reason": "tpu gate deadline"})
            return False
        _state.update(stage=f"{name} (attempt {attempt})", since=time.time())
        ledger_append({"stage": name, "event": "started", "attempt": attempt,
                       "cmd": cmd, "timeout_s": timeout_s})
        t0 = time.time()
        rc, reason = None, ""
        with open(logf, "a") as lf:
            lf.write(f"\n===== qsup attempt {attempt} "
                     f"{time.strftime('%Y-%m-%dT%H:%M:%S')} =====\n")
            lf.flush()
            lf.flush()
            size0 = os.path.getsize(logf)
            proc = subprocess.Popen(
                ["bash", "-c", cmd], stdout=lf, stderr=subprocess.STDOUT,
                cwd=REPO, start_new_session=True)
            # Compile guard: a first-shape forest compile runs server-side
            # and is legitimately silent 10-40 min — indistinguishable from
            # a wedged RPC by log age alone. The guard touches the stage log
            # every 5 min ONLY while the stage's axon-conn-read thread is
            # genuinely blocked in tcp_recvmsg, and gives up after 90 min,
            # restoring the stall-killer's authority over true wedges.
            guard = None
            try:
                with open(os.path.join(LOG_DIR, f"guard_{name}.log"),
                          "a") as gf:
                    guard = subprocess.Popen(
                        [sys.executable, "-u",
                         os.path.join(REPO, "scripts",
                                      "round5_compile_guard.py"),
                         str(proc.pid), logf, "5400"],
                        stdout=gf, stderr=subprocess.STDOUT, cwd=REPO,
                        start_new_session=True)
            except OSError:
                guard = None
            deadline = t0 + timeout_s
            while True:
                poll = max(0.5, min(30.0, deadline - time.time()))
                try:
                    rc = proc.wait(timeout=poll)
                    break
                except subprocess.TimeoutExpired:
                    now = time.time()
                    try:
                        log_age = now - os.path.getmtime(logf)
                        log_grown = os.path.getsize(logf) - size0
                    except OSError:
                        log_age, log_grown = 0.0, FIRST_OUTPUT_MIN_BYTES
                    if now > deadline:
                        reason = f"timeout after {timeout_s}s"
                    elif log_age > STALL_KILL_S:
                        reason = (f"stalled: log silent {log_age:.0f}s "
                                  f"(wedged RPC after a worker restart)")
                    elif (now - t0 > FIRST_OUTPUT_KILL_S
                          and log_grown < FIRST_OUTPUT_MIN_BYTES):
                        reason = (f"no first output in {now - t0:.0f}s "
                                  f"(first op wedged)")
                    else:
                        continue
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        pass
                    proc.wait(timeout=60)
                    break
            if guard is not None:
                try:
                    guard.kill()
                    guard.wait(timeout=10)
                except (ProcessLookupError, OSError,
                        subprocess.TimeoutExpired):
                    pass
        elapsed = round(time.time() - t0, 1)
        if rc == 0:
            ledger_append({"stage": name, "event": "done", "attempt": attempt,
                           "rc": 0, "elapsed_s": elapsed})
            log(f"{name}: DONE in {elapsed}s (attempt {attempt})")
            return True
        ledger_append({"stage": name,
                       "event": "retry" if attempt < MAX_ATTEMPTS else "failed",
                       "attempt": attempt, "rc": rc, "elapsed_s": elapsed,
                       "reason": reason, "log_tail": tail(logf)})
        log(f"{name}: attempt {attempt} rc={rc} {reason} ({elapsed}s)")
        if attempt < MAX_ATTEMPTS:
            _state.update(stage=f"{name} (recovery wait)", since=time.time())
            time.sleep(RECOVERY_WAIT_S)
    return False


def main() -> None:
    threading.Thread(target=heartbeat_loop, daemon=True).start()
    ledger_append({"stage": "__supervisor__", "event": "boot",
                   "pid": os.getpid()})
    while True:
        skip = ledger_terminal_stages()
        pending = [(n, t, c) for n, t, c in read_stages() if n not in skip]
        if not pending:
            break
        name, timeout_s, cmd = pending[0]
        log(f"next stage: {name} ({len(pending)} pending)")
        run_stage(name, timeout_s, cmd)
    ledger_append({"stage": "__supervisor__", "event": "all_done"})
    log("ALL STAGES DONE")


if __name__ == "__main__":
    main()
