#!/usr/bin/env python
"""Bounded guard that defers the supervisor's stall-kill during a legit
long remote compile.

The queue supervisor kills a stage whose log is silent >STALL_KILL_S
(30 min). But the first forest-grid compile for a new feature shape runs
server-side over the axon tunnel and is legitimately silent 10-40 min
(observed in rounds 3-5; the client thread sits in tcp_recvmsg). This
guard watches one stage process: while the process is alive AND its
axon-conn-read thread is genuinely blocked in tcp_recvmsg (waiting on
the server, not dead), it touches the stage log every 5 min so the
supervisor does not kill a healthy compile. It gives up after MAX_EXTRA
seconds, after which the supervisor's stall-killer resumes authority —
so a true wedge still dies, just later. The stage's own hard timeout is
unaffected.

Usage: round5_compile_guard.py <pid> <logfile> [max_extra_s]
"""
import os
import sys
import time


def conn_read_in_recvmsg(pid: int) -> bool:
    task_dir = f"/proc/{pid}/task"
    try:
        tids = os.listdir(task_dir)
    except OSError:
        return False
    for tid in tids:
        try:
            with open(f"{task_dir}/{tid}/comm") as f:
                comm = f.read().strip()
            if not comm.startswith("axon-conn-read"):
                continue
            with open(f"{task_dir}/{tid}/stack") as f:
                stack = f.read()
            return "tcp_recvmsg" in stack or "sk_wait_data" in stack
        except OSError:
            continue
    return False


def main() -> None:
    pid = int(sys.argv[1])
    logf = sys.argv[2]
    max_extra = int(sys.argv[3]) if len(sys.argv) > 3 else 4500
    t0 = time.time()
    while time.time() - t0 < max_extra:
        if not os.path.exists(f"/proc/{pid}"):
            print(f"[guard] pid {pid} gone after {time.time()-t0:.0f}s; exit")
            return
        if conn_read_in_recvmsg(pid):
            os.utime(logf, None)
            print(f"[guard] +{time.time()-t0:6.0f}s touched {logf} "
                  f"(pid {pid} waiting on server)", flush=True)
        else:
            print(f"[guard] +{time.time()-t0:6.0f}s conn-read not in recvmsg; "
                  f"not touching", flush=True)
        time.sleep(300)
    print(f"[guard] max_extra {max_extra}s reached; stall-killer resumes")


if __name__ == "__main__":
    main()
