"""Summarize results/QUEUE_LEDGER.jsonl into a per-stage outcome table
(markdown on stdout + results/QUEUE_SUMMARY.json) — the round-5 queue's
disclosed landing record: every queued stage ends as an artifact or a
committed failure row (VERDICT r4 item 2).

CPU-only; run any time: python scripts/round5_ledger_summary.py
"""
import json
import sys

LEDGER = "/root/repo/results/QUEUE_LEDGER.jsonl"

stages = {}
order = []
with open(LEDGER) as f:
    for line in f:
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        name = rec.get("stage")
        if name == "__supervisor__":
            continue
        if name not in stages:
            stages[name] = {"attempts": 0, "status": "pending",
                            "elapsed_s": None, "first_start": None,
                            "reason": ""}
            order.append(name)
        s = stages[name]
        ev = rec.get("event")
        if ev == "started":
            s["attempts"] = max(s["attempts"], rec.get("attempt", 1))
            s["first_start"] = s["first_start"] or rec.get("iso")
            if s["status"] == "pending":
                s["status"] = "running"
        elif ev == "done":
            s["status"] = "done"
            s["elapsed_s"] = rec.get("elapsed_s")
        elif ev == "failed":
            s["status"] = "FAILED"
            s["elapsed_s"] = rec.get("elapsed_s")
            s["reason"] = (rec.get("reason") or f"rc={rec.get('rc')}")
        elif ev == "retry":
            s["reason"] = (rec.get("reason") or f"rc={rec.get('rc')}")

print("| stage | status | attempts | elapsed | note |")
print("|---|---|---|---|---|")
for name in order:
    s = stages[name]
    el = f"{s['elapsed_s']:.0f}s" if s["elapsed_s"] else ""
    print(f"| {name} | {s['status']} | {s['attempts']} | {el} "
          f"| {s['reason']} |")

with open("/root/repo/results/QUEUE_SUMMARY.json", "w") as f:
    json.dump(stages, f, indent=1)
print("\nwrote results/QUEUE_SUMMARY.json", file=sys.stderr)
