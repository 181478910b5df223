"""Event-log straggler/gap analyzer for the scaling work.

Reads a Spark event log (JSON lines) and reports, over the app's wall span:
  - task-concurrency utilization (integral of running tasks / cores*span)
  - the largest windows with ZERO running tasks (driver-only time), each
    annotated with the stage that completed just before the gap and the one
    submitted right after — this is how round 5 found the 71 s
    constraint-propagation stall, kept as a tool this time
  - per-stage tail shape: (stage, tasks, wall, last-task finish skew)

Usage: python BENCH/evlog_gaps.py /tmp/evlog/<app-id> [cores]
"""
import json
import sys


def main(path: str, cores: int = 8) -> None:
    tasks = []          # (launch, finish)
    stages = {}         # sid -> dict
    first, last = None, None
    with open(path) as f:
        for ln in f:
            try:
                e = json.loads(ln)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerTaskEnd":
                ti = e["Task Info"]
                l0, l1 = ti["Launch Time"], ti["Finish Time"]
                tasks.append((l0, l1))
                sid = e["Stage ID"]
                s = stages.setdefault(sid, {})
                s["n"] = s.get("n", 0) + 1
                s["t0"] = min(s.get("t0", l0), l0)
                s["t1"] = max(s.get("t1", l1), l1)
                s.setdefault("fins", []).append(l1)
            elif ev == "SparkListenerStageSubmitted":
                si = e["Stage Info"]
                stages.setdefault(si["Stage ID"], {}).update(
                    name=si["Stage Name"],
                    sub=si.get("Submission Time"))
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages.setdefault(si["Stage ID"], {}).update(
                    name=si["Stage Name"],
                    comp=si.get("Completion Time"))
            elif ev == "SparkListenerApplicationStart":
                first = e["Timestamp"]
            elif ev == "SparkListenerApplicationEnd":
                last = e["Timestamp"]
    if not tasks:
        print("no tasks in log")
        return
    t0 = first or min(l for l, _ in tasks)
    t1 = last or max(f for _, f in tasks)
    span = (t1 - t0) / 1000.0

    # concurrency integral + zero-task gaps via a sweep line
    evts = []
    for l, f in tasks:
        evts.append((l, 1))
        evts.append((f, -1))
    evts.sort()
    busy_integral = 0.0
    zero_gaps = []   # (start, dur)
    cur = 0
    prev = t0
    for t, d in evts:
        if cur == 0 and t > prev:
            zero_gaps.append((prev, (t - prev) / 1000.0))
        busy_integral += cur * (t - prev)
        prev = t
        cur += d
    if prev < t1:
        zero_gaps.append((prev, (t1 - prev) / 1000.0))
    util = busy_integral / 1000.0 / (cores * span)
    print(f"wall span {span:.1f}s  task-concurrency util {util:.3f} "
          f"(cores={cores})")

    zero_gaps.sort(key=lambda g: -g[1])
    print(f"\ntop zero-task gaps (driver-only time; total "
          f"{sum(d for _, d in zero_gaps):.1f}s):")
    by_comp = sorted((s for s in stages.values() if "comp" in s),
                     key=lambda s: s["comp"])
    by_sub = sorted((s for s in stages.values() if "sub" in s),
                    key=lambda s: s["sub"])
    for gs, gd in zero_gaps[:15]:
        if gd < 0.2:
            break
        before = [s for s in by_comp if s["comp"] <= gs + 50]
        after = [s for s in by_sub if s["sub"] >= gs + gd * 1000 - 50]
        bn = before[-1]["name"].split("\n")[0][:60] if before else "?"
        an = after[0]["name"].split("\n")[0][:60] if after else "?"
        print(f"  +{(gs - t0) / 1000.0:7.1f}s  {gd:6.2f}s  after[{bn}] "
              f"next[{an}]")

    # stage tails: stages whose last task finishes far after the mean
    print("\nslowest stage tails (wall > 1s, sorted by tail skew * wall):")
    rows = []
    for sid, s in stages.items():
        if "fins" not in s or s["n"] < 2:
            continue
        wall = (s["t1"] - s["t0"]) / 1000.0
        if wall < 1.0:
            continue
        fins = sorted(s["fins"])
        med = fins[len(fins) // 2]
        tail = (fins[-1] - med) / 1000.0
        rows.append((tail, wall, sid, s["n"], s.get("name", "?")
                     .split("\n")[0][:55]))
    rows.sort(key=lambda r: -r[0])
    for tail, wall, sid, n, name in rows[:15]:
        print(f"  stage {sid:5d} n={n:4d} wall={wall:7.1f}s "
              f"tail(last-med)={tail:6.1f}s  {name}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 8)
