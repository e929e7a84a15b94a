#!/usr/bin/env python
"""Merge per-process ecrhook profiles into one cross-rank report.

Reference parity: bin/drhook_merge_walltime.pl — merges per-MPI-task
DR_HOOK_OPT=prof wall-clock listings (drhook.prof.N) into one table of
per-routine Avg/Min/Max/StDev self-seconds, imbalance %, call counts
and task hits, filtered by THRESHOLD_PERCENT of the average walltime.

Our per-process files are written by ecrad_tpu.utils.hooks.dump_profile
(`ecrhook.prof.<process_index>`):

    # ecrhook profile process=N walltime=<total>
    # name calls self_seconds
    <name> <calls> <self_seconds>

Usage: python tools/merge_hook_profiles.py ecrhook.prof.*
       (THRESHOLD_PERCENT env var filters small routines; default 0.1)
"""
import math
import os
import sys


def parse_profile(path):
    """Return (walltime, [(name, calls, self_seconds), ...])."""
    walltime = 0.0
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                if "walltime=" in line:
                    walltime = float(line.rsplit("walltime=", 1)[1])
                continue
            parts = line.rsplit(None, 2)
            if len(parts) == 3:
                name, calls, self_s = parts
                rows.append((name, int(calls), float(self_s)))
    return walltime, rows


def merge(profiles):
    """Aggregate [(walltime, rows)] across processes.

    Returns (stats_per_name, wall_stats) with the perl script's fields:
    per-routine n/sum/sum2/min/max self time, total calls, task hits.
    """
    acc = {}
    walls = []
    for walltime, rows in profiles:
        walls.append(walltime)
        for name, calls, self_s in rows:
            st = acc.setdefault(name, {"n": 0, "sum": 0.0, "sum2": 0.0,
                                       "min": math.inf, "max": 0.0,
                                       "calls": 0, "tasks": 0})
            st["n"] += 1
            st["sum"] += self_s
            st["sum2"] += self_s * self_s
            st["min"] = min(st["min"], self_s)
            st["max"] = max(st["max"], self_s)
            st["calls"] += calls
            st["tasks"] += 1
    nproc = len(walls)
    avg_wall = sum(walls) / nproc if nproc else 0.0
    if nproc > 1:
        var = (sum(w * w for w in walls) - nproc * avg_wall ** 2) \
            / (nproc - 1)
        stdev_wall = math.sqrt(var) if var > 0 else 0.0
    else:
        stdev_wall = 0.0
    wall_stats = {"nproc": nproc, "min": min(walls, default=0.0),
                  "max": max(walls, default=0.0), "avg": avg_wall,
                  "stdev": stdev_wall}
    return acc, wall_stats


def format_report(acc, wall_stats, threshold_percent=0.1):
    nproc = wall_stats["nproc"]
    lines = [
        f"Number of processes        : {nproc}",
        "Wall-times over %d processes (secs) : "
        "Min=%.3f, Max=%.3f, Avg=%.3f, StDev=%.3f" % (
            nproc, wall_stats["min"], wall_stats["max"],
            wall_stats["avg"], wall_stats["stdev"]),
    ]
    cutoff = threshold_percent * wall_stats["avg"] / 100.0
    lines.append(
        "Routines whose average time > %.2f%% (%.3f secs) of the "
        "total average are listed" % (threshold_percent, cutoff))
    lines.append("%7s %10s %10s %10s %8s %8s %12s %8s : %s" % (
        "Avg-%", "Avg.secs", "Min.secs", "Max.secs", "St.dev",
        "Imbal-%", "# of calls", "Tasks", "Name"))
    rows = []
    for name, st in acc.items():
        avg = st["sum"] / nproc
        rows.append((avg, name, st))
    rows.sort(reverse=True)
    for avg, name, st in rows:
        if avg <= cutoff:
            continue
        if st["n"] > 1:
            var = (st["sum2"] - st["n"] * (st["sum"] / st["n"]) ** 2) \
                / (st["n"] - 1)
            stdev = math.sqrt(var) if var > 0 else 0.0
        else:
            stdev = 0.0
        imbal = 100.0 * (st["max"] - st["min"]) / st["max"] \
            if st["max"] > 0 else 0.0
        pct = 100.0 * avg / wall_stats["avg"] if wall_stats["avg"] \
            else 0.0
        lines.append("%7.2f %10.3f %10.3f %10.3f %8.3f %8.1f "
                     "%12d %8d : %s" % (
                         pct, avg, st["min"], st["max"], stdev,
                         imbal, st["calls"], st["tasks"], name))
    return "\n".join(lines)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    threshold = float(os.environ.get("THRESHOLD_PERCENT", "0.1"))
    profiles = [parse_profile(p) for p in argv]
    acc, wall_stats = merge(profiles)
    print(format_report(acc, wall_stats, threshold))
    return 0


if __name__ == "__main__":
    sys.exit(main())
