"""Shared host-health metrics for the BENCH harnesses.

One definition, one return convention — ``cpu_ticks() -> (steal, total)``
jiffies — because the sibling scripts grew hand copies and one of them
inverted the tuple order; a transposed copy silently reports ~0% or ~100%
steal and poisons the host-gating evidence. (bench.py keeps its own
private ``_cpu_ticks`` deliberately: it is the driver-facing entry point
and stays free of intra-repo file imports.)
"""
from __future__ import annotations


def cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — hypervisor steal is this
    shared-host VM's dominant variance source. (0, 0) on hosts without
    /proc so steal_pct reads 0 instead of crashing a harness."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
    except OSError:
        return 0, 0
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 2) if dt else 0.0
