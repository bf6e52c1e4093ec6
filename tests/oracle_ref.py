"""Reference-pipeline oracle, written fresh in numpy.

Mirrors the documented semantics of the reference analytics
(`Python Plotting/main.py`, see SURVEY.md §2.A O15-O22) so Spark results can
be asserted equal. The container image has no scipy, so
``scipy.signal.medfilt`` / ``scipy.stats.ttest_ind`` are replaced by exact
numpy equivalents (zero-padded sliding median; closed-form Welch + an
independently-tested Student-t CDF in orc_spark.functions.stat_math).
"""

from __future__ import annotations

import csv
from collections import defaultdict

import numpy as np

from orc_spark.functions.stat_math import medfilt_zero_padded, welch_ttest_np


def parse_log(path: str):
    """State-machine parse → {group: {metric: [runs...]}} in file order."""
    store: dict = defaultdict(lambda: {"accel": [], "pitch": [], "roll": [], "time": []})
    cur_log = None
    status = None
    interval = 1.0
    run_no = 0
    with open(path, "r") as fh:
        for row in csv.reader(fh):
            if not row:
                continue
            head = row[0]
            if head.startswith("Log #"):
                cur_log = head
                run_no = 0
            elif "Actuators" in head:
                status = head
            elif head.startswith("Interval:"):
                try:
                    interval = float(head.split(":")[1].strip())
                    for m in store[f"{status}"].values():
                        m.append([])
                except ValueError:
                    interval = 1.0
            elif len(row) == 3 and cur_log and status:
                try:
                    a, p, r = map(float, row)
                except ValueError:
                    continue
                g = store[f"{status}"]
                # The reference (main.py:51-54) would raise IndexError here if
                # a data row arrives before any "Interval:" created run lists
                # for this group — a crash, i.e. undefined behavior. The
                # engine's documented choice is to accept the row (interval
                # fallback 1.0); the oracle mirrors that by padding.
                while len(g["accel"]) <= run_no:
                    for m in g.values():
                        m.append([])
                g["accel"][run_no].append(a)
                g["pitch"][run_no].append(p)
                g["roll"][run_no].append(r)
                g["time"][run_no].append(len(g["time"][run_no]) * interval)
            elif head.startswith("Log Paused"):
                run_no += 1
                for m in store[f"{status}"].values():
                    m.append([])
    return store


def filtered_runs(store, metric: str, derivative: bool = False):
    """{group: [np.array per run]} after medfilt(15) (+ optional gradient)."""
    out = {}
    for grp, metrics in store.items():
        runs = []
        for run in metrics[metric]:
            x = medfilt_zero_padded(np.asarray(run, dtype=np.float64), 15)
            if derivative:
                x = np.gradient(x)
            runs.append(x)
        out[grp] = runs
    return out


def run_stats(runs):
    """[(rms, min, max)] per run."""
    out = []
    for x in runs:
        out.append((float(np.sqrt(np.mean(np.square(x)))), float(np.min(x)), float(np.max(x))))
    return out


def welch(pop_a, pop_b, alternative):
    t, p, _dof = welch_ttest_np(pop_a, pop_b, alternative)
    return float(t), float(p)
