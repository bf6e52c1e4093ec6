"""Copy-cleanliness regression test (VERDICT r08 directive 6): the judge's
independent 55-char shared-substring scan, promoted into CI.

Every 55-char window (stride 7) of the six reference source files is checked
against every non-test repo .py file; any verbatim overlap fails. Two filter
classes keep it signal-only (both adjudicated false-positive by the r08
judge): windows dominated by a single repeated character (comment separator
dash/star runs) and windows that are mostly indentation (< 25 non-whitespace
chars — e.g. a bare `except ValueError:` line, four tokens of standard
Python). A genuinely copied code line is dense; it passes neither filter.

Stride 7 on the reference side means a SIGNAL-DENSE overlap is guaranteed
to be caught once it spans >= 55 + 6 = 61 characters; the repo side scans
every offset. The guarantee does not extend to overlaps whose stride-aligned
windows are themselves filtered out (separator-run or indentation-dominated
regions) — those can slip through, which is acceptable because they carry no
copyable logic.
"""

import collections
import glob
import os

import pytest

REFERENCE_SOURCES = [
    "/root/reference/Python Plotting/main.py",
    "/root/reference/ESP source/main/ORC_Main.c",
    "/root/reference/ESP source/components/Fusion/FusionAhrs.c",
    "/root/reference/ESP source/components/Fusion/FusionMath.h",
    "/root/reference/ESP source/components/PID/PID.c",
    "/root/reference/ESP source/components/Transfom/Transform.c",
]
WINDOW = 55
STRIDE = 7
MIN_DENSITY = 25  # non-whitespace chars a window needs to count as signal
MAX_CHAR_RUN = 40  # most-common-char count above which it's a separator run

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _signal(w: str) -> bool:
    if collections.Counter(w).most_common(1)[0][1] >= MAX_CHAR_RUN:
        return False
    return sum(1 for c in w if not c.isspace()) >= MIN_DENSITY


@pytest.mark.skipif(
    not all(os.path.exists(p) for p in REFERENCE_SOURCES),
    reason="reference snapshot not present",
)
def test_no_verbatim_reference_overlap():
    windows: dict[str, str] = {}
    for f in REFERENCE_SOURCES:
        txt = open(f, encoding="utf-8", errors="replace").read()
        for i in range(0, len(txt) - WINDOW + 1, STRIDE):
            w = txt[i : i + WINDOW]
            if _signal(w):
                windows.setdefault(w, f)
    assert len(windows) > 5000, "reference scan degenerated — check paths"

    repo_files = [
        p
        for p in glob.glob(os.path.join(REPO_ROOT, "**", "*.py"), recursive=True)
        if f"{os.sep}tests{os.sep}" not in p and f"{os.sep}.git{os.sep}" not in p
    ]
    assert len(repo_files) > 30, "repo scan degenerated — check glob"

    hits = []
    for p in repo_files:
        txt = open(p, encoding="utf-8", errors="replace").read()
        seen = set()
        for i in range(len(txt) - WINDOW + 1):
            w = txt[i : i + WINDOW]
            if w in windows and w not in seen:
                seen.add(w)
                hits.append((p, windows[w], w))
    assert hits == [], "verbatim >=55-char overlap with reference sources:\n" + "\n".join(
        f"{p} <- {src}: {w!r}" for p, src, w in hits[:10]
    )
