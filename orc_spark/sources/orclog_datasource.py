"""`orclog` as a first-class Spark data source (Python DataSource API).

Registers the firmware-log format so users can write

    spark.dataSource.register(OrclogDataSource)
    spark.read.format("orclog").load("/path/to/logs")

One input partition per log file (the files are MB-scale by firmware
session rotation, so file granularity is the right parallelism — same
contract as sources/orclog.py). The row-generation semantics mirror the
declarative parser `parse_orclog` line for line (reference
`Python Plotting/main.py:22-65`); equality of the two paths is asserted in
tests/test_orclog_datasource.py, including on the real 129k-row log.

This is the CONVENIENCE path: rows are produced in Python. The plan-based
parser (sources/orclog.py) remains the fast path — pure JVM, window
functions, whole-stage codegen. Use the data source where ergonomics beat
raw throughput (ad-hoc sessions, spark-sql CLI users).
"""

from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from orc_spark.sources.orclog import ORCLOG_SCHEMA

_LOG_RE = re.compile(r"Log #:?\s*(-?\d+)")


def _try_float(s: str) -> float | None:
    try:
        return float(s)
    except ValueError:
        return None


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            p for p in glob.glob(os.path.join(path, "*")) if os.path.isfile(p)
        )
    return sorted(glob.glob(path))


def parse_orclog_file(path: str) -> Iterator[tuple]:
    """Yield ORCLOG_SCHEMA tuples for one log file (reference state machine)."""
    with open(path, "r", errors="replace") as fh:
        text = fh.read()
    log_id: int | None = None
    act: bool | None = None
    interval = 1.0
    run_idx = 0
    sample_counter: dict[tuple, int] = defaultdict(int)
    for line_no, line in enumerate(re.split(r"\r?\n", text)):
        field0 = line.split(",")[0]
        if field0.startswith("Log #"):
            run_idx = 0
            m = _LOG_RE.search(field0)
            if m:
                log_id = int(m.group(1))
            continue
        if "Actuators" in field0:
            act = "enabled" in field0
            continue
        if field0.startswith("Interval:"):
            v = _try_float(field0.rsplit(":", 1)[-1].strip())
            interval = v if v is not None else 1.0
            continue
        if field0.startswith("Log Paused"):
            run_idx += 1
            continue
        parts = line.split(",")
        if len(parts) != 3 or log_id is None or act is None:
            continue
        vals = [_try_float(p.strip()) for p in parts]
        if any(v is None for v in vals):
            continue
        k = (act, run_idx)
        sample_idx = sample_counter[k]
        sample_counter[k] += 1
        yield (
            path,
            line_no,
            log_id,
            act,
            interval,
            run_idx,
            sample_idx,
            sample_idx * interval,
            vals[0],
            vals[1],
            vals[2],
        )


class OrclogReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("orclog source requires a path: .load('<path>')")
        self.files = _expand(path)

    def partitions(self):
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from parse_orclog_file(partition.value)


class OrclogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "orclog"

    def schema(self):
        return ORCLOG_SCHEMA

    def reader(self, schema) -> OrclogReader:
        return OrclogReader(self.options)
