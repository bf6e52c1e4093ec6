"""Recommended cluster configuration for the 100 TB deployment.

The test harness runs local[32]; this module is the documented translation
to a real cluster (e.g. 1000 executors × 4 cores × 16 GiB). Nothing in the
engine depends on these values — they are the starting point an operator
would tune from, with the reasoning captured next to each knob.
"""

from __future__ import annotations


def cluster_conf(
    executors: int = 1000,
    cores_per_executor: int = 4,
    executor_mem_gib: int = 16,
) -> dict[str, str]:
    total_cores = executors * cores_per_executor
    return {
        # --- sizing ---------------------------------------------------------
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(cores_per_executor),
        "spark.executor.memory": f"{executor_mem_gib}g",
        # Arrow/pandas UDF stages fork Python workers per core: reserve
        # overhead for them (AHRS/PID/matmul kernels hold numpy arrays)
        "spark.executor.memoryOverheadFactor": "0.2",
        # --- shuffle --------------------------------------------------------
        # start at 2-3× total cores; AQE coalesces down per-stage
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
        # --- scans ----------------------------------------------------------
        # 128-256 MB splits at this scale (the local harness uses 16 MB only
        # because its files are MB-sized); row-group pruning does the rest
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.files.openCostInBytes": "4m",
        # --- joins ----------------------------------------------------------
        # all dimension tables of the star schema stay broadcastable well
        # past sf1000; fact-fact joins rely on AQE + bucketing
        "spark.sql.autoBroadcastJoinThreshold": "256m",
        # --- python ---------------------------------------------------------
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # bound each in-flight Arrow batch (multimodal payloads ride here)
        "spark.sql.orc.impl": "native",
        "spark.sql.orc.filterPushdown": "true",
        # --- shuffle service / storage --------------------------------------
        "spark.shuffle.service.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }
