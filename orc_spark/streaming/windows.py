"""Structured Streaming event-time surface: tumbling/sliding/session windows
with watermarks (SURVEY §2.C R8) plus a stateful streaming PID.

The batch-replay equivalents (r8_*) are the hash-checked correctness surface;
these run the same logic as real streams (file source → watermark → windowed
agg → sink) and are asserted batch==stream in tests.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from orc_spark.operators.control import pid_params


def stream_event_windows(
    events: DataFrame,
    kind: str = "tumbling",
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = "15 minutes",
    gap: str = "30 minutes",
) -> DataFrame:
    """Windowed aggregation over a (streaming or batch) events DataFrame with
    a `ts` timestamp column. Late rows beyond the watermark are dropped by
    the engine in streaming mode."""
    ev = events.withWatermark("ts", watermark)
    if kind == "tumbling":
        win = F.window("ts", window)
    elif kind == "sliding":
        win = F.window("ts", window, slide)
    elif kind == "session":
        win = F.session_window("ts", gap)
    else:
        raise ValueError(kind)
    return ev.groupBy(win, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")
    ).select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "event_type",
        "n_events",
        "sum_value",
    )


# --- stateful streaming PID (O9 as a stream operator) -----------------------

_PID_STATE_SCHEMA = T.StructType(
    [
        T.StructField("integ", T.DoubleType()),
        T.StructField("prev_err", T.DoubleType()),
        T.StructField("diff", T.DoubleType()),
        T.StructField("prev_m", T.DoubleType()),
    ]
)


def pid_stream_output_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            key_field,
            T.StructField("ord", T.LongType()),
            T.StructField("meas", T.DoubleType()),
            T.StructField("pid_out", T.DoubleType()),
        ]
    )


def make_pid_stateful_fn(params: dict, setpoint: float = 0.0):
    """Builds the applyInPandasWithState function: continues the PID
    recurrence across micro-batches via 4 floats of group state. Float64
    (streaming mode documents f64; strict-f32 replay is the batch path)."""
    kp, ki, kd = params["kp"], params["ki"], params["kd"]
    T_, tau = params["T"], params["tau"]
    lim_min, lim_max = params["lim_min"], params["lim_max"]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            integ, prev_err, diff, prev_m = state.get
        else:
            integ = prev_err = diff = prev_m = 0.0
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ord")
            m = pdf["meas"].to_numpy()
            out = []
            for mi in m:
                err = setpoint - mi
                prop = kp * err
                integ = integ + 0.5 * ki * T_ * (err + prev_err)
                lim_max_int = lim_max - prop if lim_max > prop else 0.0
                lim_min_int = lim_min - prop if lim_min < prop else 0.0
                # exact clamp branch order of PID.c:55-60
                if integ > lim_max_int:
                    integ = lim_max_int
                elif integ < lim_min_int:
                    integ = lim_min_int
                diff = (-2.0 * kd * (mi - prev_m) + (2.0 * tau - T_) * diff) / (
                    2.0 * tau + T_
                )
                o = prop + integ + diff
                if o > lim_max:
                    o = lim_max
                elif o < lim_min:
                    o = lim_min
                # raw float output, matching batch pid_scan (callers truncate
                # to int16 for DAC codes)
                out.append(o)
                prev_err, prev_m = err, mi
            pdf = pdf.copy()
            pdf["pid_out"] = out
            outs.append(pdf)
        state.update((float(integ), float(prev_err), float(diff), float(prev_m)))
        yield from outs

    return fn


def pid_streaming(
    stream_df: DataFrame,
    key_col: str,
    params: dict,
    setpoint: float = 0.0,
) -> DataFrame:
    """Apply the stateful PID to a streaming DataFrame with columns
    (key_col, ord, meas). Output mode must be 'append'/'update'."""
    key_field = stream_df.schema[key_col]
    return stream_df.groupBy(key_col).applyInPandasWithState(
        make_pid_stateful_fn(params, setpoint),
        outputStructType=pid_stream_output_schema(key_field),
        stateStructType=_PID_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- PID via transformWithStateInPandas (Spark 4 stateful API) ---------------

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PidStatefulProcessor(StatefulProcessor):
        """The same PID recurrence as make_pid_stateful_fn, expressed through
        the modern transformWithStateInPandas API (typed ValueState handle,
        RocksDB-backed): state is the identical 4-double tuple, so
        stream == batch holds by the same argument. Kept alongside the
        applyInPandasWithState operator to cover both stateful surfaces."""

        def __init__(self, params: dict, setpoint: float = 0.0):
            self._params = dict(params)
            self._setpoint = setpoint

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("pid", _PID_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            p = self._params
            kp, ki, kd = p["kp"], p["ki"], p["kd"]
            T_, tau = p["T"], p["tau"]
            lim_min, lim_max = p["lim_min"], p["lim_max"]
            setpoint = self._setpoint
            st = self._state.get() if self._state.exists() else None
            integ, prev_err, diff, prev_m = st or (0.0, 0.0, 0.0, 0.0)
            outs = []
            for pdf in rows:
                pdf = pdf.sort_values("ord")
                out = []
                for mi in pdf["meas"].to_numpy():
                    err = setpoint - mi
                    prop = kp * err
                    integ = integ + 0.5 * ki * T_ * (err + prev_err)
                    lim_max_int = lim_max - prop if lim_max > prop else 0.0
                    lim_min_int = lim_min - prop if lim_min < prop else 0.0
                    if integ > lim_max_int:
                        integ = lim_max_int
                    elif integ < lim_min_int:
                        integ = lim_min_int
                    diff = (-2.0 * kd * (mi - prev_m) + (2.0 * tau - T_) * diff) / (
                        2.0 * tau + T_
                    )
                    o = prop + integ + diff
                    if o > lim_max:
                        o = lim_max
                    elif o < lim_min:
                        o = lim_min
                    out.append(o)
                    prev_err, prev_m = err, mi
                pdf = pdf.copy()
                pdf["pid_out"] = out
                outs.append(pdf)
            self._state.update(
                (float(integ), float(prev_err), float(diff), float(prev_m))
            )
            yield from outs

        def close(self) -> None:
            pass

    def pid_streaming_tws(
        stream_df: DataFrame,
        key_col: str,
        params: dict,
        setpoint: float = 0.0,
    ) -> DataFrame:
        """transformWithStateInPandas route for the stateful PID. Requires the
        RocksDB state store (set on the session here — the TWS operator does
        not support the default HDFS-backed provider) AND the
        ``google.protobuf`` Python package (the TWS driver worker speaks
        protobuf to the JVM). This container ships no protobuf, so the test
        for this route skips here and the applyInPandasWithState operator
        above remains the exercised stateful path; on a standard cluster
        image (protobuf is a pyspark[connect] dependency) this route runs
        as-is."""
        stream_df.sparkSession.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        key_field = stream_df.schema[key_col]
        return stream_df.groupBy(key_col).transformWithStateInPandas(
            PidStatefulProcessor(params, setpoint),
            outputStructType=pid_stream_output_schema(key_field),
            outputMode="append",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - Spark < 4 fallback
    PidStatefulProcessor = None  # type: ignore[assignment]
    pid_streaming_tws = None  # type: ignore[assignment]


# --- stateful streaming AHRS (O4 as a stream operator) -----------------------

_AHRS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("qw", T.DoubleType()),
        T.StructField("qx", T.DoubleType()),
        T.StructField("qy", T.DoubleType()),
        T.StructField("qz", T.DoubleType()),
        T.StructField("initialising", T.BooleanType()),
        T.StructField("ramped_gain", T.DoubleType()),
        T.StructField("rec_trigger", T.IntegerType()),
        T.StructField("rec_timeout", T.IntegerType()),
    ]
)

_AHRS_STREAM_COLS = ["gy_x", "gy_y", "gy_z", "ax_x", "ax_y", "ax_z"]


def ahrs_stream_output_schema(key_field: T.StructField) -> T.StructType:
    from orc_spark.operators.ahrs import AHRS_OUT_FIELDS

    return T.StructType(
        [key_field, T.StructField("ord", T.LongType())]
        + [T.StructField(n, t) for n, t in AHRS_OUT_FIELDS]
    )


def make_ahrs_stateful_fn(settings, key_col: str):
    """applyInPandasWithState function continuing the AHRS fusion recurrence
    (anchor FusionAhrs.c:113-217) across micro-batches via the 8-value state
    tuple of ahrs_scan_fast_f64. Float64 streaming mode, same contract as the
    stateful PID above; the strict-f32 firmware replay stays the batch path."""
    import numpy as np

    from orc_spark.operators.ahrs import AHRS_OUT_FIELDS, ahrs_scan_fast_f64

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = tuple(state.get) if state.exists else None
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ord")
            res, st = ahrs_scan_fast_f64(
                pdf[["gy_x", "gy_y", "gy_z"]].to_numpy(dtype=np.float64),
                pdf[["ax_x", "ax_y", "ax_z"]].to_numpy(dtype=np.float64),
                settings,
                init_state=st,
                return_state=True,
            )
            out = pdf[[key_col, "ord"]].copy()
            for name, _ in AHRS_OUT_FIELDS:
                out[name] = res[name]
            outs.append(out)
        if st is not None:
            state.update(
                (
                    float(st[0]), float(st[1]), float(st[2]), float(st[3]),
                    bool(st[4]), float(st[5]), int(st[6]), int(st[7]),
                )
            )
        yield from outs

    return fn


def ahrs_streaming(stream_df: DataFrame, key_col: str, settings=None) -> DataFrame:
    """Apply the stateful AHRS to a streaming DataFrame with columns
    (key_col, ord, gy_x, gy_y, gy_z, ax_x, ax_y, ax_z). One run (group) never
    spans executors; parallelism is across runs, identical to the batch
    ahrs_replay contract."""
    from orc_spark.operators.ahrs import AhrsSettings

    settings = settings or AhrsSettings()
    key_field = stream_df.schema[key_col]
    return stream_df.groupBy(key_col).applyInPandasWithState(
        make_ahrs_stateful_fn(settings, key_col),
        outputStructType=ahrs_stream_output_schema(key_field),
        stateStructType=_AHRS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
