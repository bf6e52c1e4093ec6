"""Driver-style Spark-vs-DuckDB comparison used by the parity tests.

Mirrors what the driver's correctness gate does: run the Spark query and the
oracle SQL on the same parquet tables, then compare row count, column names,
and values (columns sorted by name, rows sorted, floats rounded to 9
significant decimals per SURVEY §7.5).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from orc_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _round_sig(x: float, sig: int = 9):
    if x is None or (isinstance(x, float) and (math.isnan(x) or math.isinf(x))):
        return x
    if x == 0:
        return 0.0
    return float(f"{x:.{sig}g}")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(lambda v: _round_sig(v) if pd.notna(v) else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: _round_sig(v) if isinstance(v, float) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> list[str]:
    """Returns a list of mismatch descriptions (empty = parity)."""
    problems = []
    s = canon(spark_df.toPandas())
    o = canon(oracle_pdf)
    if list(s.columns) != list(o.columns):
        problems.append(f"{name}: columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    if len(s) != len(o):
        problems.append(f"{name}: row count differs: spark={len(s)} oracle={len(o)}")
        return problems
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        s_float = pd.api.types.is_float_dtype(s[c])
        o_float = pd.api.types.is_float_dtype(o[c])
        if s_float != o_float and (
            pd.api.types.is_integer_dtype(s[c])
            or pd.api.types.is_integer_dtype(o[c])
        ):
            # int on one engine, float on the other: the driver's hash
            # canonicalization may decay large ints (DuckDB HUGEINT →
            # float64 loses bits past 2^53) — surface it before the driver
            # does (the dd_simhash/dp_stratified r01 failure mode)
            problems.append(
                f"{name}.{c}: dtype skew spark={s[c].dtype} oracle={o[c].dtype}"
                " (int-vs-float across engines; CAST the oracle aggregate)"
            )
            continue
        if s_float or o_float:
            # DRIVER-STRENGTH comparison (r04 postmortem): the driver hashes
            # the 9-sig-fig canonical strings, so equality must be EXACT on
            # the rounded values — np.isclose(rtol=1e-8) accepted a 1-ulp
            # divergence that crossed a rounding boundary and let
            # st_goertzel ship green locally while failing the driver.
            # canon() already rounded via float(f"{x:.9g}"), so exact float
            # equality here ⟺ equality of the hashed strings.
            sv = pd.to_numeric(s[c], errors="coerce").to_numpy(dtype=float)
            ov = pd.to_numeric(o[c], errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(sv) & np.isnan(ov)
            eq = (sv == ov) | both_nan
            if not eq.all():
                close = np.isclose(sv, ov, rtol=1e-8, atol=1e-12, equal_nan=True)
                tag = (
                    " [ULP-BOUNDARY: within 1e-8 but 9-sig-fig strings differ"
                    " — driver hash FAILS; fixed-point the recurrence]"
                    if close.all()
                    else ""
                )
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                problems.append(
                    f"{name}.{c}: {bad}/{len(eq)} values differ; first at row {idx}: "
                    f"spark={sv[idx]!r} oracle={ov[idx]!r}{tag}"
                )
            continue
        eq = np.array([a == b or (pd.isna(a) and pd.isna(b)) for a, b in zip(sv, ov)])
        if not eq.all():
            bad = int((~eq).sum())
            idx = int(np.argmax(~eq))
            problems.append(
                f"{name}.{c}: {bad}/{len(eq)} values differ; first at row {idx}: "
                f"spark={sv[idx]!r} oracle={ov[idx]!r}"
            )
    return problems
