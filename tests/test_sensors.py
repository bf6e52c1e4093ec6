"""Tests for the sensor-path completeness operators (O11/O26/O27)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from orc_spark.operators.sensors import (
    calibrate_inertial,
    compass_heading,
    dac_write_code,
    dac_write_codes,
)


def test_dac_offsets_and_remap(spark):
    pdf = pd.DataFrame(
        {
            "act1": [100, 65000, 32768],
            "act2": [0, 50, 65535],
            "act3": [40000, 10, 0],
            "act4": [32768, 32768, 32768],
        }
    )
    df = spark.createDataFrame(pdf)
    # channel offsets: DAC1 +143 (the firmware's 32768-32625 case), DAC2 -50
    out = dac_write_codes(df, {1: 143, 2: -50}).toPandas()
    # act1 → dac_1 with +143: upper limit 65392; 65000 is under it → +143
    assert out["dac_1"].tolist() == [243, 65143, 32911]
    # act2 → dac_2 with -50: lower limit 50 → 0 clamp below
    assert out["dac_2"].tolist() == [0, 0, 65485]
    # act3 → dac_0 no offset: pass-through
    assert out["dac_0"].tolist() == [40000, 10, 0]
    assert out["dac_3"].tolist() == [32768] * 3


def test_calibrate_inertial_identity_and_scale(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0], "y": [0.5, -1.0], "z": [0.0, 3.0]})
    df = spark.createDataFrame(pdf)
    ident = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    out = calibrate_inertial(
        df, ("x", "y", "z"), ident, (2.0, 2.0, 2.0), (0.5, 0.0, 0.0)
    ).toPandas()
    np.testing.assert_allclose(out["cal_x"], (pdf["x"] - 0.5) * 2.0)
    np.testing.assert_allclose(out["cal_y"], pdf["y"] * 2.0)
    # misaligned: swap x/y
    swap = [[0, 1, 0], [1, 0, 0], [0, 0, 1]]
    out2 = calibrate_inertial(
        df, ("x", "y", "z"), swap, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0)
    ).toPandas()
    np.testing.assert_allclose(out2["cal_x"], pdf["y"])
    np.testing.assert_allclose(out2["cal_y"], pdf["x"])


def test_compass_heading_cardinal_directions(spark):
    """Flat device (accel = +z): heading from the horizontal mag component.
    ENU: mag pointing +y (north) → 0°; +x (east) → 90°."""
    pdf = pd.DataFrame(
        {
            "ax": [0.0, 0.0], "ay": [0.0, 0.0], "az": [1.0, 1.0],
            "mx": [0.0, 0.4], "my": [0.4, 0.0], "mz": [0.1, 0.1],
        }
    )
    df = spark.createDataFrame(pdf)
    out = compass_heading(df, ("ax", "ay", "az"), ("mx", "my", "mz")).toPandas()
    assert out["heading_deg"][0] == pytest.approx(0.0, abs=1e-9)
    assert out["heading_deg"][1] == pytest.approx(90.0, abs=1e-9)
