"""orc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference (CJJeepster/ORC: an RC-car
active-suspension capstone = streaming sensor dataflow + offline batch
statistics, per SURVEY.md).

Spark-first design: everything is declared through the DataFrame/SQL API so
Catalyst plans it; Pandas UDFs / applyInPandas appear only for genuinely
sequential recurrences (AHRS fusion, PID) and library-grade scalar math
(Student-t CDF).

Layout:
    sources/    ingestion: ORCLOG sessionized parser, testdata tables, orc/parquet/csv
    operators/  timeseries, stats, control replay, dedup, similarity, text, multimodal
    functions/  SQL-registered scalar helpers (cross-engine stable hashing, math)
    streaming/  Structured Streaming: marker sessionization, micro-batch sinks
    plans/      plan-inspection helpers (pushdown/codegen assertions)
"""

from orc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
