from orc_spark.sources.tables import TABLES, load_table, register_views
from orc_spark.sources.orclog import parse_orclog

__all__ = ["TABLES", "load_table", "register_views", "parse_orclog"]
