from orc_spark.functions.stat_math import betainc_reg, student_t_cdf, student_t_sf

__all__ = ["betainc_reg", "student_t_cdf", "student_t_sf"]
