"""Spark function surface: native column expressions + pandas UDFs."""

from xutil_spark.functions import native
from xutil_spark.functions.geo_udfs import register_all

__all__ = ["native", "register_all"]
