"""Import side-effects populate the query registry (registry.py)."""

from bigdatasmallprice_spark.queries import relational, timeseries  # noqa: F401

try:  # populated in later build phases
    from bigdatasmallprice_spark.queries import dedupq, simq, textq  # noqa: F401
except ImportError:  # pragma: no cover
    pass
