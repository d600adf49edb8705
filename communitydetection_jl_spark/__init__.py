"""communitydetection_jl_spark — a from-scratch PySpark-native link-graph
analytics engine with the capabilities of afternone/CommunityDetection.jl.

Core contract: ``edges(src: long, dst: long, weight: double)`` DataFrames;
every algorithm is iterative DataFrame joins + groupBy aggregations with
vectorized Arrow/pandas UDFs only where built-ins can't express the
semantics. See SURVEY.md for the full blueprint.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
