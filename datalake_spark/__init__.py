"""datalake_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of planetlabs/datalake.

Brand-new implementation (not a port): the reference's metadata-aware file
archive (S3 + DynamoDB index) is re-expressed as a data-catalog layer over a
data lake — a ``files`` metadata table queried with Spark SQL/DataFrames, a
Structured Streaming ingestion path, and the reference's query types as
DataFrame operators.  Reference semantics cited per-module as file:line into
the read-only snapshot at /root/reference.
"""

from datalake_spark.session import get_spark
from datalake_spark.metadata import Metadata, InvalidDatalakeMetadata
from datalake_spark.catalog import Catalog
from datalake_spark.query import QueryEngine

__all__ = [
    "get_spark",
    "Metadata",
    "InvalidDatalakeMetadata",
    "Catalog",
    "QueryEngine",
]

__version__ = "0.1.0"
