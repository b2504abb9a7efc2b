from hyperspace_spark.metadata.entry import (
    FileInfo,
    FileIdTracker,
    IndexLogEntry,
    Relation,
    States,
)
from hyperspace_spark.metadata.log_manager import IndexLogManager
from hyperspace_spark.metadata.signature import file_based_signature

__all__ = [
    "FileInfo",
    "FileIdTracker",
    "IndexLogEntry",
    "Relation",
    "States",
    "IndexLogManager",
    "file_based_signature",
]
