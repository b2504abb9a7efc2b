from hyperspace_spark.sources.registry import (
    DeltaLakeSourceProvider,
    FileBasedSourceProvider,
    IcebergSourceProvider,
    SourceProvider,
    provider_for,
    register_provider,
)

__all__ = [
    "SourceProvider",
    "DeltaLakeSourceProvider",
    "IcebergSourceProvider",
    "FileBasedSourceProvider",
    "provider_for",
    "register_provider",
]
