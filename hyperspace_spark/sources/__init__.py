from hyperspace_spark.sources.registry import (
    DeltaLakeSourceProvider,
    FileBasedSourceProvider,
    SourceProvider,
    provider_for,
    register_provider,
)

__all__ = [
    "SourceProvider",
    "DeltaLakeSourceProvider",
    "FileBasedSourceProvider",
    "provider_for",
    "register_provider",
]
