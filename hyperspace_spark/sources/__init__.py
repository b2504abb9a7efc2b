from hyperspace_spark.sources.registry import (
    FileBasedSourceProvider,
    SourceProvider,
    provider_for,
    register_provider,
)

__all__ = [
    "SourceProvider",
    "FileBasedSourceProvider",
    "provider_for",
    "register_provider",
]
