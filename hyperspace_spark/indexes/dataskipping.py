"""Data-skipping index — implemented in a later milestone this round."""

from __future__ import annotations

from dataclasses import dataclass, field

from hyperspace_spark.indexes.base import IndexConfig


@dataclass
class DataSkippingIndexConfig(IndexConfig):
    sketches: list = field(default_factory=list)

    @property
    def kind(self) -> str:
        return "DS"

    def referenced_columns(self) -> list[str]:
        return [c for s in self.sketches for c in s.columns]


def create_index_data(*args, **kwargs):
    raise NotImplementedError("data-skipping index build lands in this round's later milestone")


def refresh_incremental(*args, **kwargs):
    raise NotImplementedError
