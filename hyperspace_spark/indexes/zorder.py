"""Z-order covering index — implemented in a later milestone this round."""

from __future__ import annotations

from dataclasses import dataclass, field

from hyperspace_spark.indexes.base import IndexConfig


@dataclass
class ZOrderCoveringIndexConfig(IndexConfig):
    indexed_columns: list[str] = field(default_factory=list)
    included_columns: list[str] = field(default_factory=list)

    @property
    def kind(self) -> str:
        return "ZCI"

    def referenced_columns(self) -> list[str]:
        return list(self.indexed_columns) + list(self.included_columns)


def create_index_data(*args, **kwargs):
    raise NotImplementedError("z-order index build lands in this round's later milestone")


def rewrite_zorder_data(*args, **kwargs):
    raise NotImplementedError
