"""Index config interfaces (reference: index/Index.scala:22-168,
IndexConfigTrait.scala:46-59)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class IndexConfig:
    name: str

    @property
    def kind(self) -> str:
        raise NotImplementedError

    def referenced_columns(self) -> list[str]:
        raise NotImplementedError
