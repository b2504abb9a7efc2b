"""Sketches for the data-skipping index — implemented in a later milestone."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Sketch:
    columns: list[str] = field(default_factory=list)


@dataclass
class MinMaxSketch(Sketch):
    pass


@dataclass
class ValueListSketch(Sketch):
    pass


@dataclass
class BloomFilterSketch(Sketch):
    fpp: float = 0.01
    expected_items: int = 10000


@dataclass
class PartitionSketch(Sketch):
    pass


def sketch_from_json(d: dict) -> Sketch:
    kind = d.get("kind")
    cols = d.get("columns", [])
    if kind == "MinMax":
        return MinMaxSketch(cols)
    if kind == "ValueList":
        return ValueListSketch(cols)
    if kind == "Bloom":
        return BloomFilterSketch(cols, d.get("fpp", 0.01), d.get("expectedItems", 10000))
    if kind == "Partition":
        return PartitionSketch(cols)
    raise ValueError(f"unknown sketch kind {kind}")
