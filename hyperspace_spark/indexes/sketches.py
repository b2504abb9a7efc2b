"""Sketches: per-file aggregates + predicate converters for data skipping.

Reference: dataskipping/sketches/Sketch.scala (trait), MinMaxSketch.scala
:45-100, PartitionSketch.scala:38-74, BloomFilterSketch.scala:30-86, and
ValueListSketch (reference ships it as an undocumented extra sketch kind).

Each sketch contributes (a) aggregate columns computed per source file
during the build's ``groupBy(input_file_name())`` pass, and (b) a
predicate converter: source predicate -> SQL over the sketch columns that
is TRUE whenever the file MIGHT contain matching rows (soundness:
conversion may only over-approximate, never drop a matching file).

The Bloom filter is a pure-Python/numpy double-hashing filter evaluated
through vectorized pandas UDFs (Arrow batches) — the build aggregates
per file (small groups), the probe runs over the tiny index DataFrame
(one row per source file), so Python cost is bounded by file count, not
row count, even at 100 TB.
"""

from __future__ import annotations

import hashlib
import math
import struct
from dataclasses import dataclass, field

from hyperspace_spark.planner.expr import Attr, Cmp, Expr, InExpr, Lit, NullTest


@dataclass
class Sketch:
    columns: list[str] = field(default_factory=list)

    @property
    def kind(self) -> str:
        raise NotImplementedError

    @property
    def column(self) -> str:
        return self.columns[0]

    def prefix(self) -> str:
        return f"{self.kind}_{self.column}"

    def agg_exprs(self):
        """[(Column, output_name)] computed per source file."""
        raise NotImplementedError

    def convert(self, e: Expr) -> str | None:
        """Leaf predicate on self.column -> SQL over sketch columns, or None."""
        raise NotImplementedError

    def to_json(self) -> dict:
        return {"kind": self.kind, "columns": list(self.columns)}


def _is_attr(e: Expr, name: str | None = None) -> bool:
    return isinstance(e, Attr) and (name is None or e.name == name)


# Casts that are exact and order-preserving, so a predicate on
# CAST(col AS wide) translates soundly to a min/max-style probe on the raw
# column (SQL's implicit coercion applies the same widening to the stored
# stats at probe time).  Everything else (timestamp→date truncation,
# string→numeric, long→double precision loss, ...) must NOT be unwrapped:
# the converter returns None and the file falls back to TRUE (kept).
# (typeName spellings as produced by Catalyst DataType.typeName.)
SAFE_WIDENING = frozenset(
    {
        ("byte", "short"), ("byte", "integer"), ("byte", "long"),
        ("byte", "float"), ("byte", "double"),
        ("short", "integer"), ("short", "long"),
        ("short", "float"), ("short", "double"),
        ("integer", "long"), ("integer", "double"),
        ("float", "double"),
        ("date", "timestamp"), ("date", "timestamp_ntz"),
    }
)


def _attr_widening_ok(e: Expr, name: str) -> bool:
    """Attr matches `name` and any wrapping cast is a safe exact widening."""
    return (
        isinstance(e, Attr)
        and e.name == name
        and (not e.cast_to or (e.dtype, e.cast_to) in SAFE_WIDENING)
    )


def _attr_exact_ok(e: Expr, name: str) -> bool:
    """Attr matches `name` with NO cast — required for hash/equality sketches
    (Bloom, Partition) whose stored representation is type-sensitive."""
    return isinstance(e, Attr) and e.name == name and not e.cast_to


@dataclass
class MinMaxSketch(Sketch):
    """Min/max per file (reference: MinMaxSketch.scala:45-100)."""

    @property
    def kind(self) -> str:
        return "MinMax"

    # IN lists up to this size emit the short-circuiting OR-chain (codegen
    # friendly); above it, one array literal + an exists() lambda keeps the
    # expression tree bounded (~n literals in ONE constructor vs ~4n
    # AND/OR/cmp nodes).  Equivalent role to the reference's binary-search
    # expression (SortedArrayLowerBound.scala:30-102): the probe is linear,
    # but it runs once per FILE row of sketch data — thousands of rows —
    # so tree size, not probe cost, is what matters at 1,000 literals.
    _INSET_CHAIN_MAX = 64

    @staticmethod
    def _any_literal_in_range(values, lo: str, hi: str) -> str:
        if len(values) <= MinMaxSketch._INSET_CHAIN_MAX:
            parts = [f"({lo} <= {v.sql} AND {hi} >= {v.sql})" for v in values]
            return "(" + " OR ".join(parts) + ")"
        arr = ", ".join(v.sql for v in values)
        return f"exists(array({arr}), _hs_x -> {lo} <= _hs_x AND {hi} >= _hs_x)"

    def agg_exprs(self):
        from pyspark.sql import functions as F

        c = self.column
        return [(F.min(c), f"{self.prefix()}__min"), (F.max(c), f"{self.prefix()}__max")]

    def convert(self, e: Expr) -> str | None:
        lo, hi = f"`{self.prefix()}__min`", f"`{self.prefix()}__max`"
        if isinstance(e, Cmp) and _attr_widening_ok(e.left, self.column) and isinstance(e.right, Lit):
            v = e.right.sql
            if e.op in ("=", "<=>"):
                return f"({lo} <= {v} AND {hi} >= {v})"
            if e.op == "<":
                return f"{lo} < {v}"
            if e.op == "<=":
                return f"{lo} <= {v}"
            if e.op == ">":
                return f"{hi} > {v}"
            if e.op == ">=":
                return f"{hi} >= {v}"
        if isinstance(e, InExpr) and _attr_widening_ok(e.child, self.column) and e.values:
            return self._any_literal_in_range(e.values, lo, hi)
        if isinstance(e, NullTest) and _is_attr(e.child, self.column) and not e.is_null:
            # min is null iff the file holds no non-null value.  Sound under
            # ANY cast: CAST(x) IS NOT NULL implies x IS NOT NULL.
            return f"{lo} IS NOT NULL"
        return None


@dataclass
class ValueListSketch(Sketch):
    """Sorted distinct values per file; precise for low-cardinality columns."""

    @property
    def kind(self) -> str:
        return "ValueList"

    def agg_exprs(self):
        from pyspark.sql import functions as F

        c = self.column
        return [(F.sort_array(F.collect_set(c)), f"{self.prefix()}__values")]

    def convert(self, e: Expr) -> str | None:
        vals = f"`{self.prefix()}__values`"
        # try_element_at: an all-NULL file stores an empty array; plain
        # element_at throws under Spark 4 ANSI mode.  NULL result → file
        # dropped, which is sound for range/equality (no non-null value).
        vmin = f"try_element_at({vals}, 1)"
        vmax = f"try_element_at({vals}, -1)"
        if isinstance(e, Cmp) and isinstance(e.right, Lit):
            v = e.right.sql
            if _attr_exact_ok(e.left, self.column):
                if e.op in ("=", "<=>"):
                    return f"array_contains({vals}, {v})"
            elif not _attr_widening_ok(e.left, self.column):
                return None
            elif e.op in ("=", "<=>"):
                # Widened equality: membership probe would need an array
                # cast; the min/max range form is sound and coercion-safe.
                return f"({vmin} <= {v} AND {vmax} >= {v})"
            if isinstance(e.left, Attr) and e.left.name == self.column:
                if e.op in ("<", "<="):
                    return f"{vmin} {e.op} {v}"
                if e.op in (">", ">="):
                    return f"{vmax} {e.op} {v}"
        if isinstance(e, InExpr) and e.values:
            if _attr_exact_ok(e.child, self.column):
                arr = ", ".join(v.sql for v in e.values)
                return f"arrays_overlap({vals}, array({arr}))"
            if _attr_widening_ok(e.child, self.column):
                return MinMaxSketch._any_literal_in_range(e.values, vmin, vmax)
        if isinstance(e, NullTest) and _is_attr(e.child, self.column) and not e.is_null:
            return f"size({vals}) > 0"
        return None


@dataclass
class PartitionSketch(Sketch):
    """First (null-safe) value per file — exact for partitioning columns,
    where every row of a file shares the value (reference:
    PartitionSketch.scala:38-74, FirstNullSafe shim)."""

    @property
    def kind(self) -> str:
        return "Partition"

    def agg_exprs(self):
        from pyspark.sql import functions as F

        return [(F.first(self.column, ignorenulls=False), f"{self.prefix()}__value")]

    def convert(self, e: Expr) -> str | None:
        # Exact type match required: the stored value is the raw column;
        # a cast-wrapped predicate (e.g. CAST(part_date AS TIMESTAMP))
        # could disagree with the raw comparison for truncating casts.
        val = f"`{self.prefix()}__value`"
        if isinstance(e, Cmp) and _attr_exact_ok(e.left, self.column) and isinstance(e.right, Lit):
            return f"{val} {e.op} {e.right.sql}"
        if isinstance(e, InExpr) and _attr_exact_ok(e.child, self.column) and e.values:
            arr = ", ".join(v.sql for v in e.values)
            return f"{val} IN ({arr})"
        if isinstance(e, NullTest) and _attr_exact_ok(e.child, self.column):
            return f"{val} IS {'NULL' if e.is_null else 'NOT NULL'}"
        return None


@dataclass
class RowCountSketch(Sketch):
    """Per-file row count.  Never a skip predicate — it powers the
    metadata-only aggregation rewrite (``count(*)`` answered from the
    index without touching the source), the generalization of the
    manifest-level count Delta/Iceberg serve from metadata.  Extension
    beyond the reference: its sketches are filter-only
    (dataskipping/sketches/*.scala); per-file counts make deletes
    exactly subtractable (drop the file's row) and appends exactly
    additive (raw partial over just the new files)."""

    @property
    def kind(self) -> str:
        return "RowCount"

    @property
    def column(self) -> str:
        return ""

    def prefix(self) -> str:
        return "RowCount"

    def agg_exprs(self):
        from pyspark.sql import functions as F

        return [(F.count(F.lit(1)), "RowCount__cnt")]

    def convert(self, e: Expr) -> str | None:
        return None


@dataclass
class SumSketch(Sketch):
    """Per-file sum + non-null count of one column.  Never a skip
    predicate — powers metadata-only ``sum(col)`` / ``count(col)`` /
    ``avg(col)`` rewrites (sum of per-file sums is the global sum; the
    pair gives avg).  Same extension rationale as RowCountSketch."""

    @property
    def kind(self) -> str:
        return "Sum"

    def agg_exprs(self):
        from pyspark.sql import functions as F

        c = self.column
        return [
            (F.sum(c), f"{self.prefix()}__sum"),
            (F.count(c), f"{self.prefix()}__cnt"),
        ]

    def convert(self, e: Expr) -> str | None:
        return None


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------
def _bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _hash2(value) -> tuple[int, int]:
    # Normalize so build (pandas may widen int columns with nulls to float)
    # and probe (literal parsed from SQL) hash identically.
    if isinstance(value, float) and value.is_integer():
        value = int(value)
    d = hashlib.md5(repr(value).encode("utf-8")).digest()
    h1, h2 = struct.unpack("<QQ", d)
    return h1, h2 | 1


def bloom_build(values, m: int, k: int) -> bytes:
    import numpy as np

    bits = np.zeros(m // 8, dtype=np.uint8)
    for v in values:
        if v is None:
            continue
        h1, h2 = _hash2(v)
        for i in range(k):
            idx = (h1 + i * h2) % m
            bits[idx >> 3] |= 1 << (idx & 7)
    return bits.tobytes()


def bloom_might_contain(blob: bytes, value, m: int, k: int) -> bool:
    if blob is None:
        return True
    h1, h2 = _hash2(value)
    for i in range(k):
        idx = (h1 + i * h2) % m
        if not (blob[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True


@dataclass
class BloomFilterSketch(Sketch):
    """Per-file Bloom filter for point/IN lookups on high-cardinality
    columns (reference: BloomFilterSketch.scala + BloomFilterAgg.scala,
    rebuilt as a pandas grouped-agg UDF; SURVEY §7 H4)."""

    fpp: float = 0.01
    expected_items: int = 10000

    @property
    def kind(self) -> str:
        return "Bloom"

    def params(self) -> tuple[int, int]:
        return _bloom_params(self.expected_items, self.fpp)

    def agg_exprs(self):
        from pyspark.sql import functions as F
        from pyspark.sql.types import BinaryType

        m, k = self.params()

        def _agg(s):
            return bloom_build(s.dropna().tolist(), m, k)

        bloom_agg = F.pandas_udf(_agg, BinaryType(), F.PandasUDFType.GROUPED_AGG)
        return [(bloom_agg(self.column), f"{self.prefix()}__bloom")]

    def convert(self, e: Expr) -> str | None:
        """Bloom probes need Python values, not SQL — handled specially by
        the translator via `probe_values`; this returns a marker."""
        return None

    # Build hashes pandas-native values; probe hashes parsed SQL literals.
    # Only types where those representations provably agree are probed —
    # date/timestamp/binary columns arrive as pandas Timestamps at build
    # but as strings from the literal parser, so probing them would prune
    # EVERY file (unsound).  float32 is excluded too: at build pandas
    # widens float32 values to float64 (0.1f -> 0.10000000149011612)
    # while the parsed literal is the clean double (0.1), so the probe
    # hashes a different value and prunes files that DO contain matches.
    # Unsupported types simply skip pruning.
    _PROBE_SAFE_DTYPES = {
        # Catalyst typeName() spellings + common aliases.
        "byte", "short", "integer", "long", "double", "string",
        "tinyint", "smallint", "int", "bigint",
    }

    def _safe_lit(self, lit: Lit):
        if lit.dtype not in self._PROBE_SAFE_DTYPES or lit.is_null:
            return None
        return _lit_python(lit)

    def probe_values(self, e: Expr) -> list | None:
        """Python literal values to probe, or None if not convertible.

        Exact type match required (no cast): the filter hashed raw column
        values at build time; a widened/truncated probe value hashes
        differently and would prune files that DO contain matches."""
        if isinstance(e, Cmp) and e.op in ("=", "<=>") and _attr_exact_ok(e.left, self.column) and isinstance(e.right, Lit):
            v = self._safe_lit(e.right)
            return None if v is None else [v]
        if isinstance(e, InExpr) and _attr_exact_ok(e.child, self.column) and e.values:
            vals = [self._safe_lit(v) for v in e.values]
            if any(v is None for v in vals):
                return None
            return vals
        return None

    def to_json(self) -> dict:
        return {
            "kind": self.kind,
            "columns": list(self.columns),
            "fpp": self.fpp,
            "expectedItems": self.expected_items,
        }


def _unescape_sql_string(s: str) -> str:
    """Reverse Catalyst's escapeSingleQuotedString: a left-to-right scan
    folding ``\\\\`` -> ``\\`` and ``\\'`` -> ``'`` (verified against
    Literal.sql output — those are the only two escapes it emits; control
    characters pass through raw).  A naive ``.replace("\\\\'", "'")``
    mangles strings containing backslashes, and the mis-recovered value
    hashes to the wrong Bloom/bucket probe — pruning files that DO hold
    matches."""
    out = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s) and s[i + 1] in ("\\", "'"):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _lit_python(lit: Lit):
    """Parse a Catalyst literal's SQL rendering back to a Python value.

    Build and probe must hash the SAME representation: the build side
    hashes raw column values (int/str/float), so recover that type.
    Also understands the planner's InSet-recovery renderings (r7):
    DATE_FROM_UNIX_DATE(days), TIMESTAMP_MICROS(utc_micros, returned as
    an AWARE datetime so no session-zone reinterpretation happens), and
    TIMESTAMP_NTZ '<wall time>'."""
    import datetime as _dt

    s = lit.sql
    if s.startswith("'") and s.endswith("'"):
        return _unescape_sql_string(s[1:-1])
    # Unquoted true/false only ever renders a BOOLEAN literal; returning
    # the raw string would be truthy for 'false' and hash into the wrong
    # bucket (silent row loss via bucket pruning).
    if s == "true":
        return True
    if s == "false":
        return False
    if s.startswith("DATE_FROM_UNIX_DATE(") and s.endswith(")"):
        try:
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(s[20:-1]))
        except ValueError:
            return s
    if s.startswith("TIMESTAMP_MICROS(") and s.endswith(")"):
        try:
            return _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
                microseconds=int(s[17:-1])
            )
        except ValueError:
            return s
    if s.startswith("TIMESTAMP_NTZ '") and s.endswith("'"):
        return s[len("TIMESTAMP_NTZ '"):-1]
    for caster in (int, float):
        try:
            return caster(s)
        except ValueError:
            pass
    # Catalyst typed-literal suffixes: 5L/5S/5Y (long/short/byte),
    # 5.0D/5.0F (double/float), 5.00BD (decimal).
    if s.endswith("BD"):
        try:
            return float(s[:-2])
        except ValueError:
            pass
    if s.endswith(("L", "S", "Y")):
        try:
            return int(s[:-1])
        except ValueError:
            pass
    if s.endswith(("D", "F")):
        try:
            return float(s[:-1])
        except ValueError:
            pass
    if s.startswith(("DATE '", "TIMESTAMP '")):
        return s.split("'", 1)[1].rstrip("'")
    return s


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
    if kind == "RowCount":
        return RowCountSketch(cols)
    if kind == "Sum":
        return SumSketch(cols)
    raise ValueError(f"unknown sketch kind {kind}")
