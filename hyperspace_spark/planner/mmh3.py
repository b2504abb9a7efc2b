"""Spark-compatible Murmur3 (x86_32) for driver-side bucket pruning.

Spark assigns a row to bucket ``pmod(murmur3(key, seed=42), numBuckets)``
(HashPartitioning.partitionIdExpression).  Re-implementing the hash in
Python lets the filter rule compute, with zero Spark jobs, exactly which
bucket files can contain an equality literal — file-level bucket pruning
that works with a plain parquet read (no session conf, no catalog table,
no DisableUnnecessaryBucketedScan interference).

Reference for the semantics (public Spark source):
sql/catalyst/src/main/java/org/apache/spark/sql/catalyst/expressions/HiveHasher.java
is NOT used for parquet bucketing; FileSourceScanExec uses
Murmur3Hash — org.apache.spark.unsafe.hash.Murmur3_x86_32.  Verified
against ``F.hash`` in tests/test_bucket_pruning.py.
"""

from __future__ import annotations

import datetime

_MASK32 = 0xFFFFFFFF
SEED = 42  # Murmur3Hash.seed for HashPartitioning / SQL hash()


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK32
    k1 = ((k1 << 15) | (k1 >> 17)) & _MASK32
    k1 = (k1 * 0x1B873593) & _MASK32
    return k1


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _MASK32
    h1 = (h1 * 5 + 0xE6546B64) & _MASK32
    return h1


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _signed32(v: int) -> int:
    v &= _MASK32
    return v - (1 << 32) if v >= (1 << 31) else v


def hash_int(value: int, seed: int = SEED) -> int:
    """Murmur3_x86_32.hashInt — 4-byte integral types (int/date)."""
    h1 = _mix_h1(seed & _MASK32, _mix_k1(value & _MASK32))
    return _signed32(_fmix(h1, 4))


def hash_long(value: int, seed: int = SEED) -> int:
    """Murmur3_x86_32.hashLong — long/timestamp."""
    v = value & 0xFFFFFFFFFFFFFFFF
    low = v & _MASK32
    high = (v >> 32) & _MASK32
    h1 = _mix_h1(seed & _MASK32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _signed32(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int = SEED) -> int:
    """Murmur3_x86_32.hashUnsafeBytes — strings/binary.

    Spark's variant: 4-byte little-endian words, then each remaining tail
    byte SIGN-EXTENDED and mixed as a full round (not standard murmur3
    tail handling)."""
    h1 = seed & _MASK32
    n = len(data) & ~3
    for i in range(0, n, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(n, len(data)):
        b = data[i]
        if b >= 128:
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _signed32(_fmix(h1, len(data)))


_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)

# Catalyst typeName() -> hasher over the *stored* physical value.
_INT_TYPES = {"byte", "short", "integer", "date"}
_LONG_TYPES = {"long", "timestamp", "timestamp_ntz"}


def _session_tzinfo(session_tz: str):
    """tzinfo for a Spark session timezone string (region id or fixed
    offset), or None when it can't be resolved (caller must skip
    pruning — always sound)."""
    if session_tz in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00", "GMT+00:00"):
        return datetime.timezone.utc
    import re as _re

    m = _re.fullmatch(r"(?:GMT|UTC)?([+-])(\d{1,2}):(\d{2})", session_tz)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        return datetime.timezone(
            sign * datetime.timedelta(hours=int(m.group(2)), minutes=int(m.group(3)))
        )
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(session_tz)
    except Exception:
        return None


def _epoch_micros(dt: datetime.datetime) -> int:
    """Exact integer epoch micros.  NOT total_seconds()*1e6: that routes
    through float64 (53-bit mantissa) and is off by 1 microsecond for
    ~1% of timestamps — measured 3075/250000 — which hashes into the
    wrong bucket and silently prunes the matching file."""
    d = dt - _EPOCH_TS
    return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds


def spark_hash(value, dtype: str, seed: int = SEED, session_tz: str = "UTC") -> int | None:
    """Hash a Python literal the way Spark hashes the column value, or
    None when the type's physical representation is not replicated here
    (caller must fall back to no pruning — always sound).

    ``session_tz``: Catalyst renders TIMESTAMP literals as wall-clock
    text in ``spark.sql.session.timeZone``, so naive timestamp values
    are interpreted in that zone before computing physical epoch micros
    (TIMESTAMP_NTZ stores the wall time itself and never shifts)."""
    if value is None:
        # Murmur3Hash skips null children: the hash stays the seed.
        return _signed32(seed)
    if dtype == "boolean":
        if isinstance(value, str):
            # a leaked rendering ('false' is truthy!) must never pick a bucket
            if value not in ("true", "false"):
                return None
            value = value == "true"
        return hash_int(1 if value else 0, seed)
    if dtype in _INT_TYPES:
        if dtype == "date":
            if isinstance(value, str):
                try:
                    value = datetime.date.fromisoformat(value)
                except ValueError:
                    return None  # unparseable rendering: skip pruning, sound
            if isinstance(value, datetime.date):
                value = (value - _EPOCH_DATE).days
        try:
            return hash_int(int(value), seed)
        except (TypeError, ValueError):
            return None
    if dtype in _LONG_TYPES:
        if dtype.startswith("timestamp"):
            if isinstance(value, str):
                try:
                    value = datetime.datetime.fromisoformat(value)
                except ValueError:
                    return None
            if isinstance(value, datetime.datetime):
                if value.tzinfo is None:
                    if dtype == "timestamp_ntz":
                        tzinfo = datetime.timezone.utc  # wall time IS the value
                    else:
                        tzinfo = _session_tzinfo(session_tz)
                        if tzinfo is None:
                            return None
                    value = value.replace(tzinfo=tzinfo)
                    # DST spring-forward gap: a nonexistent wall time
                    # resolves to the SAME instant on both sides —
                    # Python PEP 495 fold=0 applies the pre-gap offset,
                    # and Java's ZonedDateTime.ofLocal shifts the wall
                    # clock forward by the gap then applies the post-gap
                    # offset, which is instant-equivalent (verified:
                    # 2026-03-08 02:30 America/New_York -> 07:30Z both
                    # ways).  The round-trip check below is therefore
                    # defense-in-depth, not a correctness requirement:
                    # it costs two tz conversions on gap literals only
                    # and shields against zoneinfo/JVM tzdata skew by
                    # skipping pruning for any wall time the zone can't
                    # represent.  (Ambiguous fall-back times are fine:
                    # both sides pick the earlier offset.)
                    rt = value.astimezone(datetime.timezone.utc).astimezone(tzinfo)
                    if rt.replace(tzinfo=None) != value.replace(tzinfo=None):
                        return None
                value = _epoch_micros(value)
        try:
            return hash_long(int(value), seed)
        except (TypeError, ValueError):
            return None  # unparseable rendering: skip pruning, sound
    if dtype == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    # float/double/decimal/binary: representation subtleties (-0.0
    # normalization, unscaled decimal forms) aren't worth the risk for a
    # pure optimization — skip pruning.
    return None


def bucket_id(value, dtype: str, num_buckets: int, session_tz: str = "UTC") -> int | None:
    """Spark bucket id for a single-column bucket key, or None if the
    type isn't supported (no pruning)."""
    return bucket_id_multi([value], [dtype], num_buckets, session_tz=session_tz)


def bucket_id_multi(
    values: list, dtypes: list[str], num_buckets: int, session_tz: str = "UTC"
) -> int | None:
    """Spark bucket id for a COMPOSITE bucket key, or None if any
    column's type isn't replicated here (no pruning — always sound).

    Spark's Murmur3Hash expression folds over its children, each
    column's hash seeding the next (`children.foldLeft(seed)`), so a
    k-column bucket key chains k single-column hashes.  Verified against
    ``F.hash(c1, c2, ...)`` in tests/test_bucket_pruning.py."""
    h = SEED
    for v, dt in zip(values, dtypes):
        h = spark_hash(v, dt, seed=h, session_tz=session_tz)
        if h is None:
            return None
    return ((h % num_buckets) + num_buckets) % num_buckets
