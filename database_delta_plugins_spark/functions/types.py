"""Value-level type-conversion semantics (SURVEY.md §1.2).

The reference's converter suite applies MySQL/SQL-Server-specific value
rules while decoding change events; these are the semantics tests worth
preserving. Each function is a pure Catalyst expression unless a real
parser is required (JSON canonicalization, charset decode — Arrow-batched
pandas UDFs, never per-row Python).

Reference evidence per function:
- two-digit year:   mysql/MySqlEventReader.java:215-225;
                    mysql-dbz/MySqlValueConverters.java:155-165
- zero dates:       MySqlValueConverters.java:195-229
- unsigned widen:   MySqlValueConverters.java:270-300,801-911
- ENUM/SET decode:  MySqlValueConverters.java:604-653
- JSON canonical:   MySqlValueConverters.java:485-507
- charset decode:   MySqlValueConverters.java:381-399,421-474
- TIME > 24h:       MySqlValueConverters.java:918-927
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def adjust_two_digit_year(date_col: Column) -> Column:
    """Two-digit-year adjustment: 00-69 -> +2000, 70-99 -> +1900.
    Applied to DATE values whose year parsed as 0-99."""
    y = F.year(date_col)
    newy = (
        F.when((y >= 0) & (y <= 69), y + 2000)
        .when((y >= 70) & (y <= 99), y + 1900)
        .otherwise(y)
    )
    return F.make_date(newy, F.month(date_col), F.dayofmonth(date_col))


def zero_date_to_null(str_col: Column) -> Column:
    """MySQL zero dates ('0000-00-00', '0000-00-00 00:00:00') -> NULL
    (the reference logs a warning and nulls the value)."""
    is_zero = F.regexp_like(str_col, F.lit(r"^0{4}-0{2}-0{2}([ T]0{2}:0{2}:0{2}(\.0+)?)?$"))
    return F.when(is_zero, F.lit(None).cast("string")).otherwise(str_col)


# unsigned ints widen one size up (value may exceed the signed range):
# target type + bit width of the SOURCE for two's-complement reinterpret
_UNSIGNED_WIDEN = {
    "tinyint": ("int", 8),
    "smallint": ("int", 16),
    "int": ("bigint", 32),
    "bigint": ("decimal(20,0)", 64),
}


def widen_unsigned(col: Column, source_type: str) -> Column:
    """UNSIGNED column widening: tinyint->int, smallint->int, int->bigint,
    bigint->decimal(20,0) — REINTERPRETING two's-complement negatives
    (a TINYINT UNSIGNED 255 arrives as signed byte -1; the widened value
    must be 255, not -1 — the reference adds 2^N for negative raw
    values, MySqlValueConverters.java:270-300). Non-negative values pass
    through the plain cast."""
    rule = _UNSIGNED_WIDEN.get(source_type.lower())
    if rule is None:
        raise ValueError(f"no unsigned widening rule for {source_type!r}")
    target, bits = rule
    widened = col.cast(target)
    offset = F.lit(1 << bits).cast(target) if bits < 64 \
        else F.lit("18446744073709551616").cast(target)
    # final cast pins the declared target type (decimal addition widens
    # precision to decimal(21,0); values always fit the target range)
    return F.when(col < 0, widened + offset).otherwise(widened).cast(target)


def decode_enum(idx_col: Column, labels: list[str]) -> Column:
    """MySQL ENUM: 1-based index -> label; 0 -> '' (invalid-value
    sentinel); out of range -> NULL."""
    arr = F.array(*[F.lit(x) for x in labels])
    return (
        F.when(idx_col == 0, F.lit(""))
        .when((idx_col >= 1) & (idx_col <= len(labels)), F.element_at(arr, idx_col.cast("int")))
        .otherwise(F.lit(None).cast("string"))
    )


def decode_set(mask_col: Column, labels: list[str]) -> Column:
    """MySQL SET: bitmask -> comma-joined labels in definition order.
    NULL mask stays NULL (concat_ws would silently collapse it to '',
    making SQL NULL indistinguishable from the empty set mask=0)."""
    parts = [
        F.when(F.shiftrightunsigned(mask_col.cast("long"), i).bitwiseAND(F.lit(1)) == 1,
               F.lit(lab))
        for i, lab in enumerate(labels)
    ]
    joined = F.concat_ws(",", F.filter(F.array(*parts), lambda x: x.isNotNull()))
    return F.when(mask_col.isNull(), F.lit(None).cast("string")).otherwise(joined)


def time_over_24h_micros(hours: Column, minutes: Column, seconds: Column) -> Column:
    """MySQL TIME beyond 24h is a duration, kept as micros (can exceed a
    day and be negative)."""
    return ((hours.cast("long") * 3600 + minutes.cast("long") * 60
             + seconds.cast("long")) * F.lit(1_000_000)).cast("long")


@pandas_udf(StringType())
def json_canonical(raw: pd.Series) -> pd.Series:
    """Binary/string JSON -> canonical JSON string (sorted keys, no
    whitespace); empty string -> '{}'; null -> null; invalid -> null."""
    def conv(v):
        if v is None:
            return None
        if isinstance(v, (bytes, bytearray)):
            v = v.decode("utf-8", "replace")
        if v == "":
            return "{}"
        try:
            return json.dumps(json.loads(v), sort_keys=True, separators=(",", ":"))
        except (ValueError, TypeError):
            return None

    return raw.map(conv)


def make_charset_decoder(charset: str = "utf-8"):
    """Per-column charset-aware bytes->string decoder with UTF-8 fallback
    (vectorized). The charset is bound per column at plan time, mirroring
    the reference's per-column charset resolution."""

    @pandas_udf(StringType())
    def decode_bytes(b: pd.Series) -> pd.Series:
        def conv(v):
            if v is None:
                return None
            try:
                return bytes(v).decode(charset)
            except (UnicodeDecodeError, LookupError):
                return bytes(v).decode("utf-8", "replace")

        return b.map(conv)

    return decode_bytes


def binary_handling(col: Column, mode: str = "bytes") -> Column:
    """Config-driven binary column handling (the reference's
    'binary.handling.mode' connector knob; with HEX mode the emitted
    schema becomes string — MySqlEventReaderIntegrationTest.java:279-303,
    fixture F6 binarycoltable). Modes: bytes (identity, BinaryType) ·
    hex (lowercase hex string, Debezium convention) · base64 (string).
    Pure Catalyst — wire into the pipeline via the merge transform hook
    or a decode projection."""
    if mode == "bytes":
        return col
    if mode == "hex":
        return F.lower(F.hex(col))
    if mode == "base64":
        return F.base64(col)
    raise ValueError(f"unknown binary handling mode {mode!r}")
