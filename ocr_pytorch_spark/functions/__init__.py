"""Shared column-expression helpers (JVM-side, codegen'd — no UDFs).

Everything here is expressible identically in DuckDB SQL, which is what
makes the driver's cross-engine correctness checks exact: md5 returns the
same lowercase hex in both engines, and hex digits are decoded with
``instr('0123456789abcdef', c) - 1`` instead of engine-specific conv().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HEX = "0123456789abcdef"


def words(col) -> Column:
    """Whitespace tokens (single-space corpora; split/string_split agree)."""
    return F.split(col, " ")


def word_rows(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """One row per (id, pos, word) — posexplode; DuckDB analogue is
    unnest + generate_subscripts."""
    return df.select(
        id_col, F.posexplode(words(F.col(text_col))).alias("pos", "word"))


def quant4(col: Column) -> Column:
    """4dp quantizer: floor(x*10000 + 0.5)/10000.  Used instead of
    round(x, 4) because Spark (BigDecimal HALF_UP on the shortest
    decimal repr) and DuckDB (binary round) disagree on exact-half
    values; floor of an identical double is identical everywhere.
    SQL analogue: floor((x) * 10000 + 0.5) / 10000."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def quant4_sql(expr: str) -> str:
    return f"floor(({expr}) * 10000 + 0.5) / 10000"


def hex_digit_expr(char_sql: str) -> str:
    """SQL fragment: numeric value of one hex char (portable)."""
    return f"(instr('{HEX}', {char_sql}) - 1)"


