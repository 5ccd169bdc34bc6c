"""Engine-portable deterministic hashing.

The dedup pipeline (MinHash, SimHash, rolling-hash fingerprints) must
be deterministic AND reproducible by the DuckDB oracle, so we cannot
use Spark's xxhash64/murmur (no DuckDB equivalent).  Instead every
token hash is derived from md5 — identical hex output in both engines —
truncated to 60 bits (15 hex chars, fits a signed 64-bit int).

All downstream arithmetic stays below 2^62 (no overflow divergence):
hashes are reduced mod MERSENNE31 before any multiplication by
31-bit coefficients.

Spark side uses the built-in ``conv`` (JVM, codegen'd); the DuckDB side
has no hex→int builtin, so :func:`duckdb_hex15_to_bigint` generates the
positional-sum SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime

# Fixed MinHash permutation coefficients (a*h + b) % MERSENNE31 —
# arbitrary odd constants < 2^31, pinned so results never drift.
MINHASH_A = [
    1103515245, 1299709, 15485863, 32452843, 49979687, 67867967, 86028121, 104395301,
    122949823, 141650939, 160481183, 179424673, 198491317, 217645177, 236887691, 256203161,
]
MINHASH_B = [
    12345, 7919, 104729, 1299721, 15485867, 32452867, 49979693, 67867979,
    86028157, 104395303, 122949829, 141650963, 160481219, 179424691, 198491329, 217645199,
]
N_MINHASH = len(MINHASH_A)

ROLLING_BASE = 31


def md5_hash60(col: Column) -> Column:
    """60-bit integer hash: first 15 hex chars of md5, base-16 decoded."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash60_mod(col: Column) -> Column:
    """md5_hash60 reduced mod 2^31-1 (safe operand for 31-bit multiplies)."""
    return md5_hash60(col) % F.lit(MERSENNE31)


def minhash_perm(hmod: Column, i: int) -> Column:
    """The i-th MinHash permutation of an already-reduced hash."""
    return (F.lit(MINHASH_A[i]) * hmod + F.lit(MINHASH_B[i])) % F.lit(MERSENNE31)


def duckdb_hex15_to_bigint(hex_expr: str) -> str:
    """SQL computing the base-16 value of the first 15 chars of
    ``hex_expr`` (a lowercase hex string expression) as BIGINT.

    DuckDB has no ``conv``; this expands to 15 positional terms of
    ``digit * 16^(15-i)`` — oracle-only code, never on the Spark path.
    """
    terms = [
        f"(instr('0123456789abcdef', substr({hex_expr}, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def duckdb_hash60_mod(text_expr: str) -> str:
    """DuckDB SQL: md5 → 60-bit int → mod 2^31-1 (mirror of
    :func:`md5_hash60_mod`)."""
    return f"({duckdb_hex15_to_bigint(f'md5({text_expr})')} % {MERSENNE31})"
