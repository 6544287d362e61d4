"""Portable deterministic hashing shared by dedup/similarity operators.

Both engines compute h32(s) = int(first 8 hex chars of md5(s), 16) — an
unsigned 32-bit value carried in a BIGINT — so every downstream operator
(minhash, simhash, fingerprints) is bit-identical between the Spark
implementation and the DuckDB oracle. All modular arithmetic keeps operands
below 2^53 so neither engine overflows (Spark would wrap silently, DuckDB
would error).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# modulus for minhash permutations / fingerprints: 2^31 - 1 (prime)
MOD = 2_147_483_647

# deterministic permutation constants for minhash: a_i odd < 2^20, b_i < 2^31.
# Generated once from a fixed LCG (seed constants below) and baked as
# literals so both engines share them.
NUM_MINHASH = 16
MINHASH_A = []
MINHASH_B = []
_state = 88172645463325252
for _ in range(NUM_MINHASH):
    _state = (_state * 6364136223846793005 + 1442695040888963407) % (2**64)
    MINHASH_A.append((_state % (2**19)) * 2 + 1)
    _state = (_state * 6364136223846793005 + 1442695040888963407) % (2**64)
    MINHASH_B.append(_state % MOD)


def h32_col(col: Column) -> Column:
    """Spark: unsigned 32-bit md5 prefix as BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB: same value via hex-literal cast."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"
