"""SQL-expressible string hashing shared by Spark and the DuckDB oracle.

The LSH operators (MinHash, SimHash, winnowing fingerprint) default to
Spark's JVM-side ``xxhash64`` — the fast production path — but xxhash64 is
not reproducible inside the DuckDB correctness oracle. Each operator
therefore takes a ``hash_expr`` injection point; the oracle profile plugs
in this polynomial rolling hash, which both engines can evaluate from the
SAME definition:

    H(s; m, p) = fold_{c in chars(s)} (acc·m + codepoint(c)) mod p,  acc₀=0

built here twice from one set of constants: as a Spark Column
(``F.aggregate`` over char positions — JVM-side, no UDF) and as a DuckDB
SQL string (``list_reduce`` over the same positions). Parity is pinned by
tests/test_hashing.py. Primes sit just under 2^32 so acc·31+c < 2^37 never
overflows a 64-bit signed int in either engine, and the combined 63-bit
``h64`` keeps the sign bit clear so shifts/sums behave identically.

CAVEAT — avalanche, not a correctness issue: with multiplier 31, the low
bits of short strings are a near-linear function of the LAST few
characters (a trailing char moves the hash by at most 31^k before any
modular wrap), so keys that differ only mid-string and share a short
suffix (e.g. "id:100:9".."id:159:9") land in a narrow band of
``h % 2^k``. Both engines compute the identical value — oracles stay
exact — but SAMPLED-fraction entries built on this hash are statistically
skewed, and tests asserting label DIVERSITY should vary key prefixes or
use the production xxhash64. Production paths always default to xxhash64;
this hash exists only for cross-engine replay."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# two independent 32-bit-range polynomial hashes; h64 combines them
P1, M1 = 4294967291, 31          # largest prime < 2^32
P2, M2 = 4294967279, 37

_MASK31 = (1 << 31) - 1


def poly_hash(col: Column, mult: int = M1, p: int = P1) -> Column:
    """Spark Column form of H(s; mult, p) — pure Catalyst expression."""
    return F.aggregate(
        F.sequence(F.lit(1), F.length(col)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * F.lit(mult) + F.ascii(col.substr(i, F.lit(1))))
        % F.lit(p))


def poly_hash64(col: Column) -> Column:
    """63-bit combined hash: poly1 in bits 0..31, poly2&2^31-1 in 32..62.
    Bit 63 stays 0, so BIGINT shifts/sums never overflow on either engine."""
    h2 = poly_hash(col, M2, P2).bitwiseAND(F.lit(_MASK31))
    return poly_hash(col, M1, P1).bitwiseOR(F.shiftleft(h2, 32))


def duck_poly(expr: str, mult: int = M1, p: int = P1) -> str:
    """DuckDB SQL form of H(s; mult, p) over the SQL expression `expr`.
    Lambda vars are prefixed `pc_` so the expression can itself sit inside
    an outer DuckDB lambda (e.g. hashing each n-gram of a list_transform)
    without variable capture."""
    return (f"list_reduce(list_prepend(0::BIGINT, "
            f"list_transform(range(length({expr})), "
            f"pc_i -> ascii(substring({expr}, pc_i+1, 1))::BIGINT)), "
            f"(pc_acc, pc_c) -> (pc_acc * {mult} + pc_c) % {p})")


def duck_poly64(expr: str) -> str:
    """DuckDB SQL form of poly_hash64 over `expr`."""
    return (f"({duck_poly(expr, M1, P1)} | "
            f"(({duck_poly(expr, M2, P2)} & {_MASK31}) << 32))")
