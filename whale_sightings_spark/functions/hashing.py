"""Cross-engine deterministic hashing (net-new scale surface:
MinHash / SimHash / LSH primitives).

Everything here must produce **bit-identical values in Spark and
DuckDB** so the driver's oracle can verify the dedup operators. The
shared primitive is a 60-bit integer from the first 15 hex digits of
md5 — both engines expose md5, hex→int conversion, and 64-bit integer
arithmetic; xxhash64/hash() differ between engines and are avoided.

MinHash uses the classic universal-hash family
``h_j(x) = (a_j * x + b_j) mod P`` with hardcoded coefficients; inputs
are first reduced mod P (1e9+7) so products stay under 2^63 (ANSI-safe,
no overflow).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for the universal hash family (fits in 30 bits -> products
#: of two residues stay < 2^60)
MINHASH_P = 1_000_000_007

#: fixed universal-hash coefficients (a_j, b_j) — 8 functions
MINHASH_A = (387420489, 972663749, 911382323, 560689421,
             741103813, 231631547, 655360001, 488882429)
MINHASH_B = (12190087, 845723471, 914592001, 107420141,
             318083817, 626025939, 222444771, 993319019)

#: LSH banding over the 8-long signature: 4 bands x 2 rows
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = 2

#: SimHash uses the low 60 bits of the md5-based hash, banded 4 x 15
#: bits for candidate generation
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15


def hash60(col: Column) -> Column:
    """60-bit deterministic hash: first 15 hex digits of md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_term(col: Column, j: int) -> Column:
    """h_j applied to an already-hashed shingle column."""
    return (F.lit(MINHASH_A[j]) * (col % MINHASH_P) + F.lit(MINHASH_B[j])) % MINHASH_P


def minhash_term_sql(expr: str, j: int) -> str:
    return f"(({MINHASH_A[j]} * (({expr}) % {MINHASH_P}) + {MINHASH_B[j]}) % {MINHASH_P})"


def minhash_signature_from_hashes(hashed: Column) -> Column:
    """array<bigint> of length 8: min over pre-hashed shingles of each
    h_j. ``hashed`` must be a **materialized** array<bigint> column
    (``transform(shingles, hash60)`` staged via a select) — it is
    referenced once per hash function, and an inline md5 there would be
    recomputed 8x per shingle."""
    def term(j: int):
        # factory, not default-arg binding: PySpark dispatches on lambda
        # arity, so a second parameter would be treated as the index arg
        return lambda h: minhash_term(h, j)

    sig = [F.array_min(F.transform(hashed, term(j))) for j in range(len(MINHASH_A))]
    return F.array(*sig)


def minhash_signature(shingles: Column) -> Column:
    """array<bigint> of length 8: min over shingles of each h_j.

    Empty shingle set -> nulls (caller filters). Convenience form; the
    hot path stages ``transform(shingles, hash60)`` into a column first
    and uses :func:`minhash_signature_from_hashes` (one md5 per shingle
    instead of 8)."""
    def term(j: int):
        return lambda s: minhash_term(hash60(s), j)

    sig = [F.array_min(F.transform(shingles, term(j))) for j in range(len(MINHASH_A))]
    return F.array(*sig)


def minhash_signature_sql(shingles_expr: str) -> list[str]:
    """DuckDB twin: one SQL expression per signature slot."""
    return [
        f"list_min(list_transform({shingles_expr}, s -> {minhash_term_sql(hash60_sql('s'), j)}))"
        for j in range(len(MINHASH_A))
    ]


def band_keys(sig: Column) -> Column:
    """array<string> of band bucket keys: band index + joined slot values."""
    keys = []
    r = MINHASH_ROWS_PER_BAND
    for b in range(MINHASH_BANDS):
        parts = [F.lit(str(b))] + [
            F.element_at(sig, b * r + i + 1).cast("string") for i in range(r)
        ]
        keys.append(F.concat_ws(":", *parts))
    return F.array(*keys)


def band_keys_sql(sig_exprs: list[str]) -> list[str]:
    r = MINHASH_ROWS_PER_BAND
    out = []
    for b in range(MINHASH_BANDS):
        parts = [f"'{b}'"] + [
            f"CAST({sig_exprs[b * r + i]} AS VARCHAR)" for i in range(r)
        ]
        out.append(" || ':' || ".join(parts))
    return out


def simhash(token_hashes: Column) -> Column:
    """60-bit SimHash of an array of token hashes (already hash60'd).

    bit b of the result is 1 iff more tokens have bit b set than not.
    Single pass over the array: one ``aggregate`` builds a 60-slot
    ones-counter (``getbit`` takes a column bit position), then the
    counters fold into the signature against a literal power array.
    The naive per-bit formulation (60 separate aggregates) re-walks the
    array 60 times and benches ~25x slower. Integer ops only — doubles
    lose bits above 2^53.

    ``token_hashes`` must be a **materialized** column ref (it is
    referenced by both the counter pass and ``size``).
    """
    seq = F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))
    counts = F.aggregate(
        token_hashes,
        F.array_repeat(F.lit(0).cast("bigint"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(acc, seq, lambda a, b: a + F.getbit(h, b)),
    )
    total = F.size(token_hashes)
    powers = F.array(*[F.lit(1 << b).cast("bigint") for b in range(SIMHASH_BITS)])
    folded = F.aggregate(
        F.zip_with(
            counts,
            powers,
            lambda c, p: F.when(c * 2 > total, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # coalesce makes the column provably non-nullable (aggregate() is
    # nullable by signature): otherwise downstream joins infer an
    # isnotnull(sh) constraint that predicate pushdown re-inlines below
    # the staging projections — the whole signature then recomputes
    # several times per row at the scan (observed 7x slowdown)
    return F.coalesce(folded, F.lit(0).cast("bigint"))


def simhash_sql(token_hashes_expr: str) -> str:
    terms = []
    for b in range(SIMHASH_BITS):
        ones = f"list_sum(list_transform({token_hashes_expr}, h -> (h >> {b}) & 1))"
        terms.append(
            f"(CASE WHEN {ones} * 2 > len({token_hashes_expr}) THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def simhash_band(col: Column, band: int) -> Column:
    """15-bit band value for candidate blocking."""
    return (F.shiftright(col, SIMHASH_BAND_BITS * band) % (1 << SIMHASH_BAND_BITS)).cast(
        "bigint"
    )


def simhash_band_sql(expr: str, band: int) -> str:
    return f"CAST((({expr}) >> {SIMHASH_BAND_BITS * band}) % {1 << SIMHASH_BAND_BITS} AS BIGINT)"


def hamming60(a: Column, b: Column) -> Column:
    """Hamming distance between two 60-bit signatures."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def hamming60_sql(a: str, b: str) -> str:
    return f"CAST(bit_count(xor({a}, {b})) AS INT)"
