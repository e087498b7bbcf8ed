"""Cross-engine deterministic hashing primitives.

The dedup/fingerprint operators need hash functions that (a) run
JVM-side in Spark (no Python on the data path) and (b) can be
reproduced *bit-for-bit* by the DuckDB correctness oracle. The only
hash both engines share exactly is ``md5`` (hex string out), so every
sketch here is built from md5 hex strings:

- **seeded hash**: ``md5(seed || '|' || x)`` — k independent "random"
  functions from one primitive (standard universal-hashing-by-salt).
- **MinHash**: signature_i = lexicographic MIN of the seeded md5 over
  a document's shingle set. A uniform hash's min over a set is
  order-free and merge-able (it is a map-side-combinable aggregate in
  Spark ⇒ scales to 100 TB with one shuffle per doc-id).
- **LSH bands**: band value = md5 of the concatenated signature
  slice; equal band value ⇔ candidate pair. Join on the band string.
- **SimHash**: per-bit majority over token hashes; bits are extracted
  from md5 hex digits via strpos('0123456789abcdef', digit), which
  both engines evaluate identically.

Keeping sketches as *strings* sidesteps engine-specific integer hash
semantics (Spark xxhash64 vs DuckDB hash are different algorithms)
at a modest width cost; at 100 TB the signature width per doc is
k × 32 bytes (k=16 ⇒ 512 B), negligible next to the text itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def seeded_md5(col: Column | str, seed: int) -> Column:
    """md5 of ``seed|value`` — the k-th member of a seeded hash family."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(f"{seed}|"), c))


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature of an ``array<string>`` shingle column.

    Returns ``array<string>`` of length ``num_hashes``; element i is
    the lexicographic min of ``md5(i|s)`` over shingles s. Pure
    higher-order-function expression — whole-stage codegen, no UDF.
    """
    def seeded(i: int):
        # NB: must be a unary lambda — a second parameter would make
        # Spark's higher-order transform pass the element INDEX into it.
        return lambda s: seeded_md5(s, i)

    return F.array(
        *[F.array_min(F.transform(shingles, seeded(i))) for i in range(num_hashes)]
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys of a MinHash signature: ``array<string>`` of length
    ``bands``; key b = 'b|' + md5(sig[b*r] || ',' || ... ).

    Two docs share a band key iff their signatures agree on that whole
    band — the classic S-curve collision probability. Downstream,
    ``explode`` + self-join on the key yields candidate pairs with a
    single shuffle on the band key (no O(n²) compare).
    """
    keys = []
    for b in range(bands):
        sl = [F.element_at(signature, b * rows_per_band + j + 1) for j in range(rows_per_band)]
        keys.append(F.concat(F.lit(f"{b}|"), F.md5(F.concat_ws(",", *sl))))
    return F.array(*keys)


def hex_digit_value(digit: Column) -> Column:
    """Value 0-15 of one lowercase hex digit, identically in DuckDB:
    ``strpos('0123456789abcdef', d) - 1`` ⇔ ``F.instr(...) - 1``."""
    return F.instr(F.lit(HEX_DIGITS), digit) - F.lit(1)


def md5_bit(col: Column, bit: int) -> Column:
    """Bit ``bit`` (0 = MSB of first hex digit) of ``md5(col)`` as 0/1."""
    h = F.md5(col)
    digit = F.substring(h, bit // 4 + 1, 1)
    shift = 3 - bit % 4
    return F.floor(hex_digit_value(digit) / F.lit(2**shift)) % F.lit(2)


def simhash_bits(tokens: Column, num_bits: int) -> list[Column]:
    """SimHash of an ``array<string>`` token column, one 0/1 Column per
    bit: bit_j = 1 iff Σ_tokens (2·bit_j(md5(t)) − 1) ≥ 0.

    Expressed with ``aggregate`` over the token array so it stays
    JVM-side. num_bits is kept small (16) because each bit is an
    independent aggregate expression; for a 64-bit production simhash
    at 100 TB you would trade this exact-oracle form for a pandas_udf
    computing all 64 bits in one pass per Arrow batch.
    """
    def merge(j: int):
        # binary lambda required: a third parameter would change how
        # Spark binds the higher-order function's arguments.
        return lambda acc, t: acc + (md5_bit(t, j) * 2 - 1).cast("long")

    out = []
    for j in range(num_bits):
        tally = F.aggregate(tokens, F.lit(0).cast("long"), merge(j))
        out.append(F.when(tally >= 0, F.lit(1)).otherwise(F.lit(0)))
    return out


def simhash(tokens: Column, num_bits: int = 16) -> Column:
    """SimHash packed into a long (bit 0 = MSB)."""
    bits = simhash_bits(tokens, num_bits)
    packed = F.lit(0).cast("long")
    for b in bits:
        packed = packed * F.lit(2) + b.cast("long")
    return packed
