"""DuckDB SQL fragment generators mirroring the engine's Spark
expressions — the oracle side of the text/dedup/similarity operators.

Every fragment here is the *same operation tree* as its Spark
counterpart in ``functions.text`` / ``functions.hashing`` /
``functions.vectors``, so per-row doubles come out bit-identical and
hashes/sketches string-identical. Keep the two sides in lockstep:
change one, change the other.
"""

from __future__ import annotations

from epe_data_wrangling_spark.functions.hashing import MINHASH_AB, MINHASH_P
from epe_data_wrangling_spark.functions.text import BPE_TOKEN_RE, LANG_STOPWORDS


def words(col: str) -> str:
    """functions.text.words: trim → split on \\s+ → drop empties."""
    return f"list_filter(regexp_split_to_array(trim({col}), '\\s+'), x -> x <> '')"


def shingles(words_expr: str, n: int) -> str:
    """functions.text.word_shingles (space-joined word n-grams, whole
    text as a single shingle for short docs)."""
    return (
        f"CASE WHEN len({words_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({words_expr}) - {n - 1}), "
        f"i -> array_to_string(({words_expr})[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({words_expr}, ' ')] END"
    )


def base_hash_list(shingles_col: str) -> str:
    """functions.hashing.base_hash mapped over a shingle list: the
    integer base hash (first 8 md5 hex digits mod P) per shingle —
    computed ONCE, like the Spark side's single-md5 pass."""
    return (
        f"list_transform({shingles_col}, s -> {hex_int('md5(s)', 1, 8)} % {MINHASH_P})"
    )


def minhash_sig_exprs(hashes_col: str, num_hashes: int) -> list[str]:
    """functions.hashing.minhash_signature over a pre-computed base-
    hash list (``base_hash_list``): min of (a·h+b) mod P per hash."""
    return [
        f"list_min(list_transform({hashes_col}, "
        f"h -> ({a} * h + {b}) % {MINHASH_P})) AS s{i}"
        for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]


def band_exprs(bands: int, rows_per_band: int) -> list[str]:
    """functions.hashing.lsh_band_keys over sig columns s0..s{k-1}:
    'b|' ⊕ ',' ⊕ values (concat_ws semantics)."""
    out = []
    for b in range(bands):
        cols = " || ',' || ".join(
            f"CAST(s{b * rows_per_band + j} AS VARCHAR)" for j in range(rows_per_band)
        )
        out.append(f"'{b}|,' || {cols}")
    return out


def md5_bit(token_expr: str, bit: int) -> str:
    """functions.hashing.md5_bit (hex-digit strpos + floor/mod)."""
    pos, shift = bit // 4 + 1, 3 - bit % 4
    hexv = f"(strpos('0123456789abcdef', substr(md5({token_expr}), {pos}, 1)) - 1)"
    return f"(CAST(floor({hexv} / {2 ** shift}) AS BIGINT) % 2)"


def simhash_bit_exprs(words_col: str, num_bits: int) -> list[str]:
    """functions.hashing.simhash_bits: per-bit ±1 tally sign."""
    return [
        f"CASE WHEN list_sum(list_transform({words_col}, t -> 2 * {md5_bit('t', j)} - 1)) >= 0 "
        f"THEN 1 ELSE 0 END AS b{j}"
        for j in range(num_bits)
    ]


def simhash_pack(num_bits: int) -> str:
    """functions.hashing.simhash packing (bit 0 = MSB)."""
    expr = "CAST(0 AS BIGINT)"
    for j in range(num_bits):
        expr = f"({expr} * 2 + b{j})"
    return expr


def cosine(a: str, b: str) -> str:
    """functions.vectors.cosine: dot/(norm·norm), double-accumulated."""
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def hyperplane_bucket(vec: str, n_planes: int | None = None) -> str:
    """operators.similarity.hyperplane_bucket over the frozen planes."""
    from epe_data_wrangling_spark.operators._planes import PLANES

    bits = [
        f"CASE WHEN list_dot_product({vec}, [{', '.join(repr(x) for x in plane)}]) >= 0 "
        "THEN '1' ELSE '0' END"
        for plane in PLANES[: n_planes or len(PLANES)]
    ]
    return " || ".join(bits)


def hex_int(col: str, start: int, ndigits: int) -> str:
    """Integer value of ``ndigits`` lowercase hex digits of ``col``
    starting at 1-based ``start`` — mirrors Python's
    ``int(h[start-1:start-1+ndigits], 16)`` via a strpos fold."""
    expr = "CAST(0 AS BIGINT)"
    for i in range(ndigits):
        d = f"(strpos('0123456789abcdef', substr({col}, {start + i}, 1)) - 1)"
        expr = f"({expr} * 16 + {d})"
    return expr


def stopword_hits(lower_words: str, lang: str) -> str:
    sw = ", ".join(f"'{s}'" for s in LANG_STOPWORDS[lang])
    return f"len(list_filter({lower_words}, t -> list_contains([{sw}], t)))"


def bpe_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{BPE_TOKEN_RE}'))"


def quality(col: str) -> str:
    """functions.text.quality_score: (length + stopword + punctuation
    terms) / 3, rounded to 6 dp — one row-level double expression."""
    w = words(col)
    lw = f"list_transform({w}, t -> lower(t))"
    sw_ratio = (
        f"CASE WHEN len({w}) > 0 THEN {stopword_hits(lw, 'en')} / len({w}) ELSE 0.0 END"
    )
    punct = (
        f"CASE WHEN length({col}) > 0 THEN "
        f"length(regexp_replace({col}, '[A-Za-z0-9\\s]', '', 'g')) / length({col}) "
        "ELSE 0.0 END"
    )
    return (
        f"round((least(CAST(len({w}) AS DOUBLE) / 50.0, 1.0) "
        f"+ least(({sw_ratio}) * 4, 1.0) "
        f"+ (1.0 - least(({punct}) * 5, 1.0))) / 3, 6)"
    )
