"""Text primitives shared by dedup and text-analysis operators.

Everything here is a native Catalyst expression (regexp / array
functions — JVM-side, codegen'd) and has an exact DuckDB-SQL
equivalent, so every downstream operator stays oracle-checkable. The
portable 60-bit string hash is the first 15 hex chars of md5 — both
engines expose md5 and hex→decimal conversion, which is what makes
MinHash/SimHash signatures reproducible outside Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — modulus for the universal-hash family.
#: Small enough that a*h+b never overflows int64 in either engine.
HASH_P = 2_147_483_647

#: (a, b) parameters of the k=16 universal-hash family used for
#: MinHash permutations — fixed constants so Spark and the SQL oracle
#: compute identical signatures (generated once from a seeded PRNG).
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1_203_168_519, 1_309_725_163), (522_105_760, 1_487_932_253),
    (1_774_712_521, 636_439_767), (79_143_276, 1_926_198_315),
    (1_400_959_820, 858_472_161), (1_120_932_337, 241_699_889),
    (662_099_073, 1_518_687_861), (1_847_654_003, 341_291_021),
    (437_686_553, 1_044_584_161), (956_731_841, 1_742_383_021),
    (305_877_241, 712_995_907), (1_633_442_011, 105_535_847),
    (871_244_789, 1_311_899_273), (245_662_847, 559_551_133),
    (1_082_337_209, 1_965_112_627), (690_291_019, 430_725_521),
]


def norm_text(col) -> Column:
    """Canonical text: lowercase, collapse whitespace, trim.
    DuckDB: ``trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col) -> Column:
    """Lowercased alphanumeric word tokens.
    DuckDB: ``list_filter(regexp_split_to_array(lower(x),
    '[^a-z0-9]+'), t -> t <> '')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), "[^a-z0-9]+"), "")


def tokens_ws(col) -> Column:
    """Whitespace word tokens with case, diacritics, and non-Latin
    scripts PRESERVED — the byte-level pre-tokenizer. ``tokens()``
    silently deletes everything outside ``[a-z0-9]`` (CJK, Cyrillic,
    accents), which is fine for the Gopher-style ASCII quality gates
    but wrong for multilingual token budgeting; this splitter keeps
    every non-space byte so the byte-level BPE path sees the full
    corpus. ``\\s`` is ASCII-only in BOTH regex engines (Java default
    and RE2), so parity is structural.
    DuckDB: ``list_filter(regexp_split_to_array(x, '\\s+'),
    t -> t <> '')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(c, r"\s+"), "")


def utf8_byte_symbols(col) -> Column:
    """A string's UTF-8 bytes as an array of 2-char uppercase hex
    symbols (``'é' → ['C3','A9']``) — the byte-level BPE alphabet.
    Hex-pair STRINGS (not ints) keep the whole merge/fold machinery
    and its DuckDB replay verbatim: both engines' ``hex`` produce
    identical uppercase output (probed bit-equal on CJK/accented/
    ASCII).
    DuckDB: ``list_transform(generate_series(1, octet_length(
    encode(x))), i -> substr(hex(encode(x)), (i-1)*2+1, 2))``.

    Empty-string guard: Spark's ``sequence(1, 0)`` DESCENDS (→
    ``[1, 0]``, two phantom ``''`` symbols) where DuckDB's
    ``generate_series(1, 0)`` is empty — the same gotcha
    ``script_lang_id`` guards in its pair walk. Guard here at the
    source so every consumer (band counts, script profiles, BPE)
    sees the DuckDB-equivalent empty array."""
    c = F.col(col) if isinstance(col, str) else col
    hexed = F.hex(F.encode(c, "UTF-8"))
    return F.when(
        F.octet_length(c) < 1, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.octet_length(c)),
            lambda i: F.substring(hexed, (i - 1) * 2 + 1, 2),
        )
    )


def byte_shingles(col, n: int = 12) -> Column:
    """Byte n-gram shingles as hex substrings — the script-agnostic
    dedup alphabet. ``word_shingles`` inherits ``tokens()``'s
    ``[a-z0-9]`` alphabet, so CJK/Cyrillic/accented text contributes
    NOTHING to shingle dedup; byte n-grams over the UTF-8 encoding
    see every script without a Unicode regex anywhere. A shingle is
    the ``2n``-char slice of ``hex(encode(text))`` starting at an odd
    (byte-aligned) offset — the hex string IS the byte sequence, so
    no array of symbols is ever materialized (pure codegen). Both
    engines' ``hex`` produce identical uppercase output (probed
    bit-equal on CJK/accented/ASCII for the byte-level BPE path).
    Documents shorter than ``n`` bytes yield an empty array.

    ``n=12`` bytes spans ~4 CJK chars / ~2 short ASCII words — the
    character-n-gram regime multilingual near-dup pipelines use
    (CCNet-style), sized so a shingle rarely survives by chance.
    DuckDB: ``CASE WHEN octet_length(encode(x)) < n THEN [] ELSE
    list_transform(range(1, octet_length(encode(x)) - n + 2),
    i -> substr(hex(encode(x)), (i-1)*2+1, 2n)) END``."""
    c = F.col(col) if isinstance(col, str) else col
    hexed = F.hex(F.encode(c, "UTF-8"))
    nb = F.octet_length(c)
    return F.when(nb < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), nb - (n - 1)),
            lambda i: F.substring(hexed, (i - 1) * 2 + 1, 2 * n),
        )
    )


def word_shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles from a text column (empty array when the
    document has fewer than n tokens).
    DuckDB: ``list_transform(range(1, len(toks)-n+2),
    i -> array_to_string(toks[i:i+n-1], ' '))``."""
    toks = tokens(col)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def hash60(col) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 → bigint.
    DuckDB: ``(('0x' || substr(md5(x), 1, 15)))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_term(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation of a 60-bit hash value."""
    return (F.lit(a) * (h % F.lit(HASH_P)) + F.lit(b)) % F.lit(HASH_P)
