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


#: GPT-2-style pre-tokenization split (Radford et al. 2019; the
#: pattern every GPT-family byte-level BPE tokenizer uses) as a
#: documented PORTABLE SUBSET both regex engines (Java and RE2) parse
#: identically — no ``\\p{...}`` Unicode property classes (their
#: Unicode tables can drift between engines) and no lookahead (RE2
#: has none). Divergences from the canonical pattern, all documented:
#:
#: - ``\\s`` becomes the explicit Unicode whitespace enumeration
#:   :data:`GPT2_WS` (ASCII ws + NEL/NBSP/Ogham space mark + the
#:   U+2000 space block + U+2028/29/2F + U+205F + U+3000) — Java's
#:   ``\\s`` includes U+000B where RE2's does not, so the class is
#:   spelled out and identical in both engines.
#: - ``\\p{L}`` (letters) becomes: ASCII ``A-Za-z`` plus every
#:   non-ASCII code point EXCEPT the whitespace above and the
#:   explicit punctuation blocks below. Non-Latin scripts, accented
#:   Latin, fullwidth letters and fullwidth digits all land in the
#:   letter run — only genuinely punctuation-shaped blocks are
#:   carved out.
#: - ``\\p{N}`` (digits) becomes ASCII ``0-9`` (non-ASCII decimal
#:   digits ride in the letter run; Latin-1 superscripts ¹²³ in the
#:   punctuation run).
#: - non-ASCII punctuation = the blocks dominating web text: C1
#:   controls, Latin-1 punctuation/symbols U+00A1-BF (¡«»¿©§· — ª µ º
#:   stay letters), General Punctuation U+200B-206F minus its spaces
#:   (curly quotes, dashes, ellipsis), CJK Symbols & Punctuation
#:   U+3001-303F (、。「」), and the fullwidth punctuation sub-ranges
#:   of U+FF00-FF65 (！？（） — fullwidth letters/digits stay
#:   letters, as in ``\\p{L}``/``\\p{N}``).
#: - the canonical ``\\s+(?!\\S)|\\s+`` whitespace rule needs negative
#:   lookahead; :func:`pre_tokens_gpt2` reproduces its EXACT token
#:   stream with a plain greedy ``[ws]+`` alternative plus a
#:   deterministic post-fix fold (see there).
GPT2_WS = (
    " \t\n\x0b\f\r\x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)

_GPT2_WS_CLASS = (
    r"[ \t\n\x0b\f\r\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}"
    r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]"
)
_GPT2_LETTER = (
    r"[A-Za-z\x{aa}\x{b5}\x{ba}"
    r"\x{c0}-\x{167f}\x{1681}-\x{1fff}\x{2070}-\x{2fff}"
    r"\x{3040}-\x{feff}"
    r"\x{ff10}-\x{ff19}\x{ff21}-\x{ff3a}\x{ff41}-\x{ff5a}"
    r"\x{ff66}-\x{10ffff}]"
)
_GPT2_PUNCT = (
    r"[\x00-\x08\x0e-\x1f!-/:-@\[-`{-~\x7f"
    r"\x{80}-\x{84}\x{86}-\x{9f}\x{a1}-\x{a9}\x{ab}-\x{b4}"
    r"\x{b6}-\x{b9}\x{bb}-\x{bf}"
    r"\x{200b}-\x{2027}\x{202a}-\x{202e}\x{2030}-\x{205e}"
    r"\x{2060}-\x{206f}\x{3001}-\x{303f}"
    r"\x{ff00}-\x{ff0f}\x{ff1a}-\x{ff20}\x{ff3b}-\x{ff40}"
    r"\x{ff5b}-\x{ff65}]"
)
#: NOTE: the canonical contraction alternatives (``'s|'t|'re|'ve|'m|
#: 'll|'d``) are deliberately NOT in the extraction pattern — they are
#: formed by the post-fix fold instead. In the canonical scan a
#: contraction fires only when the position lands ON the apostrophe
#: (after a completed letter/digit/punct match); an extraction-level
#: alternative also fired right after a greedy whitespace run, where
#: the canonical re-scan (one space left by ``\\s+(?!\\S)``) matches
#: ``" '"`` as a punct run and never forms a contraction (r9 review).
#: With contractions removed, a boundary apostrophe arrives as a bare
#: ``'`` punct token and the fold merges it with the following letter
#: run's canonical-order suffix.
GPT2_SPLIT_PATTERN = (
    f" ?{_GPT2_LETTER}+"
    "| ?[0-9]+"
    f"| ?{_GPT2_PUNCT}+"
    f"|{_GPT2_WS_CLASS}+"
)


def pre_tokens_gpt2(col) -> Column:
    """GPT-2-style pre-tokens: contractions, (space-prefixed) letter
    runs, digit runs, punctuation runs, whitespace runs — the split
    real token budgets are paid in (whitespace-only pre-tokenization
    fuses punctuation into words, so its counts diverge from any
    GPT-family tokenizer on punctuation-heavy web text).

    Extraction uses :data:`GPT2_SPLIT_PATTERN` (portable subset,
    documented above); two canonical behaviors are then reproduced
    EXACTLY by a deterministic post-fix fold over the extracted
    array:

    1. the lookahead-based whitespace rule — our greedy ``[ws]+``
       eats a whole whitespace run, but GPT-2 leaves the run's LAST
       character to the next token when it is a literal space
       (`` ?`` prefix) or as its own single-char token otherwise;
    2. contraction formation — a bare ``'`` punct token (the
       apostrophe at a true scan boundary: never space-prefixed,
       never inside a longer punct run like ``?!'``) merges with the
       following no-space letter run's ``s|t|re|ve|m|ll|d`` prefix
       (canonical alternation order; the first letters are distinct,
       so a per-prefix dispatch is equivalent), leaving the rest of
       the run as its own token. Matches GPT-2's quirks: ``'S``
       never contracts (the alternatives are lowercase), ``?!'s``
       keeps the apostrophe in the punct run, and a space before the
       apostrophe yields ``" '"`` + letters, never a contraction.

    The fold is the same left-to-right ``F.aggregate`` discipline as
    the BPE merge fold, so DuckDB ``list_reduce`` replays it
    bit-for-bit (:func:`gpt2_pretok_sql` — single source of truth
    for the oracle side)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(GPT2_SPLIT_PATTERN), 0)
    ws = F.lit(GPT2_WS)

    def _is_ws(t):
        # "token is a whitespace run" ⟺ its LAST char is whitespace:
        # letter/digit/punct runs may START with their optional
        # leading space but always END with a class character
        return F.contains(ws, F.substr(t, F.length(t), F.lit(1)))

    def step(acc, x):
        prev = F.element_at(acc, -1)
        plen = F.length(prev)
        head = F.substr(prev, F.lit(1), plen - F.lit(1))
        last = F.substr(prev, plen, F.lit(1))
        head_arr = F.when(plen > 1, F.array(head)).otherwise(
            F.array().cast("array<string>")
        )
        butlast = F.slice(acc, F.lit(1), F.size(acc) - 1)
        fix_space = F.concat(
            butlast, head_arr, F.array(F.concat(F.lit(" "), x))
        )
        fix_other = F.concat(butlast, head_arr, F.array(last), F.array(x))
        # contraction formation (docstring rule 2): canonical-order
        # suffix dispatch on the letter run following a bare "'"
        suf_len = (
            F.when(F.substr(x, F.lit(1), F.lit(1)).isin("s", "t", "m", "d"), F.lit(1))
            .when(F.substr(x, F.lit(1), F.lit(2)).isin("re", "ve", "ll"), F.lit(2))
            .otherwise(F.lit(0))
        )
        rest = F.substr(x, suf_len + F.lit(1), F.length(x))
        rest_arr = F.when(F.length(rest) > 0, F.array(rest)).otherwise(
            F.array().cast("array<string>")
        )
        merged = F.concat(
            butlast,
            F.array(F.concat(F.lit("'"), F.substr(x, F.lit(1), suf_len))),
            rest_arr,
        )
        return F.when(
            (F.size(acc) >= 1) & (prev == F.lit("'")) & (suf_len > 0),
            merged,
        ).when(
            (F.size(acc) >= 1) & _is_ws(prev) & ~_is_ws(x),
            F.when(last == " ", fix_space).otherwise(fix_other),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(toks, F.array().cast("array<string>"), step)


def gpt2_pretok_sql(expr: str) -> str:
    """The DuckDB twin of :func:`pre_tokens_gpt2`, generated from the
    SAME pattern constant (single source of truth): RE2
    ``regexp_extract_all`` + the whitespace post-fix as a
    ``list_reduce`` over singleton-wrapped tokens (the accumulator
    must share the element type — the BPE chain's convention)."""
    pat = GPT2_SPLIT_PATTERN.replace("'", "''")
    raw = f"regexp_extract_all({expr}, '{pat}')"
    ws = "(" + " || ".join(f"chr({ord(ch)})" for ch in GPT2_WS) + ")"
    prev = "acc[len(acc)]"
    head = (
        f"CASE WHEN length({prev}) > 1 "
        f"THEN [substr({prev}, 1, length({prev}) - 1)] "
        f"ELSE []::VARCHAR[] END"
    )
    last = f"substr({prev}, length({prev}), 1)"
    # contraction suffix length (fold rule 2) — same canonical-order
    # per-prefix dispatch as the Spark step
    suf = (
        "CASE WHEN substr(xl[1], 1, 1) IN ('s', 't', 'm', 'd') THEN 1 "
        "WHEN substr(xl[1], 1, 2) IN ('re', 've', 'll') THEN 2 "
        "ELSE 0 END"
    )
    return f"""CASE WHEN len({raw}) = 0 THEN []::VARCHAR[] ELSE list_reduce(
  list_transform({raw}, t -> [t]),
  (acc, xl) -> CASE
    WHEN len(acc) >= 1 AND {prev} = '''' AND ({suf}) > 0
    THEN list_concat(
           list_concat(acc[1:len(acc) - 1],
                       ['''' || substr(xl[1], 1, {suf})]),
           CASE WHEN length(xl[1]) > ({suf})
                THEN [substr(xl[1], ({suf}) + 1, length(xl[1]))]
                ELSE []::VARCHAR[] END)
    WHEN len(acc) >= 1
         AND instr({ws}, {last}) >= 1
         AND instr({ws}, substr(xl[1], length(xl[1]), 1)) = 0
    THEN CASE WHEN {last} = ' '
      THEN list_concat(list_concat(acc[1:len(acc) - 1], {head}),
                       [' ' || xl[1]])
      ELSE list_concat(list_concat(list_concat(
             acc[1:len(acc) - 1], {head}), [{last}]), [xl[1]])
      END
    ELSE list_concat(acc, xl) END
) END"""


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
