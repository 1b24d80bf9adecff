"""Text-analysis column expressions for the training-data pipeline:
token counting, quality scoring, language ID, fingerprinting.

All JVM-side (split / regexp / higher-order functions) — these run
inside whole-stage codegen over billions of documents with no Python
in the loop. Each expression has an exact DuckDB twin so the plans in
plans/datapipe.py are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny multilingual marker-stopword table for the heuristic language
# ID. Real corpora would use char-n-gram profiles (same plan shape:
# per-row expression, no shuffle); the fixture's synthetic texts share
# one vocabulary, so markers keep the heuristic deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "los"),
    "fr": ("le", "la", "les"),
    "zh": ("的", "是", "了"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def n_tokens(text_col: str) -> Column:
    return F.expr(f"size(split({text_col}, ' '))").cast("long")


def n_alpha_tokens(text_col: str) -> Column:
    """Tokens that are purely ASCII-alphabetic (regex shared verbatim
    with DuckDB's RE2 — keep the pattern in the common subset)."""
    return F.expr(
        f"size(filter(split({text_col}, ' '), w -> w rlike '^[a-z]+$'))"
    ).cast("long")


def n_stopwords(text_col: str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    words = ", ".join(f"'{w}'" for w in stopwords)
    return F.expr(
        f"size(filter(split({text_col}, ' '), w -> w IN ({words})))"
    ).cast("long")


def lang_score(text_col: str, lang: str) -> Column:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return F.expr(f"size(filter(split({text_col}, ' '), w -> w IN ({markers})))")


def lang_id(text_col: str) -> Column:
    """Argmax of marker-stopword hits; 'und' (undetermined) when no
    marker fires. Deterministic tie-break by language code order."""
    expr: Column = F.lit("und")
    best: Column = F.lit(0)
    for code in sorted(LANG_MARKERS):  # later wins only on strict >
        score = lang_score(text_col, code)
        expr = F.when(score > best, F.lit(code)).otherwise(expr)
        best = F.greatest(best, score)
    return expr


def quality_score(text_col: str) -> Column:
    """Composite [0,1] quality: length credit + alpha ratio −
    stopword-spam penalty. The exact formula is mirrored in
    plans/datapipe.py's oracle SQL."""
    nt = n_tokens(text_col).cast("double")
    alpha_ratio = n_alpha_tokens(text_col).cast("double") / nt
    stop_ratio = n_stopwords(text_col).cast("double") / nt
    length_credit = F.least(nt / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_credit + F.lit(0.4) * alpha_ratio + F.lit(0.2) * (1 - stop_ratio), 6
    )


def fingerprint(text_col: str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (the canonical 'fingerprint method' for fuzzy
    dedup preprocessing)."""
    # explicit NULL propagation: concat_ws treats a NULL array as ''
    # (it never returns NULL), which would fingerprint NULL text as
    # md5('') while SQL string semantics — and the DuckDB oracle —
    # yield NULL
    return F.expr(
        f"CASE WHEN {text_col} IS NULL THEN NULL"
        f" ELSE substring(md5(concat_ws(' ',"
        f" array_sort(array_distinct(split({text_col}, ' '))))), 1, 16) END"
    )


def dup_word_frac(text_col: str) -> Column:
    """Fraction of word occurrences that repeat an earlier word —
    the Gopher-style intra-document repetition signal (1 − distinct/
    total). Row-local, whole-stage-codegen friendly."""
    w = f"split(lower({text_col}), ' ')"
    return F.expr(
        f"round(1.0d - cast(size(array_distinct({w})) as double) / size({w}), 6)"
    )


def adj_repeat_frac(text_col: str) -> Column:
    """Fraction of adjacent word pairs that are the same word twice
    ("very very very …" stutter). ``get()`` (0-based, NULL out of
    bounds) keeps the lambda ANSI-safe for 1-token docs."""
    # the word array is BOUND ONCE (one-element-array transform idiom):
    # interpreted HOF lambdas re-evaluate an inlined split() per
    # element — two gets per position made this O(words²) per row
    # (r9; same fix as shingles_expr, identical output values)
    w = f"split(lower({text_col}), ' ')"
    return F.expr(
        f"element_at(transform(array({w}), ws -> "
        f"round(cast(size(filter(sequence(1, greatest(size(ws) - 1, 1)), "
        f"i -> get(ws, i) = get(ws, i - 1))) as double) "
        f"/ greatest(size(ws) - 1, 1), 6)), 1)"
    )


def dup_2gram_frac(text_col: str) -> Column:
    """Fraction of word 2-gram occurrences that are duplicates — the
    boilerplate signal (repeated headers/footers inflate it even when
    single-word repetition looks normal)."""
    # word array bound once — the inlined slice({w}) per 2-gram made
    # this O(words²) per row (r9; same fix as shingles_expr, identical
    # output values)
    w = f"split(lower({text_col}), ' ')"
    grams = (
        "transform(sequence(0, greatest(size(ws) - 2, 0)), "
        "i -> concat_ws(' ', slice(ws, i + 1, 2)))"
    )
    return F.expr(
        f"element_at(transform(array({w}), ws -> "
        f"round(1.0d - cast(size(array_distinct({grams})) as double) "
        f"/ greatest(size(ws) - 1, 1), 6)), 1)"
    )


# GPT-2-style pretokenizer, restricted to the Java-regex ∩ RE2 common
# subset (no lookahead): contractions, space-prefixed letter runs,
# digit runs capped at 3 (BPE tokenizers split long numbers), punct
# runs, residual whitespace. Shared verbatim with the DuckDB oracle.
# whitespace is spelled as an EXPLICIT class: Java \s includes \x0B
# (vertical tab) while RE2 \s does not, so bare \s would let the two
# engines tokenize '.\x0B' differently. The explicit class is the
# actual Java∩RE2 contract.
_WS = r" \t\n\x0B\f\r"
BPE_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[a-zA-Z]+| ?[0-9]{1,3}"
    rf"| ?[^a-zA-Z0-9{_WS}]+|[{_WS}]+"
)


def n_bpe_tokens(text_col: str) -> Column:
    """Token count under the BPE-ish pretokenize regex — the
    scale-path estimator for 'how many tokens will the trainer see'
    (whitespace counting undercounts punctuation-heavy docs)."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))).cast(
        "long"
    )
