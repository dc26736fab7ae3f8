"""Text-analysis expressions for the training-data tier (SURVEY.md §7.5).

Everything is a native Catalyst expression (split / transform / filter /
aggregate over arrays) — no Python UDFs, so these run inside WholeStageCodegen
and scale linearly with input bytes. The same formulas are mirrored 1:1 in
DuckDB SQL by the harness oracles, which pins the semantics.

Design note for 100 TB: all of these are embarrassingly parallel map-side
expressions; the only shuffles in the dedup/similarity consumers are the
groupBys on fingerprints/buckets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword sets for the n-gram/stopword lang-ID heuristic.
#: Deliberately small and frozen: they are part of the operator's contract
#: (the oracle SQL embeds the same sets).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "pt": ("de", "da", "do", "que", "e", "o", "um"),
    "es": ("el", "la", "de", "los", "que", "y", "un"),
    "fr": ("le", "la", "les", "des", "et", "un", "une"),
    "de": ("der", "die", "das", "und", "ein", "zu", "ist"),
}

#: Priority order for argmax ties — fixed so prediction is deterministic.
LANG_PRIORITY: tuple[str, ...] = ("en", "pt", "es", "fr", "de")


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim — the canonical form every
    fingerprint/shingle builds on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Token counter (whitespace tokenization; a BPE-ish proxy is
    bpe_token_estimate)."""
    return F.size(tokens(col))


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token estimate without a vocab: word-pieces of ≤4 chars.

    ceil(len(word)/4) summed over words — a deterministic, engine-mirrorable
    stand-in for subword tokenizers (~4 chars/token heuristic).
    """
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingle array over the normalized text (MinHash input).

    sequence+transform keeps it columnar; short texts yield one whole-text
    shingle (greatest(...,1) guard).
    """
    norm = normalize_text(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(n)),
    )


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram array (space-joined) — the Jaccard dedup unit."""
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def stopword_hits(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    """How many tokens fall in `stopwords` (multiset count, not distinct)."""
    lit_set = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(lit_set, t)))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    return stopword_hits(col, stopwords) / F.greatest(token_count(col), F.lit(1))


def predict_lang(col: Column | str) -> Column:
    """Stopword-ratio argmax language ID with fixed priority tie-breaking.

    'und' when no language scores a single stopword hit.
    """
    hit_cols = {lang: stopword_hits(col, sw) for lang, sw in LANG_STOPWORDS.items()}
    best = None
    for lang in LANG_PRIORITY:
        cond = F.lit(True)
        for other in LANG_PRIORITY:
            if other != lang:
                # strictly-greater against earlier-priority langs, >= later
                op = (
                    hit_cols[lang] > hit_cols[other]
                    if LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang)
                    else hit_cols[lang] >= hit_cols[other]
                )
                cond = cond & op
        clause = F.when((hit_cols[lang] > 0) & cond, F.lit(lang))
        best = clause if best is None else best.when(
            (hit_cols[lang] > 0) & cond, F.lit(lang)
        )
    return best.otherwise(F.lit("und"))


def punct_ratio(col: Column | str) -> Column:
    """Share of characters that are not [a-z0-9 ] in the normalized text."""
    norm = normalize_text(col)
    stripped = F.regexp_replace(norm, r"[^a-z0-9 ]", "")
    return (F.length(norm) - F.length(stripped)) / F.greatest(
        F.length(norm), F.lit(1)
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic document quality score in [0, 1]:

        0.4·stopword_ratio(en) + 0.3·min(tokens/100, 1) + 0.3·(1 − punct_ratio)

    Mirrors the length/punct/stopword family of pretraining quality filters,
    frozen into an engine-mirrorable formula.
    """
    return (
        F.lit(0.4) * stopword_ratio(col, LANG_STOPWORDS["en"])
        + F.lit(0.3) * F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
    )


def fingerprint(col: Column | str) -> Column:
    """Canonical-form MD5 fingerprint (exact-dedup key). MD5 over the
    normalized text is engine-portable (same hex in Spark and DuckDB)."""
    return F.md5(normalize_text(col).cast("binary"))
