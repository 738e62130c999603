"""Text-analysis expression builders (SURVEY §2 X3 / north-star).

Everything is built-in-function composition (split/regexp/aggregate) —
JVM-side, codegen-friendly. Python appears nowhere on the per-row path,
so these scale to a 100 TB documents table as pure map-stage work with
zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, deterministic stopword lists per language for the n-gram
# heuristic language scorer. Public knowledge (most-frequent function
# words); intentionally tiny so the expression stays cheap.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "del"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"],
}

_WORD_RE = r"\s+"
# BPE-ish token regex: runs of word chars, or single non-space symbols —
# approximates subword pre-tokenization (GPT-2-style split on
# letter/digit/symbol boundaries).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text → array<string>.
    Filters the empty-string artifacts `split` leaves at the edges."""
    arr = F.split(F.lower(F.trim(_c(text))), _WORD_RE)
    return F.filter(arr, lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokenize(text)).cast("long")


def bpe_ish_tokens(text: Column | str) -> Column:
    """Regex pre-tokenization: letter runs / digit runs / single symbols."""
    return F.regexp_extract_all(F.lower(_c(text)), F.lit(BPE_TOKEN_RE), 0)


def bpe_ish_token_count(text: Column | str) -> Column:
    return F.size(bpe_ish_tokens(text)).cast("long")


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-gram array via sequence+transform (no UDF)."""
    t = F.lower(_c(text))
    length = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(length - F.lit(n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.substring(t, i, n))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles (array of space-joined k-grams) for MinHash."""
    toks = tokenize(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(-1)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array().cast("array<string>"))
    )


def quality_punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty docs)."""
    t = _c(text)
    total = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def quality_stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are top-frequency function words — a
    cheap fluency signal for quality filtering."""
    toks = tokenize(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def language_scores(text: Column | str) -> Column:
    """Struct of per-language stopword-hit ratios (n-gram heuristic
    language ID). Argmax of the struct fields = predicted language."""
    return F.struct(
        *[quality_stopword_ratio(text, lang).alias(lang) for lang in STOPWORDS]
    )


def predict_language(text: Column | str) -> Column:
    """Heuristic language ID: language whose stopword list hits most.
    Deterministic tie-break: first language in STOPWORDS order wins
    (array_position returns the FIRST index of the max); returns 'und'
    (undetermined) when no stopword hits at all.

    Expression-size note: the argmax is built as ONE score array
    consumed by array_max/array_position rather than a greatest() +
    per-language when-chain. The chain form re-inlines every score
    (and the greatest() of all of them) per branch — ~n² copies of the
    tokenize subtree — which made Catalyst optimize/codegen the
    DOMINANT cost of any plan embedding this expression (measured
    ~4 s of driver time per consuming query at 4 languages). The
    array form references the score subtree a constant 3 times, so
    the tree stays linear in the language count."""
    langs = list(STOPWORDS)
    scores = F.array(*[quality_stopword_ratio(text, lang) for lang in langs])
    best = F.array_max(scores)
    pick = F.element_at(
        F.array(*[F.lit(lang) for lang in langs]),
        F.array_position(scores, best).cast("int"),
    )
    return F.when(best > 0, pick).otherwise(F.lit("und"))


def doc_fingerprint(text: Column | str, modulus: int = 2**31 - 1) -> Column:
    """Deterministic rolling-hash document fingerprint (polynomial hash
    over character codes, Rabin-Karp style), built from aggregate() so
    it is identical across engines that implement the same arithmetic.
    Modulus 2^31-1 keeps every intermediate (acc*257+255) well under
    2^63 — no int64 overflow under Spark's ANSI mode."""
    t = _c(text)
    chars = F.split(t, "")
    base = F.lit(257)
    mod = F.lit(modulus)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch).cast("long")) % mod,
    )


def sha2_fingerprint(text: Column | str) -> Column:
    """Cryptographic content fingerprint for exact dedup (hex sha256)."""
    return F.sha2(_c(text), 256)


def winnow_fingerprints(
    text: Column | str,
    k: int = 5,
    window: int = 4,
    modulus: int = 2**31 - 1,
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k-gram with a polynomial rolling hash, then
    keep the minimum hash of each sliding window of `window` consecutive
    k-gram hashes. Guarantees: any shared substring of length
    >= k + window - 1 between two documents yields at least one shared
    fingerprint — the local-guarantee property plain 0 mod p sampling
    lacks.

    Built entirely from JVM-side array expressions (split/transform/
    aggregate/slice/array_min) — no Python UDF. NOTE: as a single
    Column expression the `hashes` subtree would be re-evaluated inside
    every sliding-window lambda iteration (O(n²·k) per doc — Spark's
    higher-order functions don't CSE across lambda invocations). Use
    ``with_winnow_fingerprints`` on a DataFrame instead: it stages
    chars/hashes as real columns so each is computed ONCE per row and
    the whole thing is linear in document length. This Column form is
    kept for short strings / tests.
    """
    t = _c(text)
    chars = F.split(t, "")
    return _winnow_from(chars, F.split(t, ""), k, window, modulus)


def _gram_hashes(chars: Column, k: int, modulus: int) -> Column:
    """Array of polynomial hashes of every k-gram of `chars`."""
    base = F.lit(257)
    mod = F.lit(modulus)
    return F.transform(
        F.sequence(F.lit(1), F.size(chars) - k + 1),
        lambda i: F.aggregate(
            F.slice(chars, i, k),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * base + F.ascii(ch).cast("long")) % mod,
        ),
    )


def _winnow_from(
    chars: Column, hashes_chars: Column, k: int, window: int, modulus: int
) -> Column:
    hashes = _gram_hashes(hashes_chars, k, modulus)
    n_h = F.size(hashes)
    mins = F.transform(
        F.sequence(F.lit(1), n_h - window + 1),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    short = F.array_sort(F.array_distinct(hashes))  # doc shorter than window
    # explicit NULL-in → NULL-out guard: without it the result flips
    # between [] and NULL depending on the session's size(NULL)
    # semantics (ANSI vs legacy sizeOfNull)
    return F.when(chars.isNull(), F.lit(None).cast("array<long>")).when(
        F.size(chars) < F.lit(k), F.array().cast("array<long>")
    ).otherwise(
        F.when(n_h < F.lit(window), short).otherwise(
            F.array_sort(F.array_distinct(mins))
        )
    )


def winnow_fingerprints_arrow(
    text: Column | str,
    k: int = 5,
    window: int = 4,
    modulus: int = 2**31 - 1,
) -> Column:
    """Vectorized winnowing (same values as ``winnow_fingerprints``):
    an Arrow-batched pandas UDF with numpy rolling hashes — O(n) per
    document and SIMD-friendly, vs the interpreted higher-order-function
    expression form which evaluates one lambda call per character.
    This is the 100 TB hot path: still a pure map stage (zero shuffle),
    with Python cost amortized over Arrow batches.

    Exactness: iterates Unicode CODE POINTS (numpy view over
    utf-32-le), matching the JVM path exactly — ``split('')`` is
    code-point aware (surrogate pairs stay whole) and ``ascii`` yields
    the code point — so fingerprints are bit-identical to the
    expression form for ALL text including non-BMP (emoji, musical
    symbols); NULL text propagates NULL, as the expression's
    when()-over-null does. Unit tests pin both
    (tests/test_functions.py). Round-1 ADVICE caught the earlier
    UTF-16-code-unit iteration diverging on non-BMP input.
    """
    from pyspark.sql.functions import pandas_udf

    base = 257
    # base^(k-1-j) mod M per k-gram position: code points < 2^21, so
    # each addend is < 2^21 * 2^31 and the k-term sum < k*2^52 —
    # int64-safe for any sane k, so one final mod suffices.
    powers = [pow(base, k - 1 - j, modulus) for j in range(k)]

    @pandas_udf("array<long>")
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            if s is None:
                # expression form propagates NULL (split(NULL) nulls
                # the whole when-chain) — match it exactly
                out.append(None)
                continue
            c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            n = c.size
            if n < k:
                out.append(np.empty(0, dtype=np.int64))
                continue
            m = n - k + 1
            h = np.zeros(m, dtype=np.int64)
            for j in range(k):  # k vector ops, not n scalar ops
                h += c[j : j + m] * powers[j]
            h %= modulus
            if m < window:
                out.append(np.unique(h))
                continue
            mins = np.lib.stride_tricks.sliding_window_view(h, window).min(
                axis=1
            )
            out.append(np.unique(mins))
        return pd.Series(out)

    return _winnow(_c(text))


def with_winnow_fingerprints(
    df,
    text_col: str = "text",
    out_col: str = "fp",
    k: int = 5,
    window: int = 4,
    modulus: int = 2**31 - 1,
):
    """DataFrame-level winnowing (see winnow_fingerprints): stages the
    char array and the k-gram hash array as intermediate columns so
    each is evaluated once per row — linear cost. CollapseProject will
    not inline them back (each is non-cheap and referenced more than
    once), so the plan keeps the staged evaluation."""
    base = F.lit(257)
    mod = F.lit(modulus)
    chars = F.col("__chars")
    hashes = F.col("__hashes")
    n_h = F.size(hashes)
    mins = F.transform(
        F.sequence(F.lit(1), n_h - window + 1),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    short = F.array_sort(F.array_distinct(hashes))
    # NULL guard: same rationale as _winnow_from — session-independent
    # NULL-in → NULL-out
    fp = F.when(
        chars.isNull(), F.lit(None).cast("array<long>")
    ).when(
        F.size(chars) < F.lit(k), F.array().cast("array<long>")
    ).otherwise(
        F.when(n_h < F.lit(window), short).otherwise(
            F.array_sort(F.array_distinct(mins))
        )
    )
    return (
        df.withColumn("__chars", F.split(F.col(text_col), ""))
        .withColumn(
            "__hashes",
            F.transform(
                # empty when the doc is shorter than k (sequence(1, n<=0)
                # would DESCEND and feed slice a 0 start)
                F.when(
                    F.size(chars) >= k,
                    F.sequence(F.lit(1), F.size(chars) - k + 1),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.aggregate(
                    F.slice(chars, i, k),
                    F.lit(0).cast("long"),
                    lambda acc, ch: (acc * base + F.ascii(ch).cast("long"))
                    % mod,
                ),
            ),
        )
        .withColumn(out_col, fp)
        .drop("__chars", "__hashes")
    )
