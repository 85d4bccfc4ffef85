"""Spell correction over the corpus lexicon (SymSpell-style deletes index).

Reference behavior: Marginalia exposes a ``SpellChecker`` built on SymSpell
(``code/functions/math/java/nu/marginalia/functions/math/dict/SpellChecker.java:12-21``,
served through ``MathGrpcService`` / ``MathClient.spellCheck``) that returns
dictionary words sorted by edit distance for a possibly-misspelled query
word. This module re-expresses it Spark-first over the index's own lexicon
(term → collection frequency), which is the natural dictionary for a
transcript corpus — suggestions are ranked (distance ASC, ctf DESC, term
ASC), so frequent corpus terms win ties exactly like a frequency-weighted
SymSpell verdict.

The scale path is the SymSpell *deletes index*: every lexicon term is
expanded (pure JVM array expressions — no Python) into all variants
reachable by deleting up to ``max_edits`` characters; a probe word's own
delete-variants then meet candidate terms through a broadcast join on the
variant string instead of an O(|vocab|) scan per probe. The classic
completeness argument: if ``lev(p, t) <= d`` then deleting at most ``d``
characters from each of ``p`` and ``t`` yields a common string (a
substitution is one delete on each side, an insert/delete is one delete on
one side), so the join over radius-``d`` delete neighborhoods finds every
candidate within Levenshtein distance ``d``. The join also surfaces FALSE
candidates (delete-neighborhood overlap does not imply small edit
distance), so an exact ``levenshtein() <= d`` verify runs after the join —
the final result equals the brute-force scan, which is exactly what the
DuckDB oracle computes.

At 100 TB / 100M-term vocab the deletes index is ~Σ(1 + n + n²/2) rows; a
production build would bound it with SymSpell's prefix truncation (deletes
over the first 7 characters only). It is built once per index (alongside
the lexicon), is re-used by every probe batch, and the probe side of the
join is always tiny → broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _deletes1(s: F.Column) -> F.Column:
    """Array of all strings formed by deleting exactly one char of ``s``
    (empty array for the empty string — also keeps ``sequence`` ascending)."""
    return F.when(
        F.length(s) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                s.substr(F.lit(1), i - F.lit(1)),
                s.substr(i + F.lit(1), F.length(s)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def delete_variants(s: F.Column, max_edits: int = 2) -> F.Column:
    """All distinct strings reachable from ``s`` by 0..max_edits deletions
    (including ``s`` itself), as one JVM array expression."""
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2")
    d1 = _deletes1(s)
    parts = [F.array(s), d1]
    if max_edits == 2:
        parts.append(F.flatten(F.transform(d1, lambda v: _deletes1(v))))
    return F.array_distinct(F.concat(*parts))


def build_deletes_index(
    lexicon: DataFrame, max_edits: int = 2, max_term_length: int = 24
) -> DataFrame:
    """lexicon(term, ctf, ...) → (variant, term, ctf) deletes index.

    ``max_term_length`` bounds the quadratic variant blow-up on pathological
    terms (URLs, hashes): terms longer than the cap cannot be within
    ``max_edits`` of any reasonable query word of ≤ cap−max_edits chars
    anyway, so the index simply omits them — the verify step keeps the
    semantics exact for all probes up to that length.
    """
    lex = lexicon.filter(F.length("term") <= max_term_length)
    return lex.select(
        F.explode(delete_variants(F.col("term"), max_edits)).alias("variant"),
        "term",
        "ctf",
    )


def suggest(
    spark: SparkSession,
    deletes_index: DataFrame,
    probes: list[str],
    max_edits: int = 2,
    k: int = 5,
) -> DataFrame:
    """(probe, suggestion, dist, ctf) — top-``k`` corpus spell corrections
    per probe word, ranked (distance ASC, ctf DESC, term ASC).

    The probe side (|probes| × ~len² delete variants) is broadcast; the
    deletes index is never scanned beyond the hash-join probe. The exact
    ``levenshtein`` verify after the join makes the result identical to a
    brute-force scan of the lexicon (see module docstring).
    """
    pdf = spark.createDataFrame(
        [(p,) for p in sorted(set(probes))], "probe string"
    )
    pvar = pdf.select(
        "probe",
        F.explode(
            delete_variants(F.lower(F.col("probe")), max_edits)
        ).alias("variant"),
    )
    cand = (
        deletes_index.join(F.broadcast(pvar), "variant")
        .select("probe", F.col("term").alias("suggestion"), "ctf")
        .distinct()
        .withColumn(
            "dist",
            F.levenshtein(F.col("probe"), F.col("suggestion")).cast("long"),
        )
        .filter(F.col("dist") <= max_edits)
    )
    w = Window.partitionBy("probe").orderBy(
        "dist", F.col("ctf").desc(), "suggestion"
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe", "suggestion", "dist", F.col("ctf").cast("long").alias("ctf"))
    )


# --- typeahead prefix suggestions -------------------------------------------

#: the reference indexes word prefixes up to 16 chars; longer probes hit the
#: 16-char bucket and post-filter (PrefixSearchStructure.java:18-19,136-150)
MAX_INDEXED_PREFIX = 16
#: probes shorter than this return no suggestions (Suggestions.java:24,94-109)
MIN_SUGGEST_LENGTH = 3


def prefix_suggest(
    lexicon: DataFrame,
    probes: list[str],
    k: int = 10,
    min_word_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Typeahead completions over the corpus lexicon — the reference's
    suggestions service (``code/services-core/assistant-service/java/nu/
    marginalia/assistant/suggest/Suggestions.java:90-130`` serving
    ``PrefixSearchStructure.getTopCompletions``): top-``k`` dictionary
    words per probe prefix, highest score first.

    Reference semantics mirrored: probes are lowercased and left-stripped
    (``Suggestions.java:98``); probes shorter than ``MIN_SUGGEST_LENGTH``
    yield nothing (``:94-96,107-109``); only words longer than 3 chars
    with count > 1 enter the dictionary (``:55,79``); results are ranked
    score-descending (``:116``) — score here is the lexicon's collection
    frequency, with ties pinned to ascending term (the reference leaves
    tie order to sort stability; pinning makes the result reproducible).

    Spark-first shape — the reference's in-heap prefix hash index becomes
    an equi-join key: each lexicon term emits its prefix at each DISTINCT
    probe length (capped at ``MAX_INDEXED_PREFIX``, the reference's own
    bucket cap), the tiny probe relation broadcasts, and probes longer
    than the cap post-filter with ``startswith`` exactly like the
    reference's long-prefix fallback. No nested-loop LIKE join, no full
    lexicon sort: one broadcast hash join + one per-probe top-k window.
    At rest the lexicon is term-sorted parquet, so a single-probe lookup
    also prunes to the matching row groups via min/max stats.
    """
    norm = sorted(
        {p.lower().lstrip() for p in probes if len(p.lower().lstrip()) >= MIN_SUGGEST_LENGTH}
    )
    spark = lexicon.sparkSession
    if not norm:
        return spark.createDataFrame(
            [], "probe string, suggestion string, ctf long"
        )
    pdf = spark.createDataFrame(
        [(p, min(len(p), MAX_INDEXED_PREFIX)) for p in norm],
        "probe string, plen int",
    )
    plens = sorted({min(len(p), MAX_INDEXED_PREFIX) for p in norm})
    words = lexicon.filter(
        (F.length("term") >= min_word_len) & (F.col("ctf") >= min_count)
    )
    keyed = words.select(
        "term",
        "ctf",
        F.explode(
            F.array(*[F.struct(F.lit(n).alias("plen"),
                               F.substring("term", 1, n).alias("key"))
                      for n in plens])
        ).alias("pk"),
    ).select("term", "ctf", F.col("pk.plen").alias("plen"), F.col("pk.key").alias("key"))
    cand = keyed.join(
        F.broadcast(
            pdf.withColumn("key", F.col("probe").substr(F.lit(1), F.col("plen")))
        ),
        ["plen", "key"],
    ).filter(F.col("term").startswith(F.col("probe")))
    w = Window.partitionBy("probe").orderBy(F.col("ctf").desc(), "term")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe", F.col("term").alias("suggestion"), F.col("ctf").cast("long").alias("ctf"))
    )
