"""SFT example extraction from multi-turn transcripts.

The one transcript-native pipeline step the generic document operators
don't cover: turning conversations into (prompt, response) supervised
fine-tuning pairs. For every assistant turn, the example's prompt is the
rendered context — all prior turns in stable ``turn_idx`` order, each as
``role: text`` joined with newlines — and the response is the assistant
turn's text. This is the conversation analogue of the reference's
document→index handoff (documents keyed by conv_id with turns concatenated
under stable turn ordering — the same contract the index builder uses,
see operators/ingest.py); here the concatenation is *causal* (strictly
prior turns) instead of whole-document.

Scale shape: ONE shuffle on ``conv_id`` (the window partition key).
Per-conversation state is bounded by the longest conversation — the same
bound the sessionization and index-ingest paths already rely on — so no
skew treatment is needed beyond what a 10^12-turn corpus's conv_id
hash-partitioning already provides. Everything is JVM column expressions
(collect_list window + transform/array_join); no Python touches the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sft_pairs",
    "preference_pairs",
    "refusal_pattern",
    "refusal_flags",
    "refusal_stats",
]

# whitespace word-count spec shared with the DuckDB twin:
# len(list_filter(regexp_split_to_array(trim(x), '\s+'), t -> t <> ''))
def _n_words(col: F.Column) -> F.Column:
    toks = F.split(F.trim(col), r"\s+")
    return F.size(F.filter(toks, lambda t: t != "")).cast("long")


def sft_pairs(
    turns: DataFrame,
    max_context_turns: int | None = None,
    response_role: str = "assistant",
) -> DataFrame:
    """One row per ``response_role`` turn: the SFT training example.

    Output: ``conv_id, turn_idx, prompt, response, n_context_turns,
    n_prompt_words, n_response_words``. ``prompt`` is NULL when the turn
    has no prior context (a conversation-opening assistant turn) — such
    examples are usually dropped, and NULL makes that filter explicit
    rather than hiding it in an empty string.

    ``max_context_turns`` keeps only the LAST k prior turns (the context
    window a trainer actually packs); None keeps the whole prefix. The
    bound goes into the window FRAME (``ROWS k PRECEDING .. 1 PRECEDING``)
    rather than a post-gather slice, so a row of a 10k-turn conversation
    buffers k structs, not its whole prefix — per-row work is O(k), not
    O(position).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    if max_context_turns is not None:
        w = w.rowsBetween(-int(max_context_turns), -1)
    else:
        w = w.rowsBetween(Window.unboundedPreceding, -1)
    ctx = F.collect_list(
        F.struct(F.col("role"), F.col("text"))
    ).over(w)
    out = turns.select("conv_id", "turn_idx", "role", "text", ctx.alias("_ctx"))
    # NULL text renders as "role: " — concat(role, ': ', NULL) is NULL
    # and array_join SKIPS nulls, so an unguarded render would silently
    # drop the turn from the prompt while n_context_turns still counts it
    rendered = F.array_join(
        F.transform(
            F.col("_ctx"),
            lambda s: F.concat(
                s.role, F.lit(": "), F.coalesce(s.text, F.lit(""))
            ),
        ),
        "\n",
    )
    prompt = F.when(F.size("_ctx") > 0, rendered)
    # materialize the prompt ONCE, then derive the word count from the
    # materialized column — referencing the render expression twice makes
    # Catalyst evaluate the k-turn array_join twice per row (the
    # textstats.filter_chain shared-column pattern)
    staged = out.filter(F.col("role") == response_role).select(
        "conv_id",
        "turn_idx",
        prompt.alias("prompt"),
        F.col("text").alias("response"),
        F.size("_ctx").cast("long").alias("n_context_turns"),
    )
    return staged.select(
        "conv_id",
        "turn_idx",
        "prompt",
        "response",
        "n_context_turns",
        F.coalesce(_n_words(F.col("prompt")), F.lit(0)).alias("n_prompt_words"),
        _n_words(F.col("response")).alias("n_response_words"),
    )


def preference_pairs(
    candidates: DataFrame,
    prompt_col: str = "prompt",
    response_col: str = "response",
    score_col: str = "score",
) -> DataFrame:
    """Assemble (prompt, chosen, rejected) preference pairs — the DPO/RLHF
    data-prep step downstream of candidate generation.

    For every prompt with >= 2 distinct candidate responses, the chosen
    response is the score-argmax and the rejected one the score-argmin,
    with a response-digest tie-break so the pair is deterministic under
    any partitioning (a bare max_by would be free to return either of two
    equal-scored candidates). Exact duplicates of (response) within a
    prompt group collapse first — a duplicated candidate must not be able
    to become both chosen AND rejected.

    Two hash aggregations (candidate dedup, then argmax/argmin via
    max_by/min_by with a lexicographic (score, digest) struct order —
    partial-aggregatable, so map-side combine applies); prompt groups of
    any size never materialize as arrays. Output: ``prompt, chosen,
    rejected, score_chosen, score_rejected, n_candidates``.
    """
    p, r, s = F.col(prompt_col), F.col(response_col), F.col(score_col)
    dedup = candidates.groupBy(p.alias("prompt"), r.alias("response")).agg(
        F.max(s).alias("score")
    )
    s2, r2 = F.col("score"), F.col("response")
    ordk2 = F.struct(s2.alias("s"), F.md5(r2).alias("d"))
    pick = F.struct(s2.alias("s"), r2.alias("r"))
    out = dedup.groupBy("prompt").agg(
        F.max_by(pick, ordk2).alias("_c"),
        F.min_by(pick, ordk2).alias("_r"),
        F.count("*").cast("long").alias("n_candidates"),
    )
    return (
        out.filter(F.col("n_candidates") >= 2)
        .select(
            "prompt",
            F.col("_c.r").alias("chosen"),
            F.col("_r.r").alias("rejected"),
            F.col("_c.s").alias("score_chosen"),
            F.col("_r.s").alias("score_rejected"),
            "n_candidates",
        )
    )


# Canned-refusal openers, normalized (lowercase, leading whitespace
# trimmed). A curation-time dictionary in the same spirit as the topic
# detectors' term lists (operators/topics.py): data, deliberately small,
# and overridable per deployment.
REFUSAL_MARKERS: tuple[str, ...] = (
    "i can't help with",
    "i cannot help with",
    "i can't assist with",
    "i cannot assist with",
    "i'm sorry, but i can't",
    "i am sorry, but i cannot",
    "i'm unable to",
    "i am unable to",
    "i won't be able to",
    "as an ai",
)


def refusal_pattern(markers: tuple[str, ...] = REFUSAL_MARKERS) -> str:
    """THE anchored refusal regex — one construction shared verbatim by
    :func:`refusal_flags`, the DuckDB oracle twin, and the test oracle, so
    the three can never drift. Leading whitespace is consumed by an
    explicit ASCII class (``[ \\t\\n\\x0B\\f\\r]`` — exactly Java ``\\s``;
    Spark ``ltrim`` strips only 0x20 spaces and RE2 ``\\s`` omits
    ``\\x0B``, so neither is a portable spelling). Java ∩ RE2 ∩ Python
    ``re`` subset throughout, same portability rule as redact.py.

    An empty marker tuple would compile to ``^(?:)`` — an alternation that
    matches EVERYTHING, silently flagging the whole corpus — so it raises.
    """
    import re as _re

    if not markers:
        raise ValueError(
            "refusal markers must be non-empty: '^(?:)' matches every string"
        )
    return (
        r"^[ \t\n\x0B\f\r]*(?:"
        + "|".join(_re.escape(m) for m in markers)
        + ")"
    )


def refusal_flags(
    turns: DataFrame,
    markers: tuple[str, ...] = REFUSAL_MARKERS,
    response_role: str = "assistant",
) -> DataFrame:
    """Flag canned-refusal response turns — the SFT-curation step that
    strips "I can't help with that" boilerplate before training.

    A turn is a refusal when its normalized text (lowercased, leading
    ASCII whitespace skipped — see :func:`refusal_pattern`) OPENS with any
    marker — prefix-anchored on purpose: a response that merely quotes or
    discusses a refusal phrase mid-text is not itself a refusal. The
    markers compile to one anchored alternation regex, so detection is a
    single JVM ``rlike`` per row: no shuffle, no Python, and the flag
    column fuses into whatever scan feeds it. A NULL text is never a
    refusal (the flag is two-state, so both ``filter(is_refusal)`` and
    ``filter(~is_refusal)`` partition the turns exactly).

    Output: the input columns plus ``is_refusal``. Compose with
    :func:`sft_pairs` (drop flagged responses before pairing) or
    aggregate per conversation for corpus refusal-rate dashboards.
    """
    pat = refusal_pattern(markers)
    return turns.withColumn(
        "is_refusal",
        (F.col("role") == response_role)
        & F.coalesce(F.lower(F.col("text")).rlike(pat), F.lit(False)),
    )


def refusal_stats(
    turns: DataFrame,
    markers: tuple[str, ...] = REFUSAL_MARKERS,
    response_role: str = "assistant",
) -> DataFrame:
    """Per-conversation refusal audit: response-turn count, refusal count,
    and the 6-decimal refusal rate. One hash aggregation on conv_id with
    map-side partials; the rate a curation job slices on before deciding
    which conversations to drop wholesale."""
    flagged = refusal_flags(turns, markers, response_role)
    n_resp = F.sum((F.col("role") == response_role).cast("long"))
    n_ref = F.sum(F.col("is_refusal").cast("long"))
    return flagged.groupBy("conv_id").agg(
        n_resp.alias("n_responses"),
        n_ref.alias("n_refusals"),
        F.when(
            n_resp > 0, F.round(n_ref.cast("double") / n_resp.cast("double"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("refusal_rate"),
    )
