"""SFT pair extraction: brute-force parity, context truncation, causality,
partitioning invariance, and the JVM-only one-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators import sft


def _turns(spark):
    rows = []
    for conv in range(6):
        n = 1 + (conv % 5)  # 1..5 turns
        for t in range(n):
            role = ["user", "assistant", "tool", "assistant"][t % 4]
            rows.append((f"c{conv}", t, role, f"text {conv} {t} word{t}"))
    # c6 OPENS with the response role: the conversation-opening example
    # must surface with a NULL prompt and n_prompt_words == 0
    rows += [("c6", 0, "assistant", "text 6 0 word0"),
             ("c6", 1, "user", "text 6 1 word1")]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def _brute(rows, k=None, response_role="assistant"):
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    out = {}
    for conv, ts in by_conv.items():
        ts.sort(key=lambda r: r[1])
        for i, r in enumerate(ts):
            if r[2] != response_role:
                continue
            ctx = ts[:i]
            if k is not None:
                ctx = ctx[-k:]
            prompt = "\n".join(f"{c[2]}: {c[3]}" for c in ctx) if ctx else None
            out[(conv, r[1])] = (
                prompt,
                r[3],
                len(ctx),
                len(prompt.split()) if prompt else 0,
                len(r[3].split()),
            )
    return out


def test_sft_pairs_brute_force(spark):
    turns = _turns(spark)
    rows = [tuple(r) for r in turns.collect()]
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["prompt"], r["response"], r["n_context_turns"],
            r["n_prompt_words"], r["n_response_words"],
        )
        for r in sft.sft_pairs(turns).collect()
    }
    assert got == _brute(rows)
    # conversation-opening assistant turns exist and carry NULL prompts
    # only when there genuinely is no context
    assert all((v[0] is None) == (v[2] == 0) for v in got.values())
    # ...and the fixture genuinely exercises that branch (c6 opens with
    # the response role): NULL prompt, zero counted prompt words
    assert got[("c6", 0)] == (None, "text 6 0 word0", 0, 0, 4)


def test_sft_pairs_truncation_and_role(spark):
    turns = _turns(spark)
    rows = [tuple(r) for r in turns.collect()]
    for k in (1, 2):
        got = {
            (r["conv_id"], r["turn_idx"]): (
                r["prompt"], r["response"], r["n_context_turns"],
                r["n_prompt_words"], r["n_response_words"],
            )
            for r in sft.sft_pairs(turns, max_context_turns=k).collect()
        }
        assert got == _brute(rows, k=k)
    got_tool = {
        (r["conv_id"], r["turn_idx"])
        for r in sft.sft_pairs(turns, response_role="tool").collect()
    }
    assert got_tool == set(_brute(rows, response_role="tool"))


def test_sft_pairs_causal_and_invariant(spark):
    """Prompt must never contain the response turn or later turns, and the
    result must be identical under any input partitioning/order."""
    turns = _turns(spark)
    out = sft.sft_pairs(turns, max_context_turns=3)
    for r in out.collect():
        if r["prompt"] is None:
            continue
        for line in r["prompt"].split("\n"):
            _, txt = line.split(": ", 1)
            t = int(txt.split()[2])
            assert t < r["turn_idx"]
    a = {tuple(r) for r in out.collect()}
    shuffled = turns.orderBy(F.rand(7)).repartition(13)
    b = {tuple(r) for r in sft.sft_pairs(shuffled, max_context_turns=3).collect()}
    assert a == b


def test_sft_pairs_plan_is_jvm_one_shuffle(spark):
    turns = _turns(spark)
    plan = (
        sft.sft_pairs(turns, max_context_turns=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "CartesianProduct"):
        assert bad not in plan, plan
    # createDataFrame inputs arrive via a parallelize RDD scan, so the only
    # Exchange is the window's conv_id hash partition
    assert plan.count("Exchange") == 1, plan


# --- conversation-prefix dedup (same transcript synthesis family) -----------


def test_conv_prefix_dedup_brute_force(spark):
    from marginaliasearch_spark.operators import dedup

    turns = _turns(spark)
    # plant a shared 2-turn opening on even conversations
    turns = turns.withColumn(
        "text",
        F.when(
            (F.regexp_extract("conv_id", r"c(\d+)", 1).cast("int") % 2 == 0)
            & (F.col("turn_idx") < 2),
            F.concat(F.lit("canned "), F.col("turn_idx").cast("string")),
        ).otherwise(F.col("text")),
    )
    rows = [tuple(r) for r in turns.collect()]
    for k in (1, 2, 3):
        got = {
            (r["conv_id"], r["n_dups"])
            for r in dedup.conv_prefix_dedup(turns, prefix_turns=k).collect()
        }
        fam = {}
        for conv in sorted({r[0] for r in rows}):
            pfx = sorted((r for r in rows if r[0] == conv), key=lambda r: r[1])[:k]
            key = "\n".join(f"{r[2]}: {r[3]}" for r in pfx)
            fam.setdefault(key, []).append(conv)
        want = {(min(cs), len(cs)) for cs in fam.values()}
        assert got == want, k
    # with k=2: c2/c4 share both canned turns (family of 2, canonical c2);
    # c0 has only one turn, so its shorter prefix stays a singleton
    got2 = {r["conv_id"]: r["n_dups"]
            for r in dedup.conv_prefix_dedup(turns, prefix_turns=2).collect()}
    assert got2["c2"] == 2 and got2["c0"] == 1


def test_conv_prefix_dedup_delimiter_injection(spark):
    """A turn whose TEXT contains a newline + 'role: text'-looking line
    must NOT collide with a genuinely two-turn prefix — the digest encoding
    is length-prefixed, not a pretty-printed join."""
    from marginaliasearch_spark.operators import dedup

    turns = spark.createDataFrame(
        [
            ("a", 0, "user", "hi\n9:assistant:2:ok"),
            ("b", 0, "user", "hi"),
            ("b", 1, "assistant", "ok"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {r["conv_id"]: r["n_dups"]
           for r in dedup.conv_prefix_dedup(turns, prefix_turns=2).collect()}
    assert got == {"a": 1, "b": 1}


def test_conv_prefix_dedup_jvm_plan(spark):
    from marginaliasearch_spark.operators import dedup

    plan = (
        dedup.conv_prefix_dedup(_turns(spark), prefix_turns=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "CartesianProduct"):
        assert bad not in plan, plan


# --- preference pairs -------------------------------------------------------


def _cands(spark):
    rows = [
        # p0: clear winner/loser
        ("p0", "long answer with many words", 5),
        ("p0", "short", 1),
        ("p0", "middling answer here", 3),
        # p1: score TIE at the top — digest must break it
        ("p1", "alpha", 4), ("p1", "bravo", 4), ("p1", "zulu", 2),
        # p2: duplicate candidate (same response twice) + one other
        ("p2", "dup", 2), ("p2", "dup", 2), ("p2", "other", 7),
        # p3: only one distinct response (duplicated) -> filtered out
        ("p3", "solo", 9), ("p3", "solo", 9),
        # p4: singleton -> filtered out
        ("p4", "alone", 1),
    ]
    return spark.createDataFrame(rows, "prompt string, response string, score long")


def test_preference_pairs_brute_force(spark):
    import hashlib

    from marginaliasearch_spark.operators import sft

    got = {
        r["prompt"]: (
            r["chosen"], r["rejected"], r["score_chosen"],
            r["score_rejected"], r["n_candidates"],
        )
        for r in sft.preference_pairs(_cands(spark)).collect()
    }

    def d(x):
        return hashlib.md5(x.encode()).hexdigest()

    cands = {}
    for p, rsp, s in [tuple(r) for r in _cands(spark).collect()]:
        cands.setdefault(p, {})[rsp] = max(s, cands.get(p, {}).get(rsp, s))
    want = {}
    for p, group in cands.items():
        if len(group) < 2:
            continue
        ch = max(group, key=lambda r: (group[r], d(r)))
        rj = min(group, key=lambda r: (group[r], d(r)))
        want[p] = (ch, rj, group[ch], group[rj], len(group))
    assert got == want
    # the tie in p1 resolved by digest, not input order
    assert got["p1"][0] == max(["alpha", "bravo"], key=d)
    # duplicated candidate never becomes both chosen and rejected
    assert got["p2"] == ("other", "dup", 7, 2, 2)
    assert "p3" not in got and "p4" not in got


def test_preference_pairs_partitioning_invariant(spark):
    from marginaliasearch_spark.operators import sft

    c = _cands(spark)
    a = {tuple(r) for r in sft.preference_pairs(c).collect()}
    b = {
        tuple(r)
        for r in sft.preference_pairs(c.orderBy(F.rand(3)).repartition(11)).collect()
    }
    assert a == b and a


# --- refusal detection ------------------------------------------------------


def test_refusal_flags_brute_force(spark):
    import re

    turns = spark.createDataFrame(
        [
            ("a", 0, "user", "I cannot help with this"),      # wrong role
            ("a", 1, "assistant", "I cannot help with that"),  # refusal
            ("a", 2, "user", "why not"),
            ("a", 3, "assistant", "  AS AN AI, I must decline"),  # ltrim+case
            ("b", 0, "user", "hello"),
            # marker mid-text only -> NOT a refusal (prefix-anchored)
            ("b", 1, "assistant", "sure: I cannot help with X is a refusal"),
            ("b", 3, "assistant", "I'm unable to verify that claim"),  # refusal
            ("c", 0, "user", "hi"),
            ("c", 1, "assistant", "here is a real answer"),
            ("d", 0, "user", "?"),
            ("d", 1, "assistant", "\t\nI cannot help with tabs"),  # non-space ws
            ("d", 3, "assistant", None),  # NULL text: never a refusal
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    from marginaliasearch_spark.operators import sft

    got = {(r["conv_id"], r["turn_idx"]): r["is_refusal"]
           for r in sft.refusal_flags(turns).collect()}
    # the SAME pattern construction the operator and the SQL oracle use
    pat = re.compile(sft.refusal_pattern())
    want = {(r[0], r[1]): (r[2] == "assistant" and r[3] is not None
                           and bool(pat.match(r[3].lower())))
            for r in [tuple(x) for x in turns.collect()]}
    assert got == want
    assert got[("a", 1)] and got[("a", 3)] and got[("b", 3)] and got[("d", 1)]
    assert not got[("a", 0)] and not got[("b", 1)] and not got[("c", 1)]
    # two-state, never NULL: a tri-state flag silently drops rows from
    # both filter(is_refusal) and filter(~is_refusal)
    assert got[("d", 3)] is False

    stats = {r["conv_id"]: (r["n_responses"], r["n_refusals"], r["refusal_rate"])
             for r in sft.refusal_stats(turns).collect()}
    assert stats == {"a": (2, 2, 1.0), "b": (2, 1, 0.5), "c": (1, 0, 0.0),
                     "d": (2, 1, 0.5)}, stats

    with pytest.raises(ValueError, match="non-empty"):
        sft.refusal_pattern(())


def test_refusal_flags_jvm_plan(spark):
    from marginaliasearch_spark.operators import sft

    turns = _turns(spark)
    plan = (sft.refusal_flags(turns)
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert bad not in plan, plan  # flag fuses into the scan: no shuffle


def test_sft_pairs_null_text_context_renders_empty(spark):
    """A NULL-text context turn renders as 'role: ' (concat would NULL the
    element and array_join would silently DROP it, leaving the prompt one
    turn short of n_context_turns)."""
    turns = spark.createDataFrame(
        [("a", 0, "user", "hi"), ("a", 1, "tool", None),
         ("a", 2, "assistant", "answer words")],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = sft.sft_pairs(turns).collect()[0]
    assert r["n_context_turns"] == 2
    assert r["prompt"] == "user: hi\ntool: "
    assert r["n_prompt_words"] == 3  # 'user:', 'hi', 'tool:'


def test_conv_prefix_dedup_null_text_not_absent(spark):
    """A NULL-text turn must digest as an EMPTY turn ('0:'), not vanish:
    ['hi', NULL] and ['hi'] are different prefixes."""
    from marginaliasearch_spark.operators import dedup

    turns = spark.createDataFrame(
        [("a", 0, "user", "hi"), ("a", 1, "assistant", None),
         ("b", 0, "user", "hi")],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {r["conv_id"]: r["n_dups"]
           for r in dedup.conv_prefix_dedup(turns, prefix_turns=2).collect()}
    assert got == {"a": 1, "b": 1}
