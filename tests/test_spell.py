"""Spell-correction tests (SymSpell-analogue, reference SpellChecker.java):
the deletes-index + levenshtein-verify path must equal a brute-force
levenshtein scan of the lexicon — the completeness property SymSpell's
correctness rests on — and ranking must be (distance, ctf DESC, term)."""

import itertools

import pytest
from pyspark.sql import functions as F

from marginaliasearch_spark.operators import spell


def _brute_deletes(s: str, max_edits: int) -> set[str]:
    out = {s}
    frontier = {s}
    for _ in range(max_edits):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        out |= nxt
        frontier = nxt
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


LEXICON = [
    # (term, ctf) — includes a tie-pair (bat/cat same distance from "bbt",
    # ctf breaks it), a false deletes-candidate trap, and longer terms
    ("spark", 100),
    ("spork", 40),
    ("stork", 30),
    ("shark", 25),
    ("sparkle", 10),
    ("bat", 50),
    ("cat", 80),
    ("chart", 15),
    ("charts", 12),
    ("query", 200),
    ("queue", 60),
    ("quirk", 5),
]


@pytest.fixture(scope="module")
def lex_df(spark):
    return spark.createDataFrame(LEXICON, "term string, ctf long").cache()


class TestDeleteVariants:
    @pytest.mark.parametrize("word", ["a", "ab", "spark", "sparkle", "queue"])
    @pytest.mark.parametrize("max_edits", [1, 2])
    def test_matches_brute_force(self, spark, word, max_edits):
        got = (
            spark.createDataFrame([(word,)], "w string")
            .select(spell.delete_variants(F.col("w"), max_edits).alias("v"))
            .collect()[0]["v"]
        )
        assert sorted(got) == sorted(_brute_deletes(word, max_edits))


class TestSuggest:
    @pytest.mark.parametrize("max_edits", [1, 2])
    def test_equals_brute_force_scan(self, spark, lex_df, max_edits):
        """The deletes-join + verify returns EXACTLY the brute-force
        candidate set (completeness: no term within the distance budget is
        missed; soundness: false deletes-candidates are filtered)."""
        probes = ["spark", "spakr", "sprk", "quey", "qeury", "chat", "bbt", "zzz"]
        didx = spell.build_deletes_index(lex_df, max_edits=max_edits)
        got = {
            (r["probe"], r["suggestion"], r["dist"])
            for r in spell.suggest(
                spark, didx, probes, max_edits=max_edits, k=100
            ).collect()
        }
        want = {
            (p, t, _lev(p, t))
            for p, (t, _) in itertools.product(probes, LEXICON)
            if _lev(p, t) <= max_edits
        }
        assert got == want

    def test_ranking_dist_then_ctf_then_term(self, spark, lex_df):
        didx = spell.build_deletes_index(lex_df, max_edits=2)
        rows = (
            spell.suggest(spark, didx, ["bbt"], max_edits=2, k=10)
            .collect()
        )
        ranked = [(r["suggestion"], r["dist"], r["ctf"]) for r in rows]
        # bat is dist 1; cat is dist 2 but higher ctf — distance wins first
        assert ranked[0][0] == "bat"
        dists = [d for _, d, _ in ranked]
        assert dists == sorted(dists)
        # within equal distance, ctf strictly descending or term ascending
        for (s1, d1, c1), (s2, d2, c2) in zip(ranked, ranked[1:]):
            if d1 == d2:
                assert (-c1, s1) < (-c2, s2)

    def test_k_caps_per_probe(self, spark, lex_df):
        didx = spell.build_deletes_index(lex_df, max_edits=2)
        out = spell.suggest(spark, didx, ["spark", "quey"], max_edits=2, k=2)
        counts = (
            out.groupBy("probe").count().collect()
        )
        assert all(r["count"] <= 2 for r in counts)

    def test_exact_hit_is_distance_zero_top(self, spark, lex_df):
        didx = spell.build_deletes_index(lex_df, max_edits=2)
        rows = spell.suggest(spark, didx, ["spark"], max_edits=2, k=5).collect()
        assert rows[0]["suggestion"] == "spark" and rows[0]["dist"] == 0

    def test_long_terms_skipped_by_cap(self, spark):
        """max_term_length keeps pathological terms out of the quadratic
        deletes expansion; such terms simply don't participate."""
        lex = spark.createDataFrame(
            [("short", 5), ("x" * 30, 7)], "term string, ctf long"
        )
        didx = spell.build_deletes_index(lex, max_edits=2, max_term_length=24)
        terms = {r["term"] for r in didx.select("term").distinct().collect()}
        assert terms == {"short"}


def _brute_prefix(lexicon, probes, k=10, min_word_len=4, min_count=2):
    """Reference-semantics brute force for prefix_suggest (Suggestions.java:
    90-130): normalize probes, drop short ones, rank ctf DESC then term."""
    norm = sorted(
        {p.lower().lstrip() for p in probes if len(p.lower().lstrip()) >= 3}
    )
    out = []
    for p in norm:
        cands = [
            (t, c)
            for t, c in lexicon
            if len(t) >= min_word_len and c >= min_count and t.startswith(p)
        ]
        cands.sort(key=lambda tc: (-tc[1], tc[0]))
        out += [(p, t, c) for t, c in cands[:k]]
    return out


PREFIX_LEXICON = LEXICON + [
    ("sparse", 40),      # ties spork at ctf 40 under probe "sp*"
    ("quantum", 3),
    ("quo", 9),          # len 3 < min_word_len=4 → never suggested
    ("rare", 1),         # ctf 1 < min_count=2 → never suggested
    ("supercalifragilisticexpialidocious", 4),   # > 16-char prefix bucket
    ("supercalifragilisticontrarian", 6),        # same first 16 chars
]


class TestPrefixSuggest:
    @pytest.fixture(scope="class")
    def plex(self, spark):
        return spark.createDataFrame(
            PREFIX_LEXICON, "term string, ctf long"
        ).cache()

    @pytest.mark.parametrize(
        "probes",
        [
            ["spar"],                      # multi-completion: spark, sparkle, sparse
            ["cha", "que"],                # chart/charts; query/queue
            ["  SPAR", "spar"],            # normalization collapses to one probe
            ["qu", "x"],                   # all too short → empty
            ["quan", "nosuchprefix"],
        ],
    )
    def test_equals_brute_force(self, spark, plex, probes):
        got = [
            (r["probe"], r["suggestion"], r["ctf"])
            for r in spell.prefix_suggest(plex, probes, k=10)
            .orderBy("probe", F.desc("ctf"), "suggestion")
            .collect()
        ]
        assert got == _brute_prefix(PREFIX_LEXICON, probes)

    def test_ranking_ctf_desc_then_term(self, spark, plex):
        rows = spell.prefix_suggest(plex, ["sp"], k=10).collect()
        assert rows == []  # "sp" is below MIN_SUGGEST_LENGTH
        rows = spell.prefix_suggest(plex, ["spa"], k=10).collect()
        ranked = [(r["suggestion"], r["ctf"]) for r in rows]
        # spark(100) > sparkle/sparse... sparse(40) ties nothing here but
        # spork is under "spo"; within equal ctf term ascending
        assert ranked[0] == ("spark", 100)
        for (s1, c1), (s2, c2) in zip(ranked, ranked[1:]):
            assert (-c1, s1) < (-c2, s2)

    def test_long_probe_beyond_indexed_cap(self, spark, plex):
        """Probes longer than MAX_INDEXED_PREFIX join on the 16-char bucket
        and post-filter, exactly like the reference's long-prefix fallback
        (PrefixSearchStructure.java:136-150)."""
        probe = "supercalifragilisticexp"  # 23 chars, one of two bucket-mates
        got = [
            (r["suggestion"], r["ctf"])
            for r in spell.prefix_suggest(plex, [probe], k=10).collect()
        ]
        assert got == [("supercalifragilisticexpialidocious", 4)]

    def test_gates_and_k(self, spark, plex):
        # min_word_len and min_count gates
        got = {r["suggestion"] for r in spell.prefix_suggest(plex, ["quo"], k=10).collect()}
        assert "quo" not in got
        got = {r["suggestion"] for r in spell.prefix_suggest(plex, ["rare"], k=10).collect()}
        assert got == set()
        # k caps per probe
        rows = spell.prefix_suggest(plex, ["spa", "que"], k=1).collect()
        per = {}
        for r in rows:
            per[r["probe"]] = per.get(r["probe"], 0) + 1
        assert all(v <= 1 for v in per.values()) and len(per) == 2

    def test_empty_probes(self, spark, plex):
        assert spell.prefix_suggest(plex, ["a", "  "], k=5).count() == 0
