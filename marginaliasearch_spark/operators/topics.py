"""Weighted-term topic detectors (converting-process classifier parity).

Reference behavior re-expressed Spark-first:

- ``code/processes/converting-process/java/nu/marginalia/converting/
  processor/classifier/topic/RecipeDetector.java`` (also
  ``TextileCraftDetector.java``, ``WoodworkingDetector.java``): a stemmed
  term→value dictionary; each *distinct* matched stem contributes its
  value ONCE (``values.put``), the sum is damped by
  ``sqrt(AVG)/sqrt(max(AVG, word_count))`` — long pages don't win by
  repeating one keyword.
- ``AdHocDetector.java``: same shape, but repeated occurrences of a stem
  saturate geometrically (``values.merge(.., (a,b) -> 0.5*a + b)``): the
  k-th occurrence leaves ``v·(2 − 2^(1−k))``, approaching ``2v``.

Spark-first design: the 100-TB corpus pass is **pure JVM column
expressions** — tokenize with ``split``, map surface→stem through a tiny
literal map, dedupe with ``array_distinct``, fold values with
``aggregate``. Stemming runs once per *distinct corpus token* (vocab-sized
Python work on the driver via the repo's Porter stemmer), never per token:
the reference stems every word of every document
(``sentence.stemmedWords``); at cluster scale the vocabulary is millions
while the corpus is trillions, so stem-once + broadcast-map is the same
function at a fraction of the work. For vocabularies too large for a map
literal, the same surface→stem relation joins (broadcast) against the
exploded token stream instead — semantics unchanged.

Oracle exactness: dictionary values are exact integer *thousandths*
(every reference value is k/1000), so the once-mode sum is an exact
integer fold; decay-mode per-stem contributions are correctly-rounded
doubles folded in ascending-stem order on both engines (Spark
``F.aggregate`` over a sorted array ↔ DuckDB ``list_reduce`` over
``list(.. ORDER BY stem)``); the final ``(sum/1000)·sqrt-penalty`` is the
same two IEEE ops + round(6) everywhere.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stem_udfs import stem_token
from ..functions.stemmer import porter_stem

__all__ = [
    "RECIPE_TERMS",
    "TEXTILE_CRAFT_TERMS",
    "WOODWORKING_TERMS",
    "RECIPE_AVG_LENGTH",
    "ADHOC_AVG_LENGTH",
    "stem_dictionary",
    "corpus_surface_stems",
    "topic_scores",
]

# Reference dictionaries, verbatim surface→value (stemmed at use time,
# as the reference constructors do with ps.stemWord). RecipeDetector.java
# AVG_RECIPE_LENGTH=250; the other detectors use AVG_LENGTH=1000.
RECIPE_AVG_LENGTH = 250
ADHOC_AVG_LENGTH = 1000

RECIPE_TERMS: dict[str, float] = {
    "ingredients": 0.3, "recipe": 0.1, "preparations": 0.1,
    "instructions": 0.1, "menu": -0.5, "email": -0.15, "checkout": -0.15,
    "reviews": -0.15, "newsletter": -0.15, "dl": 0.05, "l": 0.05, "g": 0.05,
    "ml": 0.05, "tsp": 0.05, "teaspoons": 0.05, "tbsp": 0.05,
    "tablespoons": 0.05, "cups": 0.05, "quarts": 0.05, "pints": 0.05,
    "grate": 0.05, "cut": 0.05, "peel": 0.05, "chop": 0.05, "slice": 0.05,
    "debone": 0.05, "julienne": 0.05, "saute": 0.05, "fry": 0.05,
    "boil": 0.05, "parboil": 0.05, "roast": 0.05, "grill": 0.05,
    "sear": 0.05, "heat": 0.05, "dice": 0.05, "bake": 0.05, "strain": 0.05,
    "melt": 0.05, "garnish": 0.05, "preheat": 0.05, "sprinkle": 0.05,
    "spritz": 0.05, "colander": 0.05, "pot": 0.05, "pan": 0.05, "oven": 0.05,
    "stove": 0.05, "skillet": 0.05, "wok": 0.05, "knife": 0.05,
    "grater": 0.05, "yeast": 0.025, "sourdough": 0.025, "flour": 0.025,
    "sugar": 0.025, "rye": 0.025, "wheat": 0.025, "dough": 0.025,
    "rise": 0.025, "lettuce": 0.025, "onions": 0.025, "parsnips": 0.025,
    "beets": 0.025, "carrots": 0.025, "chilies": 0.025, "peppers": 0.025,
    "chives": 0.025, "tomatoes": 0.025, "salad": 0.025, "leeks": 0.025,
    "shallots": 0.025, "avocado": 0.025, "asparagus": 0.025,
    "cucumbers": 0.025, "eggplants": 0.025, "broccoli": 0.025, "kale": 0.025,
    "jalapeno": 0.025, "habanero": 0.025, "mushrooms": 0.025,
    "shiitake": 0.025, "chanterelles": 0.025, "meat": 0.025, "beef": 0.025,
    "chicken": 0.025, "turkey": 0.025, "cheese": 0.025, "pork": 0.025,
    "tofu": 0.025, "salmon": 0.025, "cod": 0.025, "veal": 0.025,
    "eggs": 0.025, "lentils": 0.025, "chickpeas": 0.025, "rice": 0.025,
    "noodles": 0.025, "beans": 0.025, "ramen": 0.025, "miso": 0.025,
    "natto": 0.025, "udon": 0.025, "soba": 0.025, "shichimi": 0.025,
    "nori": 0.025, "kimchi": 0.025, "salt": 0.025, "oil": 0.025,
    "olive": 0.025, "feta": 0.025, "parmesan": 0.025, "mozzarella": 0.025,
    "gouda": 0.025, "mayonnaise": 0.025, "butter": 0.025, "pepper": 0.025,
    "grilled": 0.05, "fried": 0.05, "sauteed": 0.05, "dredged": 0.05,
    "marinated": 0.05, "glazed": 0.05, "breaded": 0.05, "chopped": 0.05,
    "sliced": 0.05, "cubed": 0.05, "baked": 0.05, "salted": 0.025,
    "peppered": 0.025, "spiced": 0.025, "soup": 0.025, "stew": 0.025,
    "broth": 0.025, "sauce": 0.025, "casserole": 0.025, "gratin": 0.025,
    "pasta": 0.025, "spaghetti": 0.025, "lasagna": 0.025,
    "tagliatelle": 0.025, "pizza": 0.025, "hamburger": 0.025,
    "sausage": 0.025, "taco": 0.025, "burrito": 0.025, "quesadilla": 0.025,
    "dinner": 0.025, "lunch": 0.025, "breakfast": 0.025, "supper": 0.025,
    "snack": 0.025, "minutes": 0.025, "hour": 0.025,
}

TEXTILE_CRAFT_TERMS: dict[str, float] = {
    "shop": -0.1, "newsletter": -0.1, "cart": -0.1, "item": -0.025,
    "price": -0.1, "book": -0.1, "order": -0.1, "exhibition": -0.1,
    "knit": 0.05, "stitch": 0.05, "yarn": 0.05, "crochet": 0.05,
    "embroider": 0.05, "awl": 0.01, "bobbin": 0.01, "brocade": 0.01,
    "damask": 0.01, "darning": 0.01, "dressmaking": 0.01, "dyeing": 0.01,
    "embroidery": 0.05, "felt": 0.01, "fiber": 0.01, "fibre": 0.01,
    "gauge": 0.01, "hank": 0.01, "hem": 0.01, "interfacing": 0.05,
    "knitting": 0.05, "lace": 0.01, "loom": 0.05, "needle": 0.02,
    "needlepoint": 0.05, "needlework": 0.05, "patchwork": 0.05,
    "pleat": 0.025, "quilt": 0.05, "quilting": 0.05, "scissors": 0.01,
    "seam": 0.02, "selvage": 0.05, "sew": 0.02, "sewing": 0.035,
    "skein": 0.05, "spindle": 0.05, "spinning": 0.01, "stitching": 0.05,
    "tapestry": 0.01, "thimble": 0.05, "thread": 0.01, "warp": 0.015,
    "weft": 0.025, "weave": 0.025, "weaving": 0.025, "wool": 0.01,
    "fabric": 0.01, "cloth": 0.01, "silk": 0.01, "cotton": 0.01,
    "polyester": 0.01, "macrame": 0.05, "tatting": 0.05, "knot": 0.01,
    "cord": 0.01, "beading": 0.025, "beads": 0.01, "applique": 0.05,
    "purl": 0.05, "cast": 0.01, "garter": 0.025, "stockinette": 0.05,
    "ribbing": 0.025, "crocheting": 0.05, "pattern": 0.01, "texture": 0.01,
    "mohair": 0.025, "alpaca": 0.015, "distaff": 0.025, "niddy": 0.05,
    "noddy": 0.05, "lazy": 0.01, "kate": 0.01, "swift": 0.015,
    "shuttle": 0.02, "heddle": 0.05, "reed": 0.01, "sley": 0.05,
    "shed": 0.01, "treadle": 0.035, "beater": 0.01, "dobby": 0.035,
    "jacquard": 0.02, "sett": 0.035, "twill": 0.035, "plain": 0.005,
    "satin": 0.01, "basketweave": 0.035, "herringbone": 0.02,
    "houndstooth": 0.035, "serge": 0.025,
}

WOODWORKING_TERMS: dict[str, float] = {
    "shop": -0.1, "newsletter": -0.1, "cart": -0.1, "item": -0.025,
    "price": -0.1, "book": -0.1, "order": -0.1, "exhibition": -0.1,
    "apse": 0.01, "baluster": 0.01, "beam": 0.01, "cornice": 0.01,
    "drill": 0.01, "nail": 0.01, "saw": 0.01, "hacksaw": 0.01,
    "bandsaw": 0.01, "whipsaw": 0.01, "gimlet": 0.01, "clamp": 0.01,
    "glue": 0.01, "cut": 0.01, "plane": 0.01, "sand": 0.01, "bevel": 0.01,
    "chamfer": 0.01, "dado": 0.075, "dowel": 0.05, "dovetail": 0.05,
    "joint": 0.01, "level": 0.01, "edge": 0.01, "face": 0.01,
    "fibreboard": 0.01, "fiberboard": 0.01, "battens": 0.01,
    "furring": 0.01, "glulam": 0.025, "hardboard": 0.025,
    "hardwood": 0.01, "jamb": 0.015, "kerf": 0.025, "lvl": 0.025,
    "laminated": 0.01, "lignin": 0.025, "mitre": 0.01, "mortise": 0.015,
    "mullion": 0.01, "newel": 0.01, "nogging": 0.025, "oriented": 0.01,
    "osb": 0.025, "panel": 0.005, "particleboard": 0.015, "plywood": 0.025,
    "purlin": 0.015, "riser": 0.01, "sapwood": 0.025, "shake": 0.005,
    "shingle": 0.01, "softwood": 0.01, "sapling": 0.01, "stave": 0.01,
    "stopper": 0.005, "stud": 0.01, "timber": 0.01, "truss": 0.01,
    "tusk": 0.01, "veneer": 0.01, "quartersawn": 0.025, "wainscoting": 0.01,
    "whittling": 0.025, "woodturning": 0.01, "parquetry": 0.025,
    "cabinetry": 0.025, "carpentry": 0.025, "carving": 0.025,
    "woodworking": 0.025, "firewood": 0.005, "lumber": 0.01, "plank": 0.01,
    "milling": 0.01, "sawmill": 0.015,
}


def stem_dictionary(term_values: Mapping[str, float]) -> dict[str, float]:
    """Surface dictionary → stem dictionary, stemming at construction in
    insertion order exactly as the reference constructors chain
    ``termValues.put(ps.stemWord(w), v)`` (later puts overwrite on stem
    collision)."""
    out: dict[str, float] = {}
    for w, v in term_values.items():
        if round(v * 1000) != v * 1000:
            raise ValueError(f"dictionary value {v!r} is not an exact 1/1000")
        out[porter_stem(w.lower())] = v
    return out


def corpus_surface_stems(
    docs: DataFrame, stems: Iterable[str], text_col: str = "text"
) -> dict[str, str]:
    """surface token → stem, for the corpus tokens whose stem hits the
    dictionary. Fully distributed: one distinct-token aggregation
    (vocabulary-sized, the only shuffle in the operator), Arrow-batched
    Porter over the distinct-token relation, and a dictionary-hit filter
    BEFORE collect — so only the dictionary's corpus surface forms (a
    few hundred rows for a few-hundred-word dictionary) ever reach the
    driver, never the vocabulary. The stem-once analogue of the
    reference stemming every word of every document."""
    want = sorted(set(stems))
    toks = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("tok")
        )
        .distinct()
        .withColumn("stem", stem_token("tok"))
        .where(F.col("stem").isin(want))
    )
    return {r["tok"]: r["stem"] for r in toks.collect()}


def topic_scores(
    docs: DataFrame,
    term_values: Mapping[str, float],
    avg_length: int = RECIPE_AVG_LENGTH,
    mode: str = "once",
    surface_stems: Mapping[str, str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document topic score.

    ``term_values`` maps *surface* dictionary words to values (stemmed
    here, like the reference constructors). ``mode='once'`` is the
    Recipe/TextileCraft/Woodworking accumulation (distinct matched stems
    contribute once); ``mode='decay'`` is AdHocDetector's saturating
    merge, folded in ascending-stem order. ``surface_stems`` may be
    precomputed (e.g. from the index lexicon's stem column); otherwise it
    is derived from the corpus vocabulary.

    Output: (doc_id, n_words, n_matched, score) — score rounded to 6.
    The corpus pass is a shuffle-free narrow projection.
    """
    if mode not in ("once", "decay"):
        raise ValueError(mode)
    stem_vals = stem_dictionary(term_values)
    if surface_stems is None:
        surface_stems = corpus_surface_stems(docs, stem_vals, text_col)
    surface_stems = {
        t: s for t, s in surface_stems.items() if s in stem_vals
    }

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    n_words = F.size(toks)
    if surface_stems:
        smap = F.create_map(
            *[F.lit(x) for kv in surface_stems.items() for x in kv]
        )
        stems_arr = F.transform(toks, lambda t: F.element_at(smap, t))
        matched = F.array_sort(
            F.array_distinct(F.filter(stems_arr, lambda s: s.isNotNull()))
        )
    else:
        stems_arr = F.array().cast("array<string>")
        matched = F.array().cast("array<string>")
    vmap_milli = F.create_map(
        *[
            F.lit(x)
            for s, v in sorted(stem_vals.items())
            for x in (s, int(round(v * 1000)))
        ]
    )

    if mode == "once":
        # exact integer fold: Σ distinct-stem thousandths
        milli_sum = F.aggregate(
            matched,
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.element_at(vmap_milli, s),
        )
        raw = milli_sum.cast("double") / F.lit(1000.0)
    else:
        # AdHoc saturating merge: k occurrences of stem s leave
        # v·(2 − 2^(1−k)) (closed form of a_k = 0.5·a_{k−1} + v);
        # fold ascending-stem, left-assoc — pinned on both engines
        arr = stems_arr

        def contrib(acc, s):
            k = F.size(F.filter(arr, lambda x: x == s)).cast("double")
            term = (
                F.element_at(vmap_milli, s).cast("double") / F.lit(1000.0)
            ) * (
                F.lit(2.0) - F.pow(F.lit(2.0), F.lit(1.0) - k)
            )
            return acc + term

        raw = F.aggregate(matched, F.lit(0.0), contrib)

    penalty = F.sqrt(F.lit(float(avg_length))) / F.sqrt(
        F.greatest(F.lit(float(avg_length)), n_words.cast("double"))
    )
    score = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(raw * penalty, 6)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.size(matched).cast("long").alias("n_matched"),
        score.alias("score"),
    )


# The driver testdata documents generator's fixed word pool (seed=42; the
# identical 31-token vocabulary at sf0.001/0.01/0.1 — verified by distinct
# scan). The DuckDB oracle inlines its surface→stem image over this pool;
# the engine derives the same map from the corpus itself, so the two agree
# on any corpus drawn from the pool.
SYNTH_CORPUS_VOCAB: list[str] = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


# driver-entry dictionary: reference-style values over corpus words (the
# reference's culinary/craft surfaces never appear in the synthetic pool)
SYNTH_TOPIC_TERMS: dict[str, float] = {
    "customer": 0.3, "query": 0.1, "merge": -0.5, "slow": 0.05,
    "table": 0.05, "scan": 0.05, "stream": 0.025, "window": 0.025,
    "vector": -0.15, "batch": 0.025,
}


QUESTION_PREFIXES: tuple[str, ...] = ("What", "Why", "How", "When", "Is")


def question_spam_scores(
    turns: DataFrame,
    prefixes: tuple[str, ...] = QUESTION_PREFIXES,
    min_positive: int = 4,
    min_ratio: float = 0.5,
    tag_role: str = "user",
) -> DataFrame:
    """Question-prefix spam detector (GoogleAnwersSpamDetector.java
    adapted to transcripts): the reference flags a page when more than
    ``min_positive`` of its h1/h2/h3 headings start with a question word
    AND they are more than ``min_ratio`` of all such headings. Here the
    "headings" are a conversation's ``tag_role`` turns (case-sensitive
    ``startsWith``, as the reference).

    One groupBy(conv_id) aggregation — count + conditional count, both
    map-side combinable; output (conv_id, total, positive, spam_score)
    with score 1.0/0.0 like ``testP``.
    """
    is_pos = F.lit(False)
    for p in prefixes:
        is_pos = is_pos | F.startswith(F.col("text"), F.lit(p))
    agg = (
        turns.filter(F.col("role") == tag_role)
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("total"),
            F.count_if(is_pos).cast("long").alias("positive"),
        )
    )
    spam = (
        (F.col("positive") > min_positive)
        & (F.col("positive") / F.col("total") > F.lit(min_ratio))
    ).cast("double")
    return agg.select("conv_id", "total", "positive", spam.alias("spam_score"))


# DocumentValuator.getChatGptContentFarmPenalty: AI-content-farm header
# prefixes and their penalty weights (converting-process/.../logic/
# DocumentValuator.java:42-69 — "easily 90% of modern AI-authored content
# farm spam has these nonsense headers")
CONTENT_FARM_PREFIXES: tuple[tuple[str, float], ...] = (
    ("benefits of", 10.0),
    ("key benefits", 5.0),
    ("key takeaways", 5.0),
)


def content_farm_penalty(
    docs: DataFrame,
    prefixes: tuple[tuple[str, float], ...] = CONTENT_FARM_PREFIXES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """AI-content-farm penalty, adapted from headings to text lines (a
    transcript has no h1/h2/h3; its lines play the heading role). Each
    prefix contributes its weight ONCE if any lowercased line starts with
    it — exactly the reference's boolean-per-prefix accumulation. Pure
    JVM column expressions, shuffle-free."""
    lines = F.split(F.lower(F.col(text_col)), "\n")

    def has_prefix(p: str):
        def pred(line):
            return F.startswith(line, F.lit(p))

        return F.exists(lines, pred)

    flags = {p: has_prefix(p) for p, _ in prefixes}
    penalty = F.lit(0.0)
    for p, w in prefixes:
        penalty = penalty + F.when(flags[p], F.lit(w)).otherwise(F.lit(0.0))
    cols = [F.col(id_col).alias("doc_id")]
    for (p, _), name in zip(
        prefixes, ("benefits_of", "key_benefits", "key_takeaways")
    ):
        cols.append(flags[p].alias(name))
    return docs.select(*cols, penalty.alias("penalty"))
