"""Porter stemmer pinned to the canonical published output pairs (the
algorithm the reference stems with via Snowball, QueryExpansion.java:21)."""

from marginaliasearch_spark.functions.stemmer import noun_variants, porter_stem

# (input, output) pairs from Porter's published voc.txt -> output.txt,
# including the two official departures (bli->ble, logi->log)
OFFICIAL = {
    "caresses": "caress", "ponies": "poni", "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "sized": "size", "hopping": "hop",
    "tanned": "tan", "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "abilities": "abil", "absorption": "absorpt", "accessories": "accessori",
    "analysis": "analysi", "atomizer": "atom", "authorization": "author",
    "automatically": "automat", "generalization": "gener",
    "happiness": "happi", "journeys": "journei", "knitting": "knit",
    "ladies": "ladi", "making": "make", "mechanization": "mechan",
    "nationally": "nation", "necessity": "necess", "obviously": "obvious",
    "owed": "ow", "playing": "plai", "possibly": "possibl",
    "previously": "previous", "probably": "probabl", "running": "run",
    "skies": "ski", "stemming": "stem", "strategies": "strategi",
    "technology": "technolog", "theories": "theori", "traditional": "tradit",
    "trying": "try", "typically": "typic", "united": "unit", "useful": "us",
    "visualization": "visual", "controlling": "control", "rolling": "roll",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "queries": "queri", "query": "queri", "runs": "run", "run": "run",
}


def test_porter_official_pairs():
    bad = {
        w: (porter_stem(w), want)
        for w, want in OFFICIAL.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_stem_classes_unite_inflections():
    for family in (["run", "runs", "running"], ["query", "queries"],
                   ["connect", "connected", "connecting", "connection"]):
        stems = {porter_stem(w) for w in family}
        assert len(stems) == 1, (family, stems)


def test_non_alpha_pass_through():
    for w in ("mp3", "tool_call", "trs-80", "a", "io"):
        assert porter_stem(w) == w


def test_irregular_noun_table_bidirectional():
    assert "mice" in noun_variants("mouse")
    assert "mouse" in noun_variants("mice")
    assert "indices" in noun_variants("index")
    assert noun_variants("spark") == []
