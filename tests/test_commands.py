"""Search-front-end command dispatch (SearchQueryService chain parity)."""

from pyspark.sql import functions as F

from marginaliasearch_spark.plans.commands import (
    BANGS,
    _match_bang,
    route_queries,
    route_query,
    try_eval,
)


def test_browse_redirect():
    assert route_query("browse:random") == ("browse", "/explore")
    assert route_query("browse:EXAMPLE.com") == ("browse", "/explore/example.com")
    # pattern is anchored: extra words fall through to search
    assert route_query("browse:foo bar")[0] == "search"


def test_convert_fires_only_on_service_success():
    cmd, payload = route_query("2 km in miles")
    assert cmd == "convert"
    # group(1) keeps its trailing whitespace, as the Java matcher's does
    assert payload == "2 |km|miles"
    # parse matches but the unit is unknown → falls through to search
    assert route_query("5 km in banana") == ("search", "5 km in banana")
    # incompatible unit types fall through too
    assert route_query("5 km in kg") == ("search", "5 km in kg")


def test_define():
    assert route_query("define:Word") == ("define", "word")
    assert route_query("define:two words") == ("define", "two words")
    # disallowed char in the class → search
    assert route_query("define:foo.bar")[0] == "search"


def test_bang_matcher_boundaries():
    assert _match_bang("!w foo", "!w") == "foo"
    assert _match_bang("foo !w bar", "!w") == "foo bar"
    # bare bang yields a blank remainder → does not fire
    assert _match_bang("!w", "!w") is None
    # no space boundary → not a bang
    assert _match_bang("a!w b", "!w") is None
    assert _match_bang("!wx b", "!w") is None
    # Character.isSpaceChar: a TAB is not a valid boundary in the reference
    assert _match_bang("!w\tfoo", "!w") is None
    assert route_query("search this !ddg") == ("bang", "!ddg search this")
    assert set(BANGS) == {"!g", "!ddg", "!w"}


def test_lang_token():
    assert route_query("hello lang:en world") == ("lang", "en hello world")
    assert route_query("lang:en tail") == ("lang", "en tail")
    # unknown iso code → the command declines, chain continues to search
    assert route_query("hello lang:zz world")[0] == "search"
    # needs its own token: no space boundary → search
    assert route_query("slang:en word")[0] == "search"
    assert route_query("x lang:sv y", known_langs={"en", "sv"})[0] == "lang"


def test_site_redirect_and_scheme_strip():
    assert route_query("site:example.com") == (
        "site",
        "/site/example.com?view=info",
    )
    assert route_query("links:https://Example.com/path") == (
        "site",
        "/site/example.com?view=links",
    )
    # bug-compatible: ':' without '://' chops two leading chars
    # (Java indexOf()==-1, substring(-1+3))
    assert route_query("site:foo:8080") == ("site", "/site/o:8080?view=info")


def test_chain_order_browse_before_site():
    # 'browse:...' also matches nothing else; a site:-shaped browse target
    # stays a browse command because browse runs first in the chain
    assert route_query("browse:site:x")[0] == "browse"


def test_try_eval_gates():
    assert try_eval("3*(2+2)")
    assert try_eval("2pi*3")
    assert try_eval("sqrt(2)")
    assert not try_eval("42")  # bare number
    assert not try_eval("   ")  # blank expression
    assert not try_eval("2 meters")  # outside the expression alphabet


def test_route_queries_column(spark):
    df = spark.createDataFrame(
        [
            (0, "browse:random"),
            (1, "2 km in miles"),
            (2, "!w pasta"),
            (3, "just words"),
        ],
        "id long, query string",
    )
    rows = {r["id"]: (r["command"], r["payload"]) for r in route_queries(df).collect()}
    assert rows == {
        0: ("browse", "/explore"),
        1: ("convert", "2 |km|miles"),
        2: ("bang", "!w pasta"),
        3: ("search", "just words"),
    }
    # the input DataFrame's schema must not be mutated by routing
    assert df.columns == ["id", "query"]
    assert df.select(F.col("query")).count() == 4


def test_null_query_routes_to_search():
    # SearchParameters coerces a missing query to "" (requireNonNullElse)
    assert route_query(None) == ("search", "")


def test_trailing_newline_java_dollar_semantics():
    # Java's non-MULTILINE $ matches before ONE final line terminator, and
    # the command consumes the RAW remainder (terminator included)
    assert route_query("browse:foo\n") == ("browse", "/explore/foo\n")
    assert route_query("site:a.com\r\n") == ("site", "/site/a.com\r\n?view=info")
    # a trailing SPACE is not a line terminator — falls through to search
    assert route_query("browse:foo ")[0] == "search"
    # conversion is matches()-based; '\n' rides into the to-unit group via
    # the pattern's \s?, the unit lookup then fails → falls through
    assert route_query("2 km in miles\n")[0] != "convert"
    # the eval alphabet contains \s+, so a trailing newline still evals
    assert try_eval("3*3\n")


def test_unicode_whitespace_is_not_java_whitespace():
    # Java Pattern \s is ASCII-only and String.trim() strips <= U+0020;
    # NBSP / U+2028 must not route or trim as whitespace
    assert route_query("define:a b")[0] == "search"   # \s won't span NBSP
    assert route_query("lang:en foo")[0] == "search"  # needs ASCII \s|$
    # bang boundary is Character.isSpaceChar (Zs) — NBSP IS a boundary
    # there, but the remainder keeps it: trim() can't strip NBSP
    cmd, payload = route_query("!w foo")
    assert (cmd, payload) == ("bang", "!w  foo")
    # trailing U+2028 is a line terminator for $ but survives trim in the
    # lang rewrite payload
    cmd, payload = route_query("lang:en foo ")
    assert cmd == "lang" and payload == "en foo "
    # eval alphabet: \s+ is ASCII-only, NBSP breaks the full match
    assert not try_eval("3*3 ")
