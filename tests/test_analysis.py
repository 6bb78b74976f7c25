"""Tokenizer parity tests (SURVEY.md §5.1) — the F1–F7 chain fixtures."""

from spidey_search_engine_spark.functions.analysis import (
    analyze_query,
    split_identifier,
    tokenize_body,
    tokenize_code,
    tokenize_query,
    tokenize_simple,
    tokenize_title,
)
from spidey_search_engine_spark.functions.porter2 import stem


def test_porter2_golden_vectors():
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "tie", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "filing": "file", "happy": "happi",
        "sky": "sky", "dying": "die", "news": "news", "conditional": "condit",
        "rational": "ration", "generously": "generous", "running": "run",
        "flies": "fli", "sympathize": "sympath", "relational": "relat",
        "arguments": "argument", "adjustment": "adjust", "dependent": "depend",
        "communism": "communism", "knitting": "knit", "sensibility": "sensibl",
        "activate": "activ", "effective": "effect", "algorithms": "algorithm",
        "sorting": "sort", "merge": "merg", "search": "search", "engine": "engin",
        "a": "a", "be": "be", "proceed": "proceed", "earring": "earring",
        "early": "earli", "skies": "sky",
    }
    got = {w: stem(w) for w in cases}
    assert got == cases


def test_body_split_and_stem():
    # delimiters: everything outside [A-Za-z0-9_] ∪ Arabic block
    assert tokenize_body("Sorting algorithms!") == ["sort", "algorithm"]
    assert tokenize_body("foo.bar-baz(qux)") == ["foo", "bar", "baz", "qux"]
    # underscore is a word char → snake_case is ONE token in body profile
    assert tokenize_body("merge_sort") == ["merge_sort"]
    # backslash is a delimiter (the re-added [\\] alternative)
    assert tokenize_body(r"a\b") == ["a", "b"]


def test_body_truncation_before_stem():
    # 35-char token truncated to 30 BEFORE stemming (Indexer.java:441)
    long_tok = "supercalifragilisticexpialidocious"  # 34 chars
    expected = stem(long_tok[:30])
    assert tokenize_body(long_tok) == [expected]
    assert expected != stem(long_tok)  # truncation is observable


def test_arabic_passthrough():
    # Arabic token: no lowercase, no stem (Indexer.java:56-64)
    assert tokenize_body("كتاب") == ["كتاب"]
    # mixed-script token containing an Arabic char also passes through raw
    assert tokenize_body("Xكتاب") == ["Xكتاب"]
    # query side: Arabic chars are delimiters — split away (Stemmer.java:34)
    assert tokenize_query("كتاب books") == ["book"]


def test_query_stopwords_raw_prelowercase():
    # stopword check happens BEFORE lowercasing (Stemmer.java:41):
    # "the" drops, "The" survives (and then stems)
    assert tokenize_query("the The import Import") == ["the", "import", "import"]
    assert tokenize_query("about About") == ["about"]
    assert tokenize_query("sorting algorithms") == ["sort", "algorithm"]


def test_index_keeps_stopwords():
    # index side keeps stopwords (Indexer.java:442 commented out)
    assert tokenize_body("the import of a return") == [
        "the", "import", "of", "a", "return"]


def test_identifier_splitting():
    assert split_identifier("camelCaseName") == ["camel", "Case", "Name"]
    assert split_identifier("HTTPServer2") == ["HTTP", "Server", "2"]
    assert split_identifier("snake_case_name") == ["snake", "case", "name"]
    assert split_identifier("parseJSONData") == ["parse", "JSON", "Data"]
    assert tokenize_code("def mergeSort(arr_list):") == [
        "def", "merg", "sort", "arr", "list"]


def test_title_profile_500():
    t = "A" * 600
    out = tokenize_title(t)
    assert len(out) == 1 and len(out[0]) <= 500


def test_analyze_query_phrases():
    words, phrases = analyze_query('tokenize "hash map" lookup')
    assert words == ["token", "lookup"]
    assert phrases == [["hash", "map"]]
    words, phrases = analyze_query('"binary search"')
    assert words == []
    assert phrases == [["binari", "search"]]


def test_simple_profile_matches_duckdb_semantics():
    assert tokenize_simple("Hello, World_2!") == ["hello", "world_2"]
    assert tokenize_simple("") == []


def test_token_id_encoder_matches_profiles_all():
    """Every PROFILES entry must have a working TokenIdEncoder config whose
    decoded id stream equals the plain profile tokenizer (build_partials
    routes all builds through the encoder)."""
    from spidey_search_engine_spark.functions.analysis import (
        PROFILES, TokenIdEncoder)

    samples = [
        "def parseJSON(x): return HTTPServer2.handle_request(x)",
        "The quick brown fox and the lazy dog",
        "camelCaseToken snake_case_token UPPER lower123 " + "Z" * 600,
        "مرحبا world_Test",
        "",
    ]
    for profile in PROFILES:
        enc = TokenIdEncoder(profile)
        fn = PROFILES[profile]
        for text in samples:
            ids = enc.encode(text)
            got = [enc.term_of(int(i)) for i in ids]
            assert got == [t for t in fn(text) if t], (profile, text)
