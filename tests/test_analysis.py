"""Analyzer + Porter unit tests (SURVEY §2.2 T1-T7, §5.2)."""

import json
from pathlib import Path

from search_engine_spark.functions import porter
from search_engine_spark.functions.analyzer import (AnalyzerConfig, analyze,
                                                    clean_boolean_term,
                                                    extract_text,
                                                    load_stopwords, tokenize)

GOLDEN = Path(__file__).parent / "fixtures" / "porter_golden.json"


def test_porter_spec_examples():
    # examples from the published Porter (1980) specification
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "conflated": "conflat", "hopping": "hop",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "vietnamization": "vietnam", "operator": "oper",
        "triplicate": "triplic", "electriciti": "electr", "hopeful": "hope",
        "adjustable": "adjust", "replacement": "replac", "adoption": "adopt",
        "activate": "activ", "effective": "effect", "probate": "probat",
        "rate": "rate", "controll": "control", "roll": "roll",
        "connection": "connect", "connected": "connect",
        "connecting": "connect", "connections": "connect",
    }
    assert {w: porter.stem(w) for w in cases} == cases | {
        w: e for w, e in cases.items()
    }


def test_porter_golden_vectors():
    golden = json.loads(GOLDEN.read_text())
    got = {w: porter.stem(w) for w in golden}
    assert got == golden


def test_porter_short_and_case():
    assert porter.stem("a") == "a"
    assert porter.stem("of") == "of"
    assert porter.stem("RUNNING") == "run"  # lowercases first


def test_tokenizer_currency_and_unicode():
    # reference regex [¢£€\w]+ (helpers.py:29): currency glyphs glue to words
    assert tokenize("price €100 or £50 and ¢99!") == [
        "price", "€100", "or", "£50", "and", "¢99"]
    assert tokenize("naïve café ñandú") == ["naïve", "café", "ñandú"]  # Python \w
    assert tokenize("AT&T x") == ["AT", "T", "x"]


def test_boolean_cleaner_differs():
    # quirk 10: boolean terms strip digits/non-ASCII ([^a-zA-Z]+)
    assert clean_boolean_term("€100abc42") == "abc"
    assert clean_boolean_term("naïve") == "nave"


def test_stopwords_list():
    sw = load_stopwords()
    # 571 lines with one duplicate ("would") → 570 distinct terms
    assert len(sw) == 570
    assert {"the", "a", "and", "zero"} <= sw


def test_full_pipeline_order():
    # tokenize → lower → stopword → stem (helpers.py:49-58 order)
    assert analyze("The Connected banks") == ["connect", "bank"]
    # stopword removal happens BEFORE stemming: 'running' stays (not a stopword)
    assert analyze("This is running") == ["run"]


def test_simple_config_sql_parity():
    conf = AnalyzerConfig.simple()
    assert analyze("The Connected banks", conf) == ["the", "connected", "banks"]


def test_extract_text_byte_identity():
    html = ("<html><head><title>A &amp; B</title></head>"
            "<body>hello €uro &#8364;</body></html>").encode()
    assert extract_text(html) == "A & B hello €uro €"


def test_xxh64_matches_spark(spark):
    """Parity gate for the driver-side XXH64: the segment catalog prunes
    bucket partitions with pmod(xxhash64(term), B) computed in Python —
    any divergence from Spark's expression would silently read the wrong
    buckets (empty lookups)."""
    import random
    import string

    from pyspark.sql import functions as F

    from search_engine_spark.functions.xxhash import spark_bucket, xxh64_signed

    rng = random.Random(321)
    words = ["", "a", "market", "x" * 7, "y" * 8, "z" * 9, "q" * 31,
             "w" * 32, "e" * 33, "λambda-ünïcode"] + [
        "".join(rng.choices(string.ascii_lowercase + "äöü",
                            k=rng.randint(1, 64)))
        for _ in range(150)
    ]
    df = spark.createDataFrame([(w,) for w in words], "t string").select(
        "t", F.xxhash64("t").alias("h"),
        F.pmod(F.xxhash64("t"), F.lit(64)).cast("int").alias("b"))
    for r in df.collect():
        assert xxh64_signed(r.t.encode()) == r.h
        assert spark_bucket(r.t, 64) == r.b


def test_gopher_rules_each_threshold(spark):
    from pyspark.sql import functions as F

    from search_engine_spark.operators import textquality as TQ

    good = ("the cat and dog have fun with all of that " * 6).strip()
    rows = [
        (1, good),                                   # 54 words, passes all
        (2, "the and " + "word " * 10),              # < 50 words
        (3, good + " " + "a " * 60),                 # mean word len < 3
        (4, good + " supercalifragilisticexpialidocious" * 0 +
            " " + ("pneumonoultramicroscopicsilicovolcanoconiosis " * 40)
            .strip()),                               # mean word len > 10
        (5, good + " " + ("### " * 20).strip()),     # symbol ratio > 0.1
        (6, "\n".join(["- the and of that bullet line"] * 10)),  # bullets
        (7, "\n".join(["the and of that line ..."] * 10)),       # ellipses
        (8, good + " " + ("123 " * 60).strip()),     # frac_alpha < 0.8
        (9, ("word " * 60).strip()),                 # < 2 stopwords
        (10, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict()
           for r in TQ.gopher_quality(df).collect()}
    assert got[1]["gopher_pass"] is True
    for d in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        assert got[d]["gopher_pass"] is False, d
    # each doc fails the INTENDED rule
    assert got[2]["n_words"] < 50
    assert got[3]["mean_word_len"] < 3.0
    assert got[4]["mean_word_len"] > 10.0
    assert got[5]["symbol_ratio"] > 0.1
    assert got[6]["bullet_frac"] > 0.9
    assert got[7]["ellipsis_frac"] > 0.3
    assert got[8]["frac_alpha"] < 0.8
    assert got[9]["n_stop_hits"] < 2
    assert got[10]["n_words"] == 0 and got[10]["mean_word_len"] == 0.0
    # the unicode ellipsis counts both as symbol and as line ending
    uell = TQ.gopher_quality(spark.createDataFrame(
        [(1, "the and that line …")], "doc_id long, text string")
    ).collect()[0]
    assert uell.symbol_ratio == 0.2 and uell.ellipsis_frac == 1.0
    # feature columns stay pure JVM: no Python UDF in the plan
    plan = TQ.gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_c4_line_filter_rules(spark):
    from search_engine_spark.operators import textquality as TQ

    doc1 = ("This is a good first sentence right here.\n"
            "no terminal punctuation on this line\n"
            "Too few.\n"
            "Please enable javascript to view this content.\n"
            "A second proper sentence closes the page!\n"
            'A quoted sentence can end in a quote mark."\n'
            "A curly-quoted one works too.”\n"
            "Question marks also terminate, right?")
    rows = [
        (1, doc1),
        (2, "function f() { return 1; }\nA real sentence is here too."),
        (3, "We sell Lorem Ipsum generators for testing."),
        (4, "One good sentence only, which is not enough."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in TQ.c4_line_filter(df, min_kept_lines=3)
           .collect()}
    # doc 1: the punctuation-less, short, and javascript lines drop;
    # the five proper sentences survive in original order
    assert got[1].killed_by is None
    assert got[1].text.split("\n") == [
        "This is a good first sentence right here.",
        "A second proper sentence closes the page!",
        'A quoted sentence can end in a quote mark."',
        "A curly-quoted one works too.”",
        "Question marks also terminate, right?"]
    assert (got[1].n_lines, got[1].n_lines_kept) == (8, 5)
    assert got[2].killed_by == "brace"
    assert got[3].killed_by == "lorem_ipsum"   # case-insensitive
    assert got[4].killed_by == "too_few_lines"
    assert got[5].killed_by == "too_few_lines" and got[5].text == ""
    # badwords: checked after brace/lorem, before line-count
    bw = {r.doc_id: r.killed_by
          for r in TQ.c4_line_filter(df, badwords=["generators"],
                                     min_kept_lines=3).collect()}
    assert bw[3] == "lorem_ipsum"  # first-match chain unchanged
    bw2 = {r.doc_id: r.killed_by
           for r in TQ.c4_line_filter(df, badwords=["closes the page"],
                                      min_kept_lines=3).collect()}
    assert bw2[1] == "badword"
    # no-punctuation parameterization (the driver gate's): the word-
    # count rule alone decides
    np_ = TQ.c4_line_filter(
        spark.createDataFrame([(1, "one two three"), (2, "one two")],
                              "doc_id long, text string"),
        min_words_per_line=3, min_kept_lines=1,
        require_terminal_punct=False)
    got2 = {r.doc_id: r.killed_by for r in np_.collect()}
    assert got2 == {1: None, 2: "too_few_lines"}
    # row-local: shuffle-free, no Python UDF
    plan = TQ.c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_curate_gopher_and_c4_stages(spark):
    from search_engine_spark.operators import curation, textquality as TQ

    passing = ("the cat and dog have fun with all of that " * 6).strip()
    rows = [
        (1, passing + ".\n" + passing + "."),
        (2, ("word " * 60).strip() + "."),        # fails gopher stopword rule
        (3, "short line\n" + passing + "."),      # c4 drops line 1, survives
        (4, "no terminal punctuation here at all"),  # c4 kills (0 kept)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out, funnel = curation.curate(
        docs, languages=None, min_tokens=1, gopher=True,
        c4_min_kept_lines=1)
    stages = [f["stage"] for f in funnel]
    assert stages == ["input", "c4_cleanup", "quality", "gopher",
                      "exact_dedup"]
    assert {r.doc_id for r in out.collect()} == {1, 3}
    # c4 rewrote doc 3's text before gopher saw it
    assert [f["rows"] for f in funnel] == [4, 3, 3, 2, 2]
    txt = {r.doc_id: r.text for r in out.collect()}
    assert txt[3] == passing + "."
