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
