"""Ground-truth tests for the text-cleaning operators (PII scrub,
sentence split, boilerplate strip)."""

from __future__ import annotations

from poc_spark.operators.textclean import (
    pii_scrub,
    split_sentences,
    strip_boilerplate,
)


def test_pii_scrub_ground_truth(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and eve@sub.example.org now"),
            (2, "server 10.0.3.7 fell over, call +1-555-0187-33"),
            (3, "nothing sensitive here"),
            (4, "edge: a@b.co +44-20-7946-0958 192.168.1.1"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (2, 0, 0)
    assert got[1]["clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 1, 1)
    assert got[2]["clean_text"] == "server <IP> fell over, call <PHONE>"
    assert got[3]["clean_text"] == "nothing sensitive here"
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (1, 1, 1)
    assert got[4]["clean_text"] == "edge: <EMAIL> <PHONE> <IP>"


def test_split_sentences_ground_truth(spark):
    df = spark.createDataFrame(
        [
            (1, "First one. Second!  Third thing? trailing"),
            (2, "no terminator at all"),
            (3, "Ends hard."),
        ],
        "doc_id long, text string",
    )
    rows = split_sentences(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["sentence_id"], r["sentence"]))
    assert sorted(by_doc[1]) == [
        (0, "First one."),
        (1, "Second!"),
        (2, "Third thing?"),
        (3, "trailing"),
    ]
    assert by_doc[2] == [(0, "no terminator at all")]
    # terminator at end of string: no trailing whitespace -> one sentence
    assert by_doc[3] == [(0, "Ends hard.")]


def test_split_sentences_drops_empty_segments(spark):
    df = spark.createDataFrame([(1, "A. ! B.")], "doc_id long, text string")
    rows = sorted(
        (r["sentence_id"], r["sentence"]) for r in split_sentences(df).collect()
    )
    # "!" alone survives as a sentence (it is non-empty after trim)
    assert rows == [(0, "A."), (1, "!"), (2, "B.")]


def test_strip_boilerplate_ground_truth(spark):
    footer = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"unique alpha\n{footer}\ncookie banner"),
            (2, f"unique beta\n{footer}\ncookie banner"),
            (3, f"unique gamma\n{footer}"),
            (4, footer),  # every line is boilerplate
            (5, "totally unique doc"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in strip_boilerplate(df, min_docs=2).collect()}
    assert got[1]["clean_text"] == "unique alpha"
    assert got[1]["n_removed"] == 2
    assert got[2]["clean_text"] == "unique beta"
    assert got[3]["clean_text"] == "unique gamma"
    assert got[3]["n_removed"] == 1
    # all-boilerplate doc survives as an empty shell, not a lost row
    assert got[4]["clean_text"] == ""
    assert got[4]["n_removed"] == 1
    assert got[5]["clean_text"] == "totally unique doc"
    assert got[5]["n_removed"] == 0


def test_strip_boilerplate_shuffle_path_equals_broadcast(spark):
    """Adaptive dispatch (r13 finding #1): forcing the broadcast budget
    to 0 routes the anti-join through the shuffled hash path; results
    must be exactly the default broadcast path's."""
    rows = [
        (i, f"unique {i}\nshared footer\ncookie banner {i % 3}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        tuple(r) for r in strip_boilerplate(df, min_docs=2).collect()
    )
    spark.conf.set("spark.poc.textclean.boilerBroadcastMaxRows", "0")
    try:
        got = sorted(
            tuple(r) for r in strip_boilerplate(df, min_docs=2).collect()
        )
    finally:
        spark.conf.unset("spark.poc.textclean.boilerBroadcastMaxRows")
    assert got == want


def test_strip_boilerplate_preserves_line_order(spark):
    df = spark.createDataFrame(
        [
            (1, "z last\ncommon\na first\ncommon\nm middle"),
            (2, "common\nother doc"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in strip_boilerplate(df, min_docs=2).collect()}
    assert got[1]["clean_text"] == "z last\na first\nm middle"
    assert got[1]["n_removed"] == 2


def test_canonicalize_url_rules(spark):
    """RFC-subset canonicalization: case, www, fragment, trailing
    slash, tracker stripping, parameter sorting — and what must NOT
    change (path case, non-tracker params, https vs http distinction)."""
    from pyspark.sql import functions as F

    from poc_spark.functions.url import canonicalize_url

    cases = [
        ("HTTPS://WWW.Site.COM/A/B/?b=2&a=1&utm_source=x#frag",
         "https://site.com/A/B?a=1&b=2"),
        ("http://site.com/a", "http://site.com/a"),        # already canonical
        ("https://www.site.com/", "https://site.com"),     # root slash
        ("https://site.com/p?utm_campaign=c&ref=r&fbclid=f&gclid=g",
         "https://site.com/p"),                            # only trackers
        ("https://site.com/p?refx=keep&id=1",
         "https://site.com/p?id=1&refx=keep"),             # ref != refx
        ("HTTP://Site.com#only-frag", "http://site.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_normalize_unicode_forms(spark):
    """Composed and decomposed spellings converge under NFC; NFKC folds
    compatibility forms; `changed` flags exactly the touched rows; None
    passes through."""
    from poc_spark.operators.textclean import normalize_unicode

    composed = "caf\u00e9"
    decomposed = "cafe\u0301"
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, "ascii only"), (4, None),
         (5, "ﬁsh")],  # fi ligature: NFC keeps, NFKC expands
        "doc_id long, text string",
    )
    nfc = {r["doc_id"]: (r["text_norm"], r["changed"])
           for r in normalize_unicode(df).collect()}
    assert nfc[1] == (composed, False)
    assert nfc[2] == (composed, True)
    assert nfc[3] == ("ascii only", False)
    assert nfc[4][0] is None and nfc[4][1] is False
    assert nfc[5] == ("ﬁsh", False)
    nfkc = {r["doc_id"]: r["text_norm"]
            for r in normalize_unicode(df, form="NFKC").collect()}
    assert nfkc[5] == "fish"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="normalization form"):
        normalize_unicode(df, form="NFX")


def test_normalize_unicode_fast_path_equality(spark):
    """The ASCII JVM fast path must produce exactly what the
    all-rows-through-Python shape would: compare against a direct
    unicodedata map over the same rows, mixed ASCII/non-ASCII/None."""
    import unicodedata

    from poc_spark.operators.textclean import normalize_unicode

    rows = [
        (1, "plain ascii"),
        (2, "café composed"),
        (3, "café decomposed"),
        (4, None),
        (5, ""),
        (6, "mixed ascii then Ａ fullwidth"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_norm"], r["changed"])
           for r in normalize_unicode(df).collect()}
    for i, t in rows:
        if t is None:
            assert got[i] == (None, False)
        else:
            n = unicodedata.normalize("NFC", t)
            assert got[i] == (n, n != t)
    # the fast path really is JVM-only: the ASCII branch's plan must
    # not contain a Python evaluation node
    ascii_only = spark.createDataFrame(rows[:1], "doc_id long, text string")
    plan = (
        normalize_unicode(ascii_only)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1  # only the (empty) slow lane


def test_normalize_unicode_string_ids(spark):
    """The id column's name and type pass through from the input schema
    (r6 ADVICE: a hardcoded `doc_id long` NULLed string ids on the fast
    path and broke them on the slow one)."""
    from poc_spark.operators.textclean import normalize_unicode

    df = spark.createDataFrame(
        [("url-a", "ascii row"), ("url-b", "café")],
        "url string, text string",
    )
    out = normalize_unicode(df, id_col="url")
    assert out.schema["url"].dataType.simpleString() == "string"
    got = {r["url"]: (r["text_norm"], r["changed"]) for r in out.collect()}
    assert got["url-a"] == ("ascii row", False)
    assert got["url-b"] == ("café", True)


def test_strip_boilerplate_group_scoped_threshold(spark):
    """group_col mode (CCNet per-site rule): a line repeated across
    >= min_docs docs of ONE group is removed from that group only; the
    same line in a small group survives; a line spread across
    DIFFERENT groups (global form would kill it) survives everywhere;
    within-doc repeats of a boilerplate line all go."""
    footer = "copyright acme"
    cross = "shared across sites"
    rows = [
        (i, "a.com", f"body {i}\n{footer}\n{cross}") for i in range(5)
    ] + [
        (10, "b.com", f"intro\n{footer}\nmain 10\n{cross}"),
        (11, "a.com", f"{footer}\nx\n{footer}"),
    ] + [
        (20 + i, f"site{i}.com", cross) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate(df, min_docs=5, group_col="source").collect()
    }
    # a.com has 6 docs: footer goes; cross appears in only 5 a.com docs
    # ... (ids 0-4) — exactly at threshold, so it goes for a.com too
    for i in range(5):
        assert got[i]["clean_text"] == f"body {i}"
    # b.com is small: keeps both lines
    assert got[10]["clean_text"] == f"intro\n{footer}\nmain 10\n{cross}"
    assert got[10]["n_removed"] == 0
    # within-doc repeats of a group-boilerplate line all go
    assert got[11]["clean_text"] == "x"
    assert got[11]["n_removed"] == 2
    # cross-site singletons survive: one doc per site
    for i in range(5):
        assert got[20 + i]["clean_text"] == cross


def test_strip_boilerplate_group_none_matches_global(spark):
    """group_col=None is exactly the original global behavior."""
    rows = [(i, "x", f"u{i}\nshared line") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = sorted(
        (r["doc_id"], r["clean_text"], r["n_removed"])
        for r in strip_boilerplate(df, min_docs=2).collect()
    )
    assert a == [(0, "u0", 1), (1, "u1", 1), (2, "u2", 1)]
