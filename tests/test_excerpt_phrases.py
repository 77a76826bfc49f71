"""ExcerptTest corpus port (reference warehouse/query-core/src/test/
java/datawave/query/ExcerptTest.java over the WiseGuys QUOTE field) —
the exact HIT_EXCERPT strings: bracketed hit tokens, the window
counted around the WHOLE phrase span, before/after direction
trimming, and windows larger than the quote clamped at its edges.
(The reference strings carry a ': : [] <Long.MAX> false' attribute
suffix — Accumulo attribute rendering its own comment calls
unexplained — which is not part of the excerpt and not replicated.)"""

import pytest

from datawave_spark.operators.excerpt import phrase_excerpts

CORLEONE = "Im gonna make him an offer he cant refuse"
CAPONE = ("You can get much farther with a kind word and a gun than "
          "you can with a kind word alone")
SOPRANO = "If you can quote the rules then you can obey them"

ROWS = [("CORLEONE", CORLEONE), ("CAPONE", CAPONE), ("SOPRANO", SOPRANO)]

# (terms, window, direction, uuid, expected excerpt) — verbatim from
# ExcerptTest.java:211-420 (minus the attribute suffix)
CASES = [
    (["farther"], 2, "both", "CAPONE", "get much [farther] with a"),
    (["farther"], 2, "before", "CAPONE", "get much [farther]"),
    (["farther"], 2, "after", "CAPONE", "[farther] with a"),
    (["he", "cant", "refuse"], 2, "both", "CORLEONE",
     "an offer [he] [cant] [refuse]"),
    (["he", "cant", "refuse"], 2, "before", "CORLEONE",
     "an offer [he] [cant] [refuse]"),
    (["he", "cant", "refuse"], 2, "after", "CORLEONE",
     "[he] [cant] [refuse]"),
    (["he", "cant", "refuse"], 20, "both", "CORLEONE",
     "im gonna make him an offer [he] [cant] [refuse]"),
    (["he", "cant", "refuse"], 20, "before", "CORLEONE",
     "im gonna make him an offer [he] [cant] [refuse]"),
    (["he", "cant", "refuse"], 20, "after", "CORLEONE",
     "[he] [cant] [refuse]"),
    (["im", "gonna", "make", "him", "an", "offer", "he", "cant",
      "refuse"], 20, "both", "CORLEONE",
     "[im] [gonna] [make] [him] [an] [offer] [he] [cant] [refuse]"),
    (["if"], 3, "both", "SOPRANO", "[if] you can quote"),
    (["if"], 3, "before", "SOPRANO", "[if]"),
    (["if"], 3, "after", "SOPRANO", "[if] you can quote"),
]


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(ROWS, "UUID string, QUOTE string") \
        .cache()


@pytest.mark.parametrize(
    "terms,window,direction,uuid,expected", CASES,
    ids=[f"{'_'.join(c[0])[:20]}/{c[1]}/{c[2]}" for c in CASES])
def test_excerpt(quotes, terms, window, direction, uuid, expected):
    out = phrase_excerpts(quotes, "QUOTE", "UUID", terms,
                          window=window, direction=direction)
    got = {r.UUID: list(r.excerpts)
           for r in out.select("UUID", "excerpts").collect()}
    assert got[uuid] == [expected]
    # no other document carries the phrase
    for other, exc in got.items():
        if other != uuid:
            assert exc == [], (other, exc)
