"""NumericListQueryTest corpus port (reference warehouse/query-core/
src/test/java/datawave/query/NumericListQueryTest.java over
util/CommonalityTokenTestDataIngest.java — ONE document whose SIZE
field is a NumberListType: a single stored value '90,26.5' that
evaluates as the list {90, 26.5} AND keeps the raw string in the
context for regex matching).

The corpus is a single event, so each ported case pins the MATCH /
NO-MATCH outcome (the reference's goodResults additionally pin
hit-term subsets that its own comment calls short-circuited /
non-exhaustive — HitListArithmetic exhaustiveHits=false — so they are
deliberately not replicated).  grouping:matchesInGroup over the two
SIZE lists (different commonality-token groups CANINE.3 vs
CANINE.WILD.1) must NOT cross lists."""

import pytest

from datawave_spark.compiler import compile_query

# CommonalityTokenTestDataIngest.writeItAll: one document
CANINES = ["beagle", "basset", "chihuahua", "dachshund", "bernese",
           "shepherd", "wolf", "coyote", "fox", "dingo"]
CATS = ["tabby", "calico", "tom", "siamese", "himalayan", "ragdoll",
        "cougar", "tiger", "leopard", "puma"]
ROW = {
    "uid": "doc1",
    "CAT": CATS,
    "CANINE": CANINES,
    "DOG": ["coyote"],
    "REPTILE": ["snake"],
    # raw NumberListType values (SIZE.CANINE.3 and SIZE.CANINE.WILD.1)
    "SIZE": ["20,12.5", "90,26.5"],
    # grouping contexts: SIZE.CANINE.3 shares CANINE.PET.3 (dachshund),
    # SIZE.CANINE.WILD.1 shares CANINE.WILD.1 (coyote); lists fan out
    # inside their OWN group
    "GROUPS": [
        {"CANINE": "dachshund", "SIZE": [20.0, 12.5]},
        {"CANINE": "coyote", "SIZE": [90.0, 26.5]},
        {"CANINE": "beagle", "SIZE": None},
        {"CANINE": "wolf", "SIZE": None},
    ],
}
SCHEMA = ("uid string, CAT array<string>, CANINE array<string>, "
          "DOG array<string>, REPTILE array<string>, "
          "SIZE array<string>, "
          "GROUPS array<struct<CANINE:string, SIZE:array<double>>>")
FT = {"CAT": "lcNoDiacritics", "CANINE": "lcNoDiacritics",
      "DOG": "lcNoDiacritics", "REPTILE": "lcNoDiacritics",
      "SIZE": "numberList"}


@pytest.fixture(scope="module")
def doc(spark):
    return spark.createDataFrame(
        [tuple(ROW[k] for k in ("uid", "CAT", "CANINE", "DOG",
                                "REPTILE", "SIZE", "GROUPS"))],
        SCHEMA).cache()


def matches(df, q):
    return compile_query(df, q, field_types=FT).count() == 1


class TestNumericList:
    def test_equals(self, doc):
        # testEquals: '90' is one ELEMENT of the list value
        assert matches(doc, "SIZE == '90'")
        assert matches(doc, "SIZE == '26.5'")
        assert not matches(doc, "SIZE == '99'")

    def test_one_sided_ranges(self, doc):
        # testOneValGreaterThan / testOneValLessThan /
        # testSeveralLessThan / testSeveralGreaterThan — numeric
        # any-element comparison
        assert matches(doc, "SIZE > '89'")
        assert matches(doc, "SIZE < '13'")
        assert matches(doc, "SIZE < '90'")
        assert matches(doc, "SIZE > '19'")
        assert not matches(doc, "SIZE > '90'")
        assert not matches(doc, "SIZE < '12.5'")

    def test_and_same_field(self, doc):
        # testANDSameField: both elements live in ONE list value
        assert matches(doc, "SIZE == '90' && SIZE == '26.5'")

    def test_and_different_lists(self, doc):
        # testANDDifferentField: each term independently any-value —
        # values from DIFFERENT lists still conjoin at the event level
        assert matches(doc, "SIZE == '90' && SIZE == '20'")

    def test_field_equals_whole_list(self, doc):
        # testFieldEqualsList: the literal itself is a LIST — it
        # normalizes to the conjunction of its elements
        # (SIZE == '90,26.5' plans as SIZE=='+bE9' && SIZE=='+bE2.65')
        assert matches(doc, "SIZE == '90,26.5'")

    def test_include_regex_raw_value(self, doc):
        # testIncludeList: filter:includeRegex matches the RAW stored
        # string '90,26.5'
        assert matches(doc, "CANINE == 'coyote' && "
                            "filter:includeRegex(SIZE, '90,26.5')")

    def test_matches_in_group(self, doc):
        # testMatchesInGroup: 90 and 26.5 share one grouping context
        assert matches(
            doc, "SIZE == '90,26.5' && "
                 "grouping:matchesInGroup(SIZE, '90', SIZE, '26\\.5')")

    def test_matches_in_group_across_lists(self, doc):
        # testMatchesInGroupAcrossLists: 90 (CANINE.WILD.1) and 20
        # (CANINE.3) live in DIFFERENT groups — no match
        assert not matches(
            doc, "SIZE == '90' && "
                 "grouping:matchesInGroup(SIZE, '90', SIZE, '20')")

    def test_wildcards_against_raw(self, doc):
        # testWildcards: '.*0.*' matches the raw string form
        assert matches(doc, "SIZE =~ '.*0.*' && CANINE == 'coyote'")

    def test_leading_wildcard(self, doc):
        # testLeadingWildcardNonReverseIndexed: '.*5' matches the raw
        # '90,26.5'; '.*7' matches nothing (raw or element)
        assert matches(doc, "SIZE =~ '.*5' && CANINE == 'coyote'")
        assert not matches(doc, "SIZE =~ '.*7' && CANINE == 'coyote'")
