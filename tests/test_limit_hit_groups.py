"""TestLimitReturnedGroupsToHitTermGroups +
HitsAreAlwaysIncludedCommonalityTokenTest corpus port (reference
warehouse/query-core/src/test/java/datawave/query/ — the
CommonalityTokenTestDataIngest document, full grouping contexts).

limit.fields with hit.list: a sibling GROUP containing a hit value
returns WHOLE (same-commonality-token companions ride along); with
FIELD=-1 every non-hit group drops; un-limited fields return fully.
The two matchesInGroup cases whose reference expectations depend on
evaluation short-circuit order ("added because sorting query causes
'basset' to evaluate first") are deliberately not replicated."""

import pytest

from pyspark.sql import functions as F

from datawave_spark.operators.limit_fields import limit_groups_to_hits

# CommonalityTokenTestDataIngest.writeItAll — every (context, members)
GROUPS = [
    ("PET.0", "tabby", "beagle", "beta", "parakeet"),
    ("PET.1", "calico", "basset", "goldfish", "canary"),
    ("PET.2", "tom", "chihuahua", "angelfish", "parrot"),
    ("PET.3", "siamese", "dachshund", "guppy", "budgie"),
    ("PET.12", "himalayan", "bernese", "swordtail", "cockatiel"),
    ("PET.13", "ragdoll", "shepherd", "tetra", "lovebird"),
    ("WILD.0", "cougar", "wolf", "shark", "eagle"),
    ("WILD.1", "tiger", "coyote", "tuna", "hawk"),
    ("WILD.2", "leopard", "fox", "mackerel", "crow"),
    ("WILD.3", "puma", "dingo", "salmon", "buzzard"),
]
ROW = (
    "doc1",
    [{"CTX": c, "CAT": cat, "CANINE": can, "FISH": fish, "BIRD": bird}
     for c, cat, can, fish, bird in GROUPS],
    ["snake"], ["coyote"], ["20,12.5", "90,26.5"],
)
SCHEMA = ("uid string, GROUPS array<struct<CTX:string, CAT:string, "
          "CANINE:string, FISH:string, BIRD:string>>, "
          "REPTILE array<string>, DOG array<string>, "
          "SIZE array<string>")


@pytest.fixture(scope="module")
def doc(spark):
    return spark.createDataFrame([ROW], SCHEMA).cache()


def surviving(df):
    row = df.collect()[0]
    out = set()
    for g in row.GROUPS:
        for fld in ("CAT", "CANINE", "FISH", "BIRD"):
            out.add(f"{fld}.{g.CTX}:{g[fld]}")
    return out, row


def ctxs(df):
    return {g.CTX for g in df.collect()[0].GROUPS}


class TestLimitGroupsToHits:
    def test_one_group(self, doc):
        # testOneGroup: CANINE == 'shepherd', limited fields at -1 —
        # only group PET.13 survives; un-limited REPTILE/DOG/SIZE stay
        out = limit_groups_to_hits(
            doc, "GROUPS", {"CANINE": lambda v: v == "shepherd"})
        terms, row = surviving(out)
        assert terms == {"CANINE.PET.13:shepherd", "CAT.PET.13:ragdoll",
                         "FISH.PET.13:tetra", "BIRD.PET.13:lovebird"}
        assert row.REPTILE == ["snake"] and row.DOG == ["coyote"]
        assert row.SIZE == ["20,12.5", "90,26.5"]

    def test_multiple_groups(self, doc):
        # testMultipleGroups: getAllMatches(CANINE,'.*e.*') — every
        # group whose canine contains an 'e'; groups 2/3 (chihuahua,
        # dachshund... wait: dachshund has no 'e'; chihuahua none;
        # wolf/fox/dingo none) must NOT survive
        out = limit_groups_to_hits(
            doc, "GROUPS", {"CANINE": lambda v: v.rlike("(?is)^.*e.*$")})
        assert ctxs(out) == {"PET.0", "PET.1", "PET.12", "PET.13",
                             "WILD.1"}
        terms, _ = surviving(out)
        assert {"CANINE.PET.0:beagle", "CAT.PET.0:tabby",
                "BIRD.PET.0:parakeet", "FISH.PET.0:beta",
                "CANINE.WILD.1:coyote", "CAT.WILD.1:tiger",
                "BIRD.WILD.1:hawk", "FISH.WILD.1:tuna"} <= terms

    def test_where_the_wild_things_are(self, doc):
        # HitsAreAlwaysIncluded.testWhereTheWildThingsAre:
        # BIRD == 'buzzard' with _ANYFIELD_=2 — the hit group is
        # always returned whole, capped extras ride along
        out = limit_groups_to_hits(
            doc, "GROUPS", {"BIRD": lambda v: v == "buzzard"}, limit=2)
        row = out.collect()[0]
        assert row.GROUPS[0].CTX == "WILD.3"
        g = row.GROUPS[0]
        assert (g.CAT, g.CANINE, g.FISH, g.BIRD) == \
            ("puma", "dingo", "salmon", "buzzard")
        assert len(row.GROUPS) == 3  # hit group + 2 extras

    def test_pet_sounds(self, doc):
        # HitsAreAlwaysIncluded.testPetSounds: FISH == 'angelfish'
        out = limit_groups_to_hits(
            doc, "GROUPS", {"FISH": lambda v: v == "angelfish"})
        terms, _ = surviving(out)
        assert terms == {"BIRD.PET.2:parrot", "CAT.PET.2:tom",
                         "CANINE.PET.2:chihuahua",
                         "FISH.PET.2:angelfish"}
