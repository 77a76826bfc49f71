"""BooksQueryTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/BooksQueryTest.java; data verbatim from
src/test/resources/input/java-books.csv — AUTHOR and LANGUAGE are
multi-valued grouping fields).

New surface exercised: DocumentPermutation hooks
(function/DocumentPermutation.java, BooksQueryTest.AuthorNameParts) —
pre-evaluation document transforms deriving evaluation-only fields
(AUTHOR → AUTHOR_FIRST_NAME / AUTHOR_LAST_NAME) — realized as
DataFrame→DataFrame lambdas on QueryPlanner(document_permutations=)."""

import pytest

from pyspark.sql import functions as F

from datawave_spark.compiler import compile_query
from datawave_spark.plans import QueryPlanner

# java-books.csv: BOOKS_DATE, TITLE, AUTHOR*, NUM_PAGES, SUB_TITLE,
# DATE_PUBLISHED, LANGUAGE*, ISBN_13, ISBN_10   (* = ';'-separated)
ROWS = [
    ("20150707", "Effective Java", ["Joshua Bloch"], 373.0,
     "3rd Edition", "20171227", ["English"], "978-0134685991",
     "0-134-68599-7"),
    ("20150808", "Java Concurrency in Practice",
     ["Doug Lea", "Joshua Bloch", "Brian Goetz", "Tim Peierls",
      "Joesph Bowbeer", "David Holmes"], 232.0, "1st Edition",
     "20060509", ["English", "Spanish"], "978-0321349606",
     "0-321-34960-1"),
    ("20150909", "Java Puzzlers", ["Joshua Bloch", "Neal Gafter"],
     271.0, "Traps,Pitfalls, and Corner Cases", "20050624",
     ["ENGLISH", "FRENCH"], "978-0321336781", "0-321-33678-X"),
    ("20151010", "Java Performance Companion",
     ["Charlie Hunt", "Monica Beckwith", "Poonam Parhar",
      "Bengt Rutisson"], 155.0, None, "20160507",
     ["ENGLISH", "GERMAN"], "978-0-13-379682-7", "0-13-379682-5"),
]
SCHEMA = ("BOOKS_DATE string, TITLE string, AUTHOR array<string>, "
          "NUM_PAGES double, SUB_TITLE string, DATE_PUBLISHED string, "
          "LANGUAGE array<string>, ISBN_13 string, ISBN_10 string")
FT = {f: "lcNoDiacritics" for f in
      ("BOOKS_DATE", "TITLE", "AUTHOR", "SUB_TITLE", "DATE_PUBLISHED",
       "LANGUAGE", "ISBN_13", "ISBN_10")} | {"NUM_PAGES": "number"}
COLS = ("BOOKS_DATE", "TITLE", "AUTHOR", "NUM_PAGES", "SUB_TITLE",
        "DATE_PUBLISHED", "LANGUAGE", "ISBN_13", "ISBN_10")


def expected(pred):
    return {r[7] for r in ROWS if pred(dict(zip(COLS, r)))}


def has(row, field, value):
    return any(str(v).lower() == value.lower() for v in row[field])


@pytest.fixture(scope="module")
def books(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.ISBN_13 for r in out.select("ISBN_13").collect()}


def author_name_parts(df):
    """AuthorNameParts DocumentPermutation: split each AUTHOR value on
    spaces; first token → AUTHOR_FIRST_NAME (multi-part names only),
    last token → AUTHOR_LAST_NAME."""
    words = F.transform(F.col("AUTHOR"), lambda a: F.split(a, " "))
    return (df.withColumn(
        "AUTHOR_FIRST_NAME",
        F.transform(F.filter(words, lambda w: F.size(w) > 1),
                    lambda w: w.getItem(0)))
        .withColumn("AUTHOR_LAST_NAME",
                    F.transform(words,
                                lambda w: F.element_at(w, -1))))


class TestBooks:
    def test_language(self, books):
        # testLanguage: mixed-case literals, multi-valued LANGUAGE
        for lang in ("FrEnch", "enGLIsh", "GerMan", "Greek"):
            got = run(books, f"LANGUAGE == '{lang}'")
            assert got == expected(
                lambda r: has(r, "LANGUAGE", lang)), lang
        assert run(books, "LANGUAGE == 'Greek'") == set()

    def test_author(self, books):
        for auth in ("douG Lea", "Joshua Bloch"):
            got = run(books, f"AUTHOR == '{auth}'")
            assert got == expected(lambda r: has(r, "AUTHOR", auth)) \
                and got, auth

    def test_multi_author_or(self, books):
        q = "AUTHOR == 'douG Lea' || AUTHOR == 'NeaL GafTEr'"
        got = run(books, q)
        assert got == expected(
            lambda r: has(r, "AUTHOR", "doug lea")
            or has(r, "AUTHOR", "neal gafter")) and got

    def test_evaluation_only_author_permutation(self, books):
        # testEvaluationOnlyAuthor: the AuthorNameParts permutation
        # derives AUTHOR_LAST_NAME before evaluation; equivalent to
        # AUTHOR =~ '.*BLOCH' on this corpus
        # the derived Content attrs inherit AUTHOR's metadata
        # (attr.getMetadata() in AuthorNameParts) → same normalizer
        ft = FT | {"AUTHOR_FIRST_NAME": "lcNoDiacritics",
                   "AUTHOR_LAST_NAME": "lcNoDiacritics"}
        res = QueryPlanner(
            books, field_types=ft,
            document_permutations=[author_name_parts]).plan(
            "AUTHOR_LAST_NAME == 'BLOCH' && LANGUAGE == 'ENGLISH'")
        got = {r.ISBN_13 for r in res.df.select("ISBN_13").collect()}
        want = expected(lambda r: any(
            a.split(" ")[-1].lower() == "bloch" for a in r["AUTHOR"])
            and has(r, "LANGUAGE", "english"))
        assert got == want == run(
            books, "AUTHOR =~ '.*BLOCH' && LANGUAGE == 'ENGLISH'") \
            and got

    def test_permutation_fields_pass_strict_validation(self, books):
        # without the permutation the derived field is nonexistent
        from datawave_spark.plans.catalog import InvalidQueryException
        with pytest.raises(InvalidQueryException):
            QueryPlanner(books, field_types=FT).plan(
                "AUTHOR_LAST_NAME == 'BLOCH'")
