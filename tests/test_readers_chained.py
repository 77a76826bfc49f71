"""CSV/JSON/XML reader and chained-query tests."""

import textwrap

import pytest
from pyspark.sql import functions as F

from datawave_spark.plans.chained import chained_query
from datawave_spark.sources.readers import (
    flatten_structs, read_csv_events, read_json_events, read_xml_events,
)


class TestReaders:
    def test_csv_multivalue(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("csv")
        p = d / "data.csv"
        p.write_text("id,city,tags\n1,rome,a;b\n2,paris,c\n")
        df = read_csv_events(spark, str(p),
                             multi_value_delim={"tags": ";"})
        rows = {r.id: r for r in df.collect()}
        assert rows[1].tags == ["a", "b"]
        assert rows[2].city == "paris"

    def test_json_flatten(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("json")
        p = d / "data.json"
        p.write_text(
            '{"id": 1, "meta": {"lang": "en", "geo": {"lat": 1.5}}, "tags": ["x","y"]}\n'
            '{"id": 2, "meta": {"lang": "fr", "geo": {"lat": 2.5}}, "tags": []}\n')
        df = read_json_events(spark, str(p))
        assert set(df.columns) == {"id", "meta_lang", "meta_geo_lat", "tags"}
        rows = {r.id: r for r in df.collect()}
        assert rows[1].meta_lang == "en" and rows[1].meta_geo_lat == 1.5
        assert rows[1].tags == ["x", "y"]

    def test_flatten_preserves_array_of_struct(self, spark):
        df = spark.createDataFrame(
            [(1, [{"n": "a"}], {"x": 2})],
            "id long, g array<struct<n string>>, s struct<x long>")
        out = flatten_structs(df)
        assert set(out.columns) == {"id", "g", "s_x"}

    def test_xml_records(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("xml")
        p = d / "dump.xml"
        p.write_text(textwrap.dedent("""\
            <mediawiki>
              <page><title>Alpha</title><revision><text>hello world</text></revision></page>
              <page><title>Beta</title><revision><text>more text</text></revision></page>
            </mediawiki>"""))
        df = read_xml_events(spark, str(p), "page",
                             {"title": "title", "body": "revision/text"})
        rows = sorted((r.title, r.body) for r in df.collect())
        assert rows == [("Alpha", "hello world"), ("Beta", "more text")]


class TestChained:
    def test_chain_semi_join(self, spark):
        a = spark.createDataFrame(
            [(1, "bad"), (2, "ok"), (3, "bad")], "uid long, status string")
        b = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z"), (4, "w")], "uid long, payload string")
        out = chained_query(a, "STATUS == 'bad'", "uid", b, "uid")
        assert sorted(r.payload for r in out.collect()) == ["x", "z"]

    def test_chain_with_second_predicate(self, spark):
        a = spark.createDataFrame([(1, "bad")], "uid long, status string")
        b = spark.createDataFrame(
            [(1, "keep"), (1, "drop")], "uid long, kind string")
        out = chained_query(a, "STATUS == 'bad'", "uid", b, "uid",
                            jexl_b="KIND == 'keep'")
        assert [r.kind for r in out.collect()] == ["keep"]


def test_hll_cardinality_accuracy(spark):
    from datawave_spark.operators.discovery import cardinality
    df = spark.range(10000).withColumn("k", (F.col("id") % 500).cast("string"))
    got = {r.field: r.cardinality for r in cardinality(df, ["id", "k"]).collect()}
    assert abs(got["k"] - 500) / 500 < 0.05
    assert abs(got["id"] - 10000) / 10000 < 0.05


class TestNestedCorpus:
    """Books/Flatten-corpus shapes: nested JSON → flattened scalars +
    array<struct> sibling groups → grouping-context queries (the
    representation SURVEY §1.5 maps FIELD.context.instance onto)."""

    @pytest.fixture(scope="class")
    def books(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("books")
        p = d / "books.json"
        p.write_text(
            '{"isbn": "1", "info": {"title": "dune", "year": 1965}, '
            '"AUTHORS": [{"NAME": "herbert", "ROLE": "author"}]}\n'
            '{"isbn": "2", "info": {"title": "good omens", "year": 1990}, '
            '"AUTHORS": [{"NAME": "pratchett", "ROLE": "author"}, '
            '{"NAME": "gaiman", "ROLE": "author"}]}\n'
            '{"isbn": "3", "info": {"title": "sandman", "year": 1989}, '
            '"AUTHORS": [{"NAME": "gaiman", "ROLE": "author"}, '
            '{"NAME": "kieth", "ROLE": "artist"}]}\n')
        from datawave_spark.sources.readers import read_json_events
        return read_json_events(spark, str(p)).cache()

    def test_flattened_scalars_queryable(self, books):
        from datawave_spark.compiler import compile_query
        got = compile_query(books, "INFO_YEAR > 1985 && INFO_YEAR < 1991")
        assert sorted(r.isbn for r in got.collect()) == ["2", "3"]

    def test_grouping_context_same_struct(self, books):
        from datawave_spark.compiler import compile_query
        # gaiman AS ARTIST exists in no single sibling group
        none = compile_query(
            books, "grouping:matchesInGroup(NAME, 'gaiman', ROLE, 'artist')")
        assert none.count() == 0
        hit = compile_query(
            books, "grouping:matchesInGroup(NAME, 'kieth', ROLE, 'artist')")
        assert [r.isbn for r in hit.collect()] == ["3"]

    def test_group_by_context_over_json(self, books):
        from datawave_spark.operators.grouping import group_by_context
        out = group_by_context(books, "AUTHORS", ["ROLE"])
        roles = {r.ROLE: r.record_count for r in out.collect()}
        assert roles == {"author": 4, "artist": 1}


class TestWikipediaIngest:
    def _dump(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("wiki")
        xml = """<mediawiki>
<page>
  <title>Alpha</title><ns>4</ns><id>10</id>
  <revision>
    <id>500</id>
    <timestamp>2013-03-01T09:00:00Z</timestamp>
    <contributor><username>alice</username><id>7</id></contributor>
    <comment>first</comment>
    <text bytes="11">hello world</text>
    <sha1>abc</sha1>
  </revision>
</page>
<page>
  <title>Beta</title><ns>0</ns><id>11</id>
  <revision>
    <id>501</id>
    <timestamp>2013-03-02T09:00:00Z</timestamp>
    <contributor><username>bob</username><id>8</id></contributor>
    <text>beta text</text>
  </revision>
</page>
</mediawiki>"""
        f = d / "frwiki-20130305-pages-articles.xml"
        f.write_text(xml)
        return str(d)

    def test_depth_prefixed_fields_and_renames(self, spark,
                                               tmp_path_factory):
        from datawave_spark.sources.readers import read_wikipedia_dump
        df = read_wikipedia_dump(spark, self._dump(tmp_path_factory),
                                 datatype_name="frwiki")
        rows = {r.page_id: r for r in df.collect()}
        assert set(rows) == {10, 11}
        a = rows[10]
        # nested ids stay distinct; PAGE_NS renamed
        assert a.page_title == "Alpha" and a.page_namespace == "4"
        assert a.revision_id == 500 and a.contributor_id == 7
        assert a.contributor_username == "alice"
        # revision text is CONTENT, not an event field
        assert a.text == "hello world"
        assert "REVISION_TEXT" not in a.fields
        # attributes become DEPTH_ELEM_ATTR fields
        assert a.fields["REVISION_TEXT_BYTES"] == ["11"]
        assert a.fields["REVISION_SHA1"] == ["abc"]

    def test_language_and_event_date(self, spark, tmp_path_factory):
        from datawave_spark.sources.readers import read_wikipedia_dump
        df = read_wikipedia_dump(spark, self._dump(tmp_path_factory),
                                 datatype_name="frwiki")
        r = df.collect()[0]
        assert list(r.language) == ["FRENCH"]
        assert str(r.event_date) == "2013-03-05"

    def test_language_helpers(self):
        from datawave_spark.sources.readers import (wiki_event_date,
                                                    wiki_language)
        assert wiki_language("enwiki") == ["ENGLISH"]
        assert wiki_language("de_somewiki") == ["GERMAN"]
        assert wiki_language("nowikihere"[3:]) == []  # no code match
        assert wiki_language("plain") == []
        assert wiki_event_date("enwiki-20130305-pages.xml") == "2013-03-05"
        assert wiki_event_date("nodate.xml") is None


class TestNYCTLCReader:
    """warehouse/ingest-nyctlc parity: dynamic header parsing with
    unknown fields kept, and the derived WKT location fields built from
    the raw lat/lon strings."""

    @pytest.fixture(scope="class")
    def taxi(self, spark, tmp_path_factory):
        p = str(tmp_path_factory.mktemp("nyctlc") / "trips")
        spark.createDataFrame(
            [("1", "-73.991", "40.701", "-74.005", "41.120", "x1"),
             ("2", "-73.800", "40.650", None, None, "x2"),      # no dropoff
             ("3", None, None, "-74.100", "41.200", "x3")],     # no pickup
            "trip_id string, pickup_longitude string, "
            "pickup_latitude string, dropoff_longitude string, "
            "dropoff_latitude string, mystery_col string") \
            .coalesce(1).write.option("header", True).csv(p)
        from datawave_spark.sources.readers import read_nyctlc
        return read_nyctlc(spark, p)

    def test_derived_points_from_raw_strings(self, taxi):
        rows = {r.TRIP_ID: r for r in taxi.collect()}
        assert rows["1"].PICKUP_LOCATION == "POINT (-73.991 40.701)"
        assert rows["1"].DROPOFF_LOCATION == "POINT (-74.005 41.120)"

    def test_missing_pair_yields_null_not_partial_point(self, taxi):
        rows = {r.TRIP_ID: r for r in taxi.collect()}
        assert rows["2"].DROPOFF_LOCATION is None
        assert rows["3"].PICKUP_LOCATION is None

    def test_all_locations_is_union_of_existing_points(self, taxi):
        rows = {r.TRIP_ID: r for r in taxi.collect()}
        assert sorted(rows["1"].ALL_LOCATIONS) == sorted(
            [rows["1"].PICKUP_LOCATION, rows["1"].DROPOFF_LOCATION])
        assert rows["2"].ALL_LOCATIONS == [rows["2"].PICKUP_LOCATION]
        assert rows["3"].ALL_LOCATIONS == [rows["3"].DROPOFF_LOCATION]

    def test_unknown_fields_kept_and_uppercased(self, taxi):
        from datawave_spark.sources.readers import NYCTLC_KNOWN_FIELDS
        assert "MYSTERY_COL" in taxi.columns      # PROCESS_EXTRA_FIELDS
        unknown = (set(taxi.columns) - NYCTLC_KNOWN_FIELDS
                   - {"PICKUP_LOCATION", "DROPOFF_LOCATION",
                      "ALL_LOCATIONS", "ALL_POINTS", "ALL_POINTS_GEO",
                      "TOTAL_AMOUNT_INDEXED"})
        assert unknown == {"TRIP_ID", "MYSTERY_COL"}

    def test_all_points_unconditional_with_java_null_concat(self, taxi):
        """ALL_POINTS / ALL_POINTS_GEO are emitted UNCONDITIONALLY
        (NYCTLCIngestHelper.java:158-161) — a missing coordinate is
        Java string-concat 'null', and the SET multimap collapses the
        two identical 'POINT (null null)' entries of an all-null pair
        to one."""
        rows = {r.TRIP_ID: r for r in taxi.collect()}
        assert sorted(rows["1"].ALL_POINTS) == [
            "POINT (-73.991 40.701)", "POINT (-74.005 41.120)"]
        assert sorted(rows["1"].ALL_POINTS_GEO) == [
            "40.701 -73.991", "41.120 -74.005"]
        assert sorted(rows["2"].ALL_POINTS) == [
            "POINT (-73.800 40.650)", "POINT (null null)"]
        assert sorted(rows["2"].ALL_POINTS_GEO) == [
            "40.650 -73.800", "null null"]
        assert sorted(rows["3"].ALL_POINTS) == [
            "POINT (-74.100 41.200)", "POINT (null null)"]

    def test_extra_geometries_flag_adds_three_circles(self, spark,
                                                      tmp_path):
        """GENERATE_EXTRA_GEOMETRIES (NYCTLCIngestHelper.java:113-126):
        three 32-point circles (pickup, dropoff, max-corner — the
        Java's min+(max-min) reduces to max) join ALL_LOCATIONS when
        all four coordinates exist; rows missing a pair add nothing."""
        import math
        p = str(tmp_path / "extra")
        spark.createDataFrame(
            [("1", "-73.9", "40.7", "-74.0", "41.1"),
             ("2", "-73.8", "40.6", None, None)],
            "trip_id string, pickup_longitude string, "
            "pickup_latitude string, dropoff_longitude string, "
            "dropoff_latitude string") \
            .coalesce(1).write.option("header", True).csv(p)
        from datawave_spark.sources.readers import read_nyctlc
        rows = {r.TRIP_ID: r for r in read_nyctlc(
            spark, p, generate_extra_geometries=True).collect()}
        locs = rows["1"].ALL_LOCATIONS
        assert len(locs) == 5            # 2 points + 3 circles
        circles = [x for x in locs if x.startswith("POLYGON ((")]
        assert len(circles) == 3
        for c in circles:
            pts = c[len("POLYGON (("):-2].split(", ")
            assert len(pts) == 33 and pts[0] == pts[-1]   # closed ring
        # pickup circle: first vertex is (plon + r, plat)
        r = math.sqrt(0.1**2 + 0.4**2) / 2
        x0, y0 = map(float, circles[0].split("((")[1].split(",")[0].split())
        assert abs(x0 - (-73.9 + r)) < 1e-9 and abs(y0 - 40.7) < 1e-9
        assert len(rows["2"].ALL_LOCATIONS) == 1          # no circles

    def test_extra_circles_feed_geowave_predicates(self, spark, tmp_path):
        p = str(tmp_path / "geo")
        spark.createDataFrame(
            [("1", "-73.9", "40.7", "-74.0", "41.1")],
            "trip_id string, pickup_longitude string, "
            "pickup_latitude string, dropoff_longitude string, "
            "dropoff_latitude string") \
            .coalesce(1).write.option("header", True).csv(p)
        from datawave_spark.compiler import compile_query
        from datawave_spark.sources.readers import read_nyctlc
        df = read_nyctlc(spark, p, generate_extra_geometries=True) \
            .withColumn("GEOM", __import__("pyspark.sql.functions",
                                           fromlist=["x"])
                        .explode("ALL_LOCATIONS"))
        # bbox far from both points but crossing the pickup circle's
        # eastern rim (pickup + r ≈ -73.694)
        hits = compile_query(
            df, "geowave:intersects(GEOM, "
            "'POLYGON((-73.71 40.69, -73.65 40.69, -73.65 40.71, "
            "-73.71 40.71, -73.71 40.69))')")
        assert hits.count() > 0

    def test_overloaded_composite_flag(self, spark, tmp_path):
        p = str(tmp_path / "ovl")
        spark.createDataFrame(
            [("1", "-73.9", "40.7", "-74.0", "41.1")],
            "trip_id string, pickup_longitude string, "
            "pickup_latitude string, dropoff_longitude string, "
            "dropoff_latitude string") \
            .coalesce(1).write.option("header", True).csv(p)
        from datawave_spark.sources.readers import read_nyctlc
        row = read_nyctlc(spark, p,
                          generate_overloaded_composite=True).head()
        assert len(row.ALL_LOCATIONS_OVERLOADED) == 3
        assert all(c.startswith("POLYGON ((")
                   for c in row.ALL_LOCATIONS_OVERLOADED)
        # the point re-puts are set no-ops: ALL_LOCATIONS unchanged
        assert len(row.ALL_LOCATIONS) == 2

    def test_total_amount_indexed_copies_single_value(self, spark,
                                                      taxi, tmp_path):
        # fixture has no TOTAL_AMOUNT column -> derived field is NULL
        assert all(r.TOTAL_AMOUNT_INDEXED is None for r in taxi.collect())
        p = str(tmp_path / "amt")
        spark.createDataFrame(
            [("1", "12.50"), ("2", None)],
            "trip_id string, total_amount string") \
            .coalesce(1).write.option("header", True).csv(p)
        from datawave_spark.sources.readers import read_nyctlc
        rows = {r.TRIP_ID: r for r in read_nyctlc(spark, p).collect()}
        assert rows["1"].TOTAL_AMOUNT_INDEXED == "12.50"
        assert rows["2"].TOTAL_AMOUNT_INDEXED is None

    def test_derived_points_accepted_by_geowave_predicates(self, spark, taxi):
        """The derived WKT feeds the geowave: family — intersects on a
        bbox polygon must select by pickup point."""
        from datawave_spark.compiler import compile_query
        hits = compile_query(
            taxi.filter(taxi.PICKUP_LOCATION.isNotNull()),
            "geowave:intersects(PICKUP_LOCATION, "
            "'POLYGON((-74 40, -73.7 40, -73.7 40.8, -74 40.8, -74 40))')")
        assert sorted(r.TRIP_ID for r in hits.collect()) == ["1", "2"]

    def test_round_trip_collapses_to_one_location(self, spark, tmp_path):
        """HashMultimap is a SET multimap: identical pickup/dropoff
        coordinate strings (a round trip) are ONE location in the
        reference (review r6)."""
        p = str(tmp_path / "roundtrip")
        spark.createDataFrame(
            [("9", "-73.5", "40.5", "-73.5", "40.5")],
            "trip_id string, pickup_longitude string, "
            "pickup_latitude string, dropoff_longitude string, "
            "dropoff_latitude string") \
            .coalesce(1).write.option("header", True).csv(p)
        from datawave_spark.sources.readers import read_nyctlc
        row = read_nyctlc(spark, p).head()
        assert row.ALL_LOCATIONS == ["POINT (-73.5 40.5)"]
