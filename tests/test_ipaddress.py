"""IpAddressQueryTest corpus port (reference warehouse/query-core/src/
test/java/datawave/query/IpAddressQueryTest.java, data verbatim from
src/test/resources/input/ipaddress.csv — 10 events; PUBLIC_IP and
PLANET are multi-valued, PUBLIC_IP / PRIVATE_IP bind IpAddressType).

Expected event-id sets are hand-evaluated from the CSV under the
reference's semantics: IP ordering is octet-numeric (the zero-padded
IpAddressType encoding's lexicographic order), bounded ranges are
same-value, regexes are CI full-match on the canonical value, and
_ANYFIELD_ regexes sweep every field's values.

This port forced a real fix (r10): ranges on ipAddress-normalized
fields compared lexicographically on the UNPADDED canonical form, so
'9.9.140.133' sorted below '9.9.40.1' and testRange returned 0 rows.
_ipv4_long (compiler/columns.py) now realizes the octet ordering."""

import pytest

from datawave_spark.compiler import compile_query

# ipaddress.csv rows: START_DATE, EVENT_ID, PUBLIC_IP(multi),
# PRIVATE_IP, LOCATION, PLANET(multi)
ROWS = [
    ("20150707", "ipaddr-11-1-07", ["9.9.11.1", "8.8.11.1"],
     "11.11.11.1", "paris", ["pluto", "venus", "neptune"]),
    ("20150707", "ipaddr-11-129-07", ["9.111.11.129", "8.121.11.129"],
     "125.125.11.129", "rome", ["jupiter", "saturn"]),
    ("20150707", "ipaddr-11-255-07", ["9.171.11.255", "8.161.11.255"],
     "192.192.11.255", "rome", ["jupiter", "pluto", "mercury"]),
    ("20150707", "ipaddr-11-111-07", ["9.211.11.111", "8.241.11.111"],
     "221.211.11.111", "paris", ["mars", "venus", "saturn"]),
    ("20150808", "ipaddr-22-55-08", ["9.9.22.55", "8.8.22.1"],
     "22.22.22.55", "rome", ["uranus", "mars"]),
    ("20150808", "ipaddr-22-122-08", ["9.9.80.122", "8.8.90.122"],
     "22.90.90.122", "paris", ["neptune", "venus", "mars"]),
    ("20150808", "ipaddr-22-222-08", ["9.9.182.222", "8.8.190.222"],
     "22.90.90.222", "london", ["mars", "venus", "pluto"]),
    ("20150909", "ipaddr-33-55-09", ["9.9.33.55", "8.8.33.1"],
     "33.33.33.55", "london", ["mercury", "saturn", "venus"]),
    ("20150909", "ipaddr-33-133-09", ["9.9.140.133", "8.8.153.133"],
     "33.90.163.133", "rome", ["saturn", "mercury"]),
    ("20150909", "ipaddr-33-233-09", ["9.9.193.233", "8.8.213.233"],
     "33.90.201.233", "paris", ["venus", "pluto", "uranus"]),
]
SCHEMA = ("START_DATE string, EVENT_ID string, PUBLIC_IP array<string>, "
          "PRIVATE_IP string, LOCATION string, PLANET array<string>")
FT = {"PUBLIC_IP": "ipAddress", "PRIVATE_IP": "ipAddress",
      "LOCATION": "lcNoDiacritics", "PLANET": "lcNoDiacritics",
      "START_DATE": "lcNoDiacritics", "EVENT_ID": "lcNoDiacritics"}
ALL = {r[1] for r in ROWS}


@pytest.fixture(scope="module")
def ipdf(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(df, q):
    out = compile_query(df, q, field_types=FT)
    return {r.EVENT_ID for r in out.select("EVENT_ID").collect()}


class TestIpAddressQueries:
    def test_single_value(self, ipdf):
        assert run(ipdf, "PUBLIC_IP == '8.121.11.129'") \
            == {"ipaddr-11-129-07"}

    def test_or(self, ipdf):
        q = "PUBLIC_IP == '9.9.80.122' || PRIVATE_IP == '33.33.33.55'"
        assert run(ipdf, q) == {"ipaddr-22-122-08", "ipaddr-33-55-09"}

    def test_range(self, ipdf):
        # octet-numeric ordering: 9.9.140.133 is ABOVE 9.9.40.1
        q = ("((_Bounded_ = true) && (PUBLIC_IP >= '9.9.9.9' && "
             "PUBLIC_IP <= '9.9.40.1'))")
        assert run(ipdf, q) == {"ipaddr-11-1-07", "ipaddr-22-55-08",
                                "ipaddr-33-55-09"}

    def test_range_with_regex_field(self, ipdf):
        q = ("((_Bounded_ = true) && (PUBLIC_IP >= '9.9.9.9' && "
             "PUBLIC_IP <= '9.9.40.1')) && PLANET =~ 'm.*'")
        assert run(ipdf, q) == {"ipaddr-22-55-08", "ipaddr-33-55-09"}

    def test_range_with_not_eq(self, ipdf):
        q = ("((_Bounded_ = true) && (PRIVATE_IP >= '20.20.20.20' && "
             "PRIVATE_IP <= '30.30.30.30')) && LOCATION != 'paris'")
        assert run(ipdf, q) == {"ipaddr-22-55-08", "ipaddr-22-222-08"}

    def test_multi_range(self, ipdf):
        q = ("((_Bounded_ = true) && (PRIVATE_IP >= '20.20.20.20' && "
             "PRIVATE_IP <= '22.90.90.200')) || "
             "((_Bounded_ = true) && (PRIVATE_IP >= '33.60.60.60' && "
             "PRIVATE_IP <= '33.100.100.200'))")
        assert run(ipdf, q) == {"ipaddr-22-55-08", "ipaddr-22-122-08",
                                "ipaddr-33-133-09", "ipaddr-33-233-09"}

    def test_anyfield_regex(self, ipdf):
        assert run(ipdf, r"_ANYFIELD_ =~ '33\.90\..*'") \
            == {"ipaddr-33-133-09", "ipaddr-33-233-09"}

    def test_regex_class_a(self, ipdf):
        # every event has a 9.x.y.z public IP
        assert run(ipdf, r"_ANYFIELD_ =~ '9\..*\..*\..*'") == ALL

    def test_regex_class_b_no_false_positives(self, ipdf):
        # '8\..8\.' needs a one-char octet-tail '8' in the second
        # position — no value has one; full-match must return NOTHING
        # (a padded-encoding leak would fabricate matches)
        assert run(ipdf, r"_ANYFIELD_ =~ '8\..8\..*\..*'") == set()

    def test_regex_class_c(self, ipdf):
        assert run(ipdf, r"_ANYFIELD_ =~ '8\.8\.90\..*'") \
            == {"ipaddr-22-122-08"}


class TestIpOrderingUnit:
    def test_scalar_inequalities_octet_numeric(self, spark):
        df = spark.createDataFrame(
            [("a", "9.9.11.1"), ("b", "9.9.140.133"), ("c", "9.9.40.1")],
            "uid string, IP string")
        got = {r.uid for r in compile_query(
            df, "IP > '9.9.40.1'", field_types={"IP": "ipAddress"})
            .collect()}
        assert got == {"b"}
        got = {r.uid for r in compile_query(
            df, "IP < '9.9.40.1'", field_types={"IP": "ipAddress"})
            .collect()}
        assert got == {"a"}

    def test_non_ip_value_never_matches_ordering(self, spark):
        df = spark.createDataFrame(
            [("a", "not-an-ip"), ("b", "9.9.9.9")], "uid string, IP string")
        got = {r.uid for r in compile_query(
            df, "IP >= '1.0.0.0'", field_types={"IP": "ipAddress"})
            .collect()}
        assert got == {"b"}
