"""PII scrubbing (operators/pii.py): redaction behavior on the tricky
inputs the driver query's arithmetic corpus cannot produce — plus the
plan guarantee that the pass is map-only JVM regex (no Python, no
shuffle)."""

import pytest

from tika_xapian_spark.operators.pii import pii_scrub


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return pii_scrub(df, "text").collect()[0]


class TestEmail:
    def test_plus_addressing_and_subdomains(self, spark):
        r = _one(spark, "mail me at first.last+tag@sub.mail.example.co.uk now")
        assert r.scrubbed == "mail me at <EMAIL> now"
        assert r.n_emails == 1

    def test_numeric_host_is_not_an_email(self, spark):
        # TLD must be alphabetic, so the host falls through to the IP rule
        r = _one(spark, "ping a@1.2.3.4 please")
        assert r.scrubbed == "ping a@<IP> please"
        assert (r.n_emails, r.n_ips) == (0, 1)

    def test_two_emails_counted_independently(self, spark):
        r = _one(spark, "x@a.org y@b.net")
        assert r.scrubbed == "<EMAIL> <EMAIL>"
        assert r.n_emails == 2


class TestIpAndPhone:
    def test_ip_at_string_edges(self, spark):
        r = _one(spark, "10.0.0.1")
        assert r.scrubbed == "<IP>" and r.n_ips == 1

    def test_version_string_prefix_matches_documented_behavior(self, spark):
        # Known, deliberate false positive: a 5-component dotted string
        # still contains a \b-delimited 4-component prefix. Pinned so a
        # future "fix" is a conscious semantic change (oracle moves too).
        r = _one(spark, "release 1.2.3.4.5 shipped")
        assert r.scrubbed == "release <IP>.5 shipped"

    def test_phone_needs_word_boundary(self, spark):
        r = _one(spark, "call 555-1234 not 5555-1234 nor 555-12345")
        assert r.scrubbed == "call <PHONE> not 5555-1234 nor 555-12345"
        assert r.n_phones == 1


class TestContract:
    def test_counts_taken_before_replacement(self, spark):
        # The email's host would be eaten by the email scrub before the IP
        # pass, but n_ips counts the ORIGINAL text: 1.2.3.4 inside the
        # email host matches the IP pattern there ('.' is a boundary char).
        r = _one(spark, "a@1.2.3.4.example.com")
        assert r.n_emails == 1
        assert r.n_ips == 1
        assert r.scrubbed == "<EMAIL>"

    def test_clean_text_untouched(self, spark):
        txt = "no personal data here, just 12 plain words and 3.14"
        r = _one(spark, txt)
        assert r.scrubbed == txt
        assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)

    def test_map_only_jvm_plan(self, spark):
        df = spark.createDataFrame([(0, "x@y.org")], "doc_id long, text string")
        plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan  # no Arrow/Batch eval — pure JVM regex
