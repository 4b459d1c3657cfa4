"""PII scrub pass: planted-lane detection, masking, and clean-lane
zero counts (the scanner never references the planting lanes)."""

from __future__ import annotations

import re

import pytest

from aruna_spark.queries.textstats import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    textstats_pii_scan,
)


@pytest.fixture(scope="module")
def scan(spark, sf_dir):
    return {r.doc_id: r for r in textstats_pii_scan(spark, sf_dir).collect()}


def test_planted_lanes_detected(scan):
    for k, r in scan.items():
        if k % 7 == 1:
            assert r.n_emails == 1 and r.has_pii
        elif k % 7 == 2:
            assert r.n_phones == 1 and r.has_pii
        elif k % 7 == 3:
            assert r.n_ipv4 == 1 and r.has_pii
        elif k % 7 == 4:
            assert r.n_emails == 1 and r.n_phones == 1 and r.has_pii
        else:
            assert not r.has_pii
            assert r.n_emails == r.n_phones == r.n_ipv4 == 0


def test_masking_removes_every_match(scan):
    pats = [PII_EMAIL_RE, PII_PHONE_RE, PII_IPV4_RE]
    dirty = [r for r in scan.values() if r.has_pii]
    assert dirty
    for r in dirty:
        for p in pats:
            assert not re.search(p, r.masked_text)
    masked_tokens = {"[EMAIL]", "[PHONE]", "[IP]"}
    assert any(
        any(tok in r.masked_text for tok in masked_tokens) for r in dirty
    )


def test_clean_docs_text_untouched(spark, sf_dir, scan):
    from aruna_spark.catalog import load_table

    originals = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for k, r in scan.items():
        if k % 7 not in (1, 2, 3, 4):
            assert r.masked_text == originals[k]
