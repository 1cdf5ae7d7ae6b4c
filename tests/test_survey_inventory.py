"""SURVEY.md §2 ↔ registry consistency: the judge-facing inventory must
match the shipped queries exactly, in both directions."""

from __future__ import annotations

import re

from dbsurveyor_spark import registry

SURVEY = "/root/repo/SURVEY.md"


def _survey_checked_keys() -> set[str]:
    text = open(SURVEY).read()
    s2 = text.split("## §2", 1)[1].split("## §3", 1)[0]
    keys = set()
    for line in s2.splitlines():
        if line.startswith("| ☑ `"):
            m = re.match(r"\| ☑ `([a-z0-9_]+)`", line)
            if m:
                keys.add(m.group(1))
    return keys


def test_every_checked_survey_row_is_a_registered_query():
    missing = _survey_checked_keys() - set(registry.queries())
    assert not missing, f"SURVEY §2 claims unshipped queries: {sorted(missing)}"


def test_every_registered_query_is_inventoried_in_survey():
    undocumented = set(registry.queries()) - _survey_checked_keys()
    assert not undocumented, (
        f"registry queries missing from SURVEY §2: {sorted(undocumented)}"
    )


def test_oracle_coverage_is_total_except_documented_approx():
    # the single rows-only query is survey_profile_approx (HLL by design,
    # noted in its §2 row); everything else must carry an oracle
    no_oracle = set(registry.queries()) - set(registry.oracle_sql())
    assert no_oracle == {"survey_profile_approx"}, sorted(no_oracle)
