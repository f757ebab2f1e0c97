"""PII / boilerplate scrubbing — JVM-side regex redaction.

Training corpora get scrubbed before anything else touches them:
emails, URLs, and long digit runs (account/card/phone-shaped) are
replaced with stable placeholder tokens so downstream dedup and
quality scoring see normalized text. Everything here is a plain
column expression (``regexp_replace`` / ``regexp_count``) — no UDF,
so the scrub rides inside WholeStageCodegen over the scan and costs
one narrow pass at any scale.

The patterns deliberately use only the regex subset that Java
(Spark) and RE2 (DuckDB) agree on — character classes, bounded
repetition, alternation; no backreferences or lookaround — which is
what makes the DuckDB oracle twin bit-exact.

Redaction ORDER is part of the contract: URL first (so an address
inside a query string counts as URL, not email/number), then email,
then long digit runs over what remains.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared Java/RE2 subset — keep in lockstep with DUCK_* twins below.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{9,}"

URL_TOKEN, EMAIL_TOKEN, NUM_TOKEN = "<URL>", "<EMAIL>", "<NUM>"

# DuckDB twins (this DuckDB build lacks regexp_count; use extract_all)
def duck_scrub(col: str) -> str:
    return (
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'{URL_RE}', '{URL_TOKEN}', 'g'), "
        f"'{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'), "
        f"'{LONGNUM_RE}', '{NUM_TOKEN}', 'g')"
    )


def duck_count(col: str, pattern: str) -> str:
    return f"cast(len(regexp_extract_all({col}, '{pattern}')) as bigint)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scrub_text(col: Column | str) -> Column:
    """Redact URLs, then emails, then >=9-digit runs."""
    c = F.regexp_replace(_c(col), URL_RE, URL_TOKEN)
    c = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    return F.regexp_replace(c, LONGNUM_RE, NUM_TOKEN)


def redaction_counts(col: Column | str) -> dict[str, Column]:
    """Per-category match counts BEFORE redaction, same order/patterns.

    Counts follow the redaction order semantics: emails are counted on
    the URL-redacted text and digit runs on the URL+email-redacted
    text, so a category never double-counts a span an earlier pass
    already claimed.
    """
    after_url = F.regexp_replace(_c(col), URL_RE, URL_TOKEN)
    after_email = F.regexp_replace(after_url, EMAIL_RE, EMAIL_TOKEN)
    return {
        "n_urls": F.regexp_count(_c(col), F.lit(URL_RE)).cast("long"),
        "n_emails": F.regexp_count(after_url, F.lit(EMAIL_RE)).cast("long"),
        "n_longnums": F.regexp_count(after_email, F.lit(LONGNUM_RE)).cast("long"),
    }
