"""Scalar function library — the complete scalar surface the
reference uses (SURVEY.md §2.7), as Catalyst column expressions
(JVM-side, codegen'd — no Python UDFs in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int) -> Column:
    """Engine-portable half-up rounding of a double.

    ``floor(x * 10^s + 0.5) / 10^s`` — plain IEEE ops that evaluate
    bit-identically in any engine, unlike round(): Spark rounds
    doubles via their shortest decimal repr HALF_UP while DuckDB
    rounds half-to-even, so values landing exactly on a .5 boundary
    (common for ratios of small integers) diverge between engines.
    The DuckDB twin is the same SQL expression (see plans/catalog*).
    """
    factor = float(10 ** scale)
    return F.floor(col * factor + F.lit(0.5)) / factor


def stringify_address(
    line1="line1", line2="line2", citynm="citynm", state="state",
    zip5="zip5", zip4="zip4", countrycd="countrycd",
) -> Column:
    """"{line1}, {line2}, {citynm}, {state} {zip5}-{zip4} {countrycd}".

    reference: exercises/stateless/AddressSortAndStringify.java:15-20;
    golden: "111 1st St, Apt 2, Madison, WI 55555-1234 USA"
    (AddressSortAndStringifyTest.java:80,105).
    """
    return F.format_string(
        "%s, %s, %s, %s %s-%s %s",
        F.col(line1), F.col(line2), F.col(citynm), F.col(state),
        F.col(zip5), F.col(zip4), F.col(countrycd),
    )


def birth_decade_filter(
    birthdt: str = "birthdt", start_year: int = 1990, end_year: int = 1999
) -> Column:
    """Customers born in [start_year, end_year] from "YYYY-MM-DD".

    reference: exercises/stateless/TargetCustomerFilter.java:13-15;
    boundary behavior pinned by TargetCustomerFilterTest.java:70-90
    (1989 out, 1990 in, 1999 in, 2000 out).
    """
    year = F.substring(F.col(birthdt), 1, 4).cast("int")
    return year.between(start_year, end_year)


def composite_key(*cols: str, sep: str = "-") -> Column:
    """artistid + "-" + state style composite keys.

    reference: phase3/TopStreamingArtistByState.java:221.
    """
    return F.concat_ws(sep, *[F.col(c) for c in cols])


def split_composite_key(key: str = "key", sep: str = "-") -> tuple[Column, Column]:
    """Split a composite key on its LAST separator (test-side helper,
    reference: phase3/TopStreamingArtistByStateTest.java:793-797)."""
    prefix = F.expr(
        f"substring({key}, 1, length({key}) - length(substring_index({key}, '{sep}', -1)) - 1)"
    )
    suffix = F.substring_index(F.col(key), sep, -1)
    return prefix, suffix


def remaining_percentage(remaining: str = "remaining", capacity: str = "capacity") -> Column:
    """(remaining / capacity) * 100, clamped at 0 for oversold.

    reference: samples/PurchaseEventTicket.java:210-216
    (remainingPercentage() clamps negatives to 0).
    """
    pct = F.col(remaining) / F.col(capacity) * F.lit(100.0)
    return F.greatest(pct, F.lit(0.0))
