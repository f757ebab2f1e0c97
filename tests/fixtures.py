"""Fixture builders for the reference-parity tests (FIXTURES.md).

Mirrors the reference's DataFaker generator signatures
(utils/DataFaker.java:14-26) with deterministic values: tests read
back generated fields rather than assuming them, exactly like the
reference tests do.
"""

from __future__ import annotations

from umn_eda_kafka_stream_processing_spark import schemas
from umn_eda_kafka_stream_processing_spark.sources.memory import rows_df


def customer(id, birthdt="1990-01-01", **kw):
    base = dict(
        id=id, type="PREMIUM", gender="U", fname=f"f-{id}", mname="",
        lname=f"l-{id}", fullname=f"f-{id} l-{id}", suffix="", title="",
        birthdt=birthdt, joindt="2022-01-02",
    )
    base.update(kw)
    return (id, base)


def address(id, customerid, state="MN", **kw):
    base = dict(
        id=id, customerid=customerid, formatcode="cd", type="HOME",
        line1=f"{id} 1st St", line2="Apt 2", citynm="Madison",
        state=state, zip5="55555", zip4="1234", countrycd="USA",
        latitude=0.0, longitude=0.0,
    )
    base.update(kw)
    return (id, base)


def email(id, customerid, address=None):
    return (id, dict(id=id, customerid=customerid,
                     email=address or f"{customerid}@utopia.test"))


def artist(id, name=None, genre="Rock"):
    return (id, dict(id=id, name=name or f"artist-{id}", genre=genre))


def event(id, artistid, venueid, capacity, eventdate="today"):
    return (id, dict(id=id, artistid=artistid, venueid=venueid,
                     capacity=capacity, eventdate=eventdate))


def venue(id, addressid, name=None, maxcapacity=100):
    return (id, dict(id=id, addressid=addressid, name=name or f"venue-{id}",
                     maxcapacity=maxcapacity))


def stream(id, customerid, artistid, streamtime="2024-01-01T00:00:00"):
    return (id, dict(id=id, customerid=customerid, artistid=artistid,
                     streamtime=streamtime))


def ticket(id, customerid, eventid, price=25.0):
    return (id, dict(id=id, customerid=customerid, eventid=eventid, price=price))


def df(spark, kind, rows, start_seq=0):
    return rows_df(spark, schemas.ENTITY_SCHEMAS[kind], rows, start_seq=start_seq)
