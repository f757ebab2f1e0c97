"""Entity schemas for the reference domain.

The reference models 9 "Utopia" music-platform entities as JSON on
Kafka topics (reference: src/main/java/org/improving/workshop/
Streams.java:30-55; field lists per SURVEY.md §1.2 / FIXTURES.md).
All ids and dates are strings (the reference keeps dates as opaque
"YYYY-MM-DD" strings), capacity is int, price double, counts long.

Every input table additionally carries the Kafka record envelope the
reference's TopologyTestDriver tests use:

* ``key``       — the record key piped via ``pipeInput(key, value)``
* ``event_seq`` — monotone arrival order. Several reference behaviors
  are arrival-order-dependent (KTable upsert last-write-wins, as-of
  joins, running aggregates); a total order column makes them
  well-defined and distributable.
"""

from __future__ import annotations

from pyspark.sql import types as T

ENVELOPE_FIELDS = [
    T.StructField("key", T.StringType(), True),
    T.StructField("event_seq", T.LongType(), True),
]


def _entity(fields: list[T.StructField]) -> T.StructType:
    return T.StructType(fields + ENVELOPE_FIELDS)


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


# reference: mockdata Customer record; ctor usage at
# exercises/stateless/TargetCustomerFilterTest.java:70-73
CUSTOMER = _entity(
    [_s(n) for n in (
        "id", "type", "gender", "fname", "mname", "lname",
        "fullname", "suffix", "title", "birthdt", "joindt",
    )]
)

# reference: mockdata Address; 13-arg ctor at
# exercises/stateless/AddressSortAndStringifyTest.java:70-72
ADDRESS = _entity(
    [_s(n) for n in (
        "id", "customerid", "formatcode", "type", "line1", "line2",
        "citynm", "state", "zip5", "zip4", "countrycd",
    )]
    + [
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
    ]
)

EMAIL = _entity([_s(n) for n in ("id", "customerid", "email")])

PHONE = _entity(
    [_s(n) for n in (
        "id", "customerid", "phonetypecd", "primaryind",
        "timezone", "extnbr", "number",
    )]
)

# reference: Streams.java:33; name()/genre() usage at
# phase3/TopStreamingArtistByState.java:218, TopSellingGenreByVenue.java:157
ARTIST = _entity([_s(n) for n in ("id", "name", "genre")])

# reference: ctor at samples/PurchaseEventTicketTest.java:81
EVENT = _entity(
    [
        _s("id"), _s("artistid"), _s("venueid"),
        T.StructField("capacity", T.IntegerType(), True),
        _s("eventdate"),
    ]
)

VENUE = _entity(
    [
        _s("id"), _s("addressid"), _s("name"),
        T.StructField("maxcapacity", T.IntegerType(), True),
    ]
)

# "stream" = a listen event; reference: Streams.java:48
STREAM = _entity([_s(n) for n in ("id", "customerid", "artistid", "streamtime")])

# reference: Streams.java:51; price Double per Ticket usage
TICKET = _entity(
    [
        _s("id"), _s("customerid"), _s("eventid"),
        T.StructField("price", T.DoubleType(), True),
    ]
)

ENTITY_SCHEMAS: dict[str, T.StructType] = {
    "customer": CUSTOMER,
    "address": ADDRESS,
    "email": EMAIL,
    "phone": PHONE,
    "artist": ARTIST,
    "event": EVENT,
    "venue": VENUE,
    "stream": STREAM,
    "ticket": TICKET,
}

# Kafka topic names, as declared in the reference
# (Streams.java:30-55); outputs are prefixed kafka-workshop-
# (readme.md:115-118).
TOPICS: dict[str, str] = {
    "address": "data-demo-addresses",
    "artist": "data-demo-artists",
    "customer": "data-demo-customers",
    "email": "data-demo-emails",
    "event": "data-demo-events",
    "phone": "data-demo-phones",
    "stream": "data-demo-streams",
    "ticket": "data-demo-tickets",
    "venue": "data-demo-venues",
}
OUTPUT_TOPIC_PREFIX = "kafka-workshop-"
