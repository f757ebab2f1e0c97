"""Reference-parity tests — one test per pinned behavior of the
reference's test suite (SURVEY.md §5; scenario list in FIXTURES.md).

Batch pipelines assert final state; the reference's per-record
emission sequences are covered by the streaming tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import tests.fixtures as fx
from umn_eda_kafka_stream_processing_spark.pipelines import reference as pipe


def rows(df, *order_cols):
    if order_cols:
        df = df.orderBy(*order_cols)
    return [r.asDict() for r in df.collect()]


# --- CustomerStreamCounterTest.java:70-96 -------------------------------
def test_customer_stream_count(spark):
    streams = fx.df(spark, "stream", [
        fx.stream("s1", "1", "a1"),
        fx.stream("s2", "1", "a2"),
        fx.stream("s3", "2", "a1"),
        fx.stream("s4", "1", "a3"),
    ])
    got = {r["customerid"]: r["count"] for r in pipe.customer_stream_count(streams).collect()}
    assert got == {"1": 3, "2": 1}


# --- ArtistTicketsTest.java:60-98 ---------------------------------------
def test_artist_ticket_count(spark):
    events = fx.df(spark, "event", [
        fx.event("event-1", "artist-1", "venue-1", 100),
        fx.event("event-2", "artist-2", "venue-1", 100),
    ])
    tickets = fx.df(spark, "ticket", [
        fx.ticket("t1", "c1", "event-1"),
        fx.ticket("t2", "c1", "event-2"),
        fx.ticket("t3", "c2", "event-2"),
        fx.ticket("t4", "c3", "event-2"),
        fx.ticket("t5", "c4", "event-2"),
    ])
    got = {r["artistid"]: r["count"] for r in pipe.artist_ticket_count(tickets, events).collect()}
    assert got == {"artist-1": 1, "artist-2": 4}


# --- TargetCustomerFilterTest.java:69-122 -------------------------------
def test_target_customer_filter_boundaries(spark):
    customers = fx.df(spark, "customer", [
        fx.customer("c89", birthdt="1989-01-20"),
        fx.customer("c90", birthdt="1990-01-20"),
        fx.customer("c99", birthdt="1999-01-20"),
        fx.customer("c00", birthdt="2000-01-20"),
    ])
    got = sorted(r["id"] for r in pipe.target_customer_filter(customers).collect())
    assert got == ["c90", "c99"]


def test_target_customer_filter_merges_legacy(spark):
    customers = fx.df(spark, "customer", [fx.customer("new-1", birthdt="1995-06-15")])
    legacy = fx.df(spark, "customer", [
        fx.customer("old-1", birthdt="1992-03-03"),
        fx.customer("old-2", birthdt="1985-03-03"),
    ], start_seq=100)
    got = sorted(r["id"] for r in pipe.target_customer_filter(customers, legacy).collect())
    assert got == ["new-1", "old-1"]


# --- AddressSortAndStringifyTest.java:67-106 ----------------------------
def test_address_stringify_golden(spark):
    addresses = fx.df(spark, "address", [
        fx.address("a1", "cust-678", state="WI", line1="111 1st St",
                   line2="Apt 2", citynm="Madison", zip5="55555", zip4="1234"),
        fx.address("a2", "cust-679", state="MN", line1="222 1st St",
                   line2="Suite 4", citynm="Minneapolis", zip5="55419", zip4="1234"),
    ])
    mn, other = pipe.address_sort_and_stringify(addresses)
    assert rows(mn) == [{"key": "MN", "value": "222 1st St, Suite 4, Minneapolis, MN 55419-1234 USA"}]
    assert rows(other) == [{"key": "WI", "value": "111 1st St, Apt 2, Madison, WI 55555-1234 USA"}]


# --- TopCustomerArtistsTest.java:67-113 (grouped top-3 with ties) -------
def test_top_customer_artists_topk_ties(spark):
    plays = ["2", "2", "3", "4", "4", "4", "5", "5", "3", "3"]
    streams = fx.df(spark, "stream", [
        fx.stream(f"s{i}", "cust-1", f"artist-{a}") for i, a in enumerate(plays)
    ])
    got = rows(pipe.top_customer_artists(streams), "rank")
    # final counts: artist-4:3, artist-3:3, artist-2:2, artist-5:2
    # deterministic tie-break count DESC then artistid ASC
    assert [(r["artistid"], r["count"], r["rank"]) for r in got] == [
        ("artist-3", 3, 1), ("artist-4", 3, 2), ("artist-2", 2, 3),
    ]


# --- PurchaseEventTicketTest.java:76-139 (capacity lifecycle) -----------
def test_purchase_event_ticket_capacity_lifecycle(spark):
    events = fx.df(spark, "event", [fx.event("exciting-event-123", "artist-1", "venue-1", 5)])
    tickets = fx.df(spark, "ticket", [
        fx.ticket(f"t{i}", f"c{i}", "exciting-event-123") for i in range(1, 9)
    ])
    got = rows(pipe.purchase_event_ticket(tickets, events), "total_requested")
    statuses = [r["confirmation_status"] for r in got]
    assert statuses == ["CONFIRMED"] * 5 + ["REJECTED"] * 3
    # 5th confirmation lands exactly at remaining 0 (reference :206-208)
    assert got[4]["remaining_tickets"] == 0.0
    assert got[4]["branch"] == "limited"
    assert got[0]["branch"] == "available"  # 4/5 = 80% remaining
    assert got[3]["branch"] == "limited"    # 1/5 = 20% remaining
    assert got[5]["remaining_tickets"] == -1.0
    assert got[5]["branch"] == "sold-out"


# --- KTable upsert semantics (PurchaseEventTicket.java:44-51) -----------
def test_ktable_upsert_last_write_wins(spark):
    events = fx.df(spark, "event", [
        fx.event("e1", "artist-1", "venue-1", 2),
        fx.event("e1", "artist-1", "venue-1", 4),  # re-piped: capacity now 4
    ])
    tickets = fx.df(spark, "ticket", [
        fx.ticket(f"t{i}", f"c{i}", "e1") for i in range(1, 5)
    ])
    got = rows(pipe.purchase_event_ticket(tickets, events), "total_requested")
    assert [r["confirmation_status"] for r in got] == ["CONFIRMED"] * 4


# --- TopStreamingArtistByStateTest.java:644-813 (artist×state matrix) ---
def test_top_streaming_artist_by_state_matrix(spark):
    artists = fx.df(spark, "artist", [
        fx.artist("a1", name="Alpha"), fx.artist("a2", name="Beta"),
        fx.artist("a3", name="Gamma"),
    ])
    custs = [("c1", "CA"), ("c2", "CA"), ("c3", "NY"), ("c4", "TX"),
             ("c5", "FL"), ("c6", "NY")]
    customers = fx.df(spark, "customer", [fx.customer(c) for c, _ in custs])
    addresses = fx.df(spark, "address", [
        fx.address(f"ad-{c}", c, state=s) for c, s in custs
    ])
    streams = fx.df(spark, "stream", [
        fx.stream("s1", "c1", "a1"), fx.stream("s2", "c2", "a1"),
        fx.stream("s3", "c3", "a1"), fx.stream("s4", "c4", "a2"),
        fx.stream("s5", "c5", "a3"), fx.stream("s6", "c6", "a3"),
        fx.stream("s7", "c1", "a1"), fx.stream("s8", "c6", "a3"),
    ])
    got = {r["key"]: (r["artistname"], r["count"])
           for r in pipe.top_streaming_artist_by_state(streams, artists, customers, addresses).collect()}
    assert got == {
        "a1-CA": ("Alpha", 3), "a1-NY": ("Alpha", 1),
        "a2-TX": ("Beta", 1), "a3-FL": ("Gamma", 1), "a3-NY": ("Gamma", 2),
    }


# --- OutOfStateSalesTest.java:104-150 -----------------------------------
def test_out_of_state_sales(spark):
    addresses = fx.df(spark, "address", [
        fx.address("va-1", None, state="MN"),       # venue address
        fx.address("ca-1", "c1", state="MN"),       # in-state customer
        fx.address("ca-2", "c2", state="WI"),       # out-of-state
        fx.address("ca-3", "c3", state="CA"),       # out-of-state
    ])
    venues = fx.df(spark, "venue", [fx.venue("v1", "va-1", name="First Ave")])
    events = fx.df(spark, "event", [fx.event("e1", "a1", "v1", 100)])
    tickets = fx.df(spark, "ticket", [
        fx.ticket("t1", "c1", "e1"), fx.ticket("t2", "c2", "e1"),
        fx.ticket("t3", "c3", "e1"), fx.ticket("t4", "c2", "e1"),
    ])
    got = rows(pipe.out_of_state_sales(tickets, events, venues, addresses))
    assert got == [{"venueid": "v1", "venuename": "First Ave", "count": 3}]


# --- TopSellingGenreByVenueTest.java:309-372 ----------------------------
def test_top_selling_genre_by_venue(spark):
    artists = fx.df(spark, "artist", [
        fx.artist("a1", genre="Rock"), fx.artist("a2", genre="Pop"),
        fx.artist("a3", genre="Jazz"),
    ])
    venues = ["v1", "v2", "v3"]
    events = fx.df(spark, "event", [
        fx.event(f"e-{v}-{a}", f"a{a}", v, 100)
        for v in venues for a in (1, 2, 3)
    ])
    # per venue: 3 Rock, 2 Pop, 1 Jazz
    tickets = fx.df(spark, "ticket", [
        fx.ticket(f"t-{v}-{a}-{i}", f"c{i}", f"e-{v}-{a}")
        for v in venues
        for a, n in ((1, 3), (2, 2), (3, 1))
        for i in range(n)
    ])
    got = rows(pipe.top_selling_genre_by_venue(tickets, events, artists), "venueid", "rank")
    for v in venues:
        sub = [(r["genre"], r["count"], r["rank"]) for r in got if r["venueid"] == v]
        assert sub == [("Rock", 3, 1), ("Pop", 2, 2), ("Jazz", 1, 3)]


def test_top_selling_genre_eighteen_tickets_three_venues(spark):
    """Mirror of the reference's largest aggregate test
    (phase3/TopSellingGenreByVenueTest.java:309-372): 3 venues x 3
    artists, 9 events (artist i%3 at venue i//3), 18 tickets giving
    per-venue genre counts 3/2/1 — batch asserts the final state the
    reference's per-record emission converges to."""
    from umn_eda_kafka_stream_processing_spark.pipelines.reference import top_selling_genre_by_venue

    genres = ["Rock", "Jazz", "Pop"]
    artists = fx.df(spark, "artist", [
        fx.artist(f"artist-{i+1}", genre=genres[i]) for i in range(3)
    ])
    events = fx.df(spark, "event", [
        fx.event(f"event-{i+1}", f"artist-{i % 3 + 1}", f"venue-{i // 3 + 1}", 50)
        for i in range(9)
    ])
    ticket_events = [
        "event-1", "event-1", "event-1", "event-2", "event-2", "event-3",
        "event-4", "event-4", "event-4", "event-5", "event-5", "event-6",
        "event-7", "event-7", "event-7", "event-8", "event-8", "event-9",
    ]
    tickets = fx.df(spark, "ticket", [
        fx.ticket(f"ticket-{i+1}", f"customer-{i+1}", e)
        for i, e in enumerate(ticket_events)
    ])
    got = {
        (r["venueid"], r["rank"]): (r["genre"], r["count"])
        for r in top_selling_genre_by_venue(tickets, events, artists).collect()
    }
    for v in ("venue-1", "venue-2", "venue-3"):
        assert got[(v, 1)] == ("Rock", 3)
        assert got[(v, 2)] == ("Jazz", 2)
        assert got[(v, 3)] == ("Pop", 1)
