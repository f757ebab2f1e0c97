"""Tests for the readme scenario-catalog pipelines
(reference: readme.md:150-208; pipelines/scenarios.py)."""

from __future__ import annotations

from tests import fixtures as fx
from umn_eda_kafka_stream_processing_spark.pipelines import scenarios as sc


def test_top_artists_global(spark):
    streams = fx.df(spark, "stream", [
        fx.stream(f"s{i}", f"c{i % 2}", a)
        for i, a in enumerate(["a1", "a1", "a1", "a2", "a2", "a3", "a4"])
    ])
    got = [(r["artistid"], r["count"], r["rank"])
           for r in sc.top_artists_global(streams, k=3).orderBy("rank").collect()]
    assert got == [("a1", 3, 1), ("a2", 2, 2), ("a3", 1, 3)]  # a3 beats a4 on id tie


def test_customers_by_top_artist(spark):
    streams = fx.df(spark, "stream", [
        fx.stream("s1", "c1", "a1"), fx.stream("s2", "c1", "a1"),
        fx.stream("s3", "c2", "a1"), fx.stream("s4", "c3", "a2"),
    ])
    got = {r["artistid"]: (r["n_customers"], list(r["customerids"]))
           for r in sc.customers_by_top_artist(streams).collect()}
    assert got == {"a1": (2, ["c1", "c2"]), "a2": (1, ["c3"])}


def test_sold_out_event_alerts(spark):
    events = fx.df(spark, "event", [
        fx.event("e1", "a1", "v1", 10),   # 10 tickets → sold-out
        fx.event("e2", "a1", "v1", 10),   # 9/10 → near-capacity (10% left)
        fx.event("e3", "a1", "v1", 10),   # 5/10 → no alert
    ])
    tickets = fx.df(spark, "ticket",
        [fx.ticket(f"t1{i}", "c1", "e1") for i in range(10)]
        + [fx.ticket(f"t2{i}", "c1", "e2") for i in range(9)]
        + [fx.ticket(f"t3{i}", "c1", "e3") for i in range(5)],
    )
    got = {r["eventid"]: r["alert"] for r in sc.sold_out_event_alerts(tickets, events).collect()}
    assert got == {"e1": "sold-out", "e2": "near-capacity"}


def test_must_see_venue(spark):
    events = fx.df(spark, "event", [
        fx.event("e1", "a1", "v1", 10), fx.event("e2", "a1", "v1", 10),
        fx.event("e3", "a1", "v2", 10),
    ])
    tickets = fx.df(spark, "ticket", [
        fx.ticket("t1", "c1", "e3"), fx.ticket("t2", "c2", "e3"),
        fx.ticket("t3", "c1", "e1"), fx.ticket("t4", "c1", "e2"),  # c1 dup at v1
    ])
    assert sc.must_see_venue_by_events(events).collect()[0]["venueid"] == "v1"
    top = sc.must_see_venue_by_customers(tickets, events).collect()[0]
    assert (top["venueid"], top["n_customers"]) == ("v2", 2)  # v1 has 1 distinct


def test_suggested_events_by_genre(spark):
    artists = fx.df(spark, "artist", [
        fx.artist("a1", genre="Rock"), fx.artist("a2", genre="Jazz"),
    ])
    streams = fx.df(spark, "stream", [
        fx.stream("s1", "c1", "a1"), fx.stream("s2", "c1", "a1"),
        fx.stream("s3", "c1", "a2"), fx.stream("s4", "c2", "a2"),
    ])
    events = fx.df(spark, "event", [
        fx.event("e1", "a1", "v1", 10), fx.event("e2", "a2", "v1", 10),
    ])
    got = {(r["customerid"], r["eventid"])
           for r in sc.suggested_events_by_genre(streams, artists, events).collect()}
    assert got == {("c1", "e1"), ("c2", "e2")}  # c1→Rock events, c2→Jazz events


def test_global_totals(spark):
    customers = fx.df(spark, "customer", [fx.customer("c1"), fx.customer("c2")])
    streams = fx.df(spark, "stream", [fx.stream("s1", "c1", "a1")])
    got = {r["entity"]: r["total"]
           for r in sc.global_totals(customers=customers, streams=streams).collect()}
    assert got == {"customers": 2, "streams": 1}


def test_event_artist_top_streamer_alerts_with_email(spark):
    # reference readme.md SOLD OUT EVENT BONUS + DOUBLE BONUS
    events = fx.df(spark, "event", [fx.event("e1", "a1", "v1", 10)])
    streams = fx.df(spark, "stream", [
        fx.stream("s1", "c1", "a1"), fx.stream("s2", "c1", "a1"),
        fx.stream("s3", "c2", "a1"), fx.stream("s4", "c3", "a2"),  # other artist
    ])
    emails = fx.df(spark, "email", [
        fx.email("m1", "c1", "c1@x.io"), fx.email("m2", "c2", "old@x.io"),
        fx.email("m3", "c2", "c2@x.io"),  # latest per customer wins
    ])
    got = {(r["customerid"], r["rank"], r["email"]) for r in
           sc.event_artist_top_streamer_alerts(events, streams, emails, k=2).collect()}
    assert got == {("c1", 1, "c1@x.io"), ("c2", 2, "c2@x.io")}
    assert all(r["eventid"] == "e1" for r in
               sc.event_artist_top_streamer_alerts(events, streams, emails).collect())


def test_event_alert_missing_email_is_null_not_dropped(spark):
    events = fx.df(spark, "event", [fx.event("e1", "a1", "v1", 10)])
    streams = fx.df(spark, "stream", [fx.stream("s1", "c1", "a1")])
    emails = fx.df(spark, "email", [])
    rows = sc.event_artist_top_streamer_alerts(events, streams, emails).collect()
    assert len(rows) == 1 and rows[0]["email"] is None


def test_popular_events_and_genre_bonus(spark):
    # e1 sold out, e2 within 10%, e3 comfortably available
    events = fx.df(spark, "event", [
        fx.event("e1", "a1", "v1", 5), fx.event("e2", "a1", "v1", 10),
        fx.event("e3", "a2", "v1", 10),
    ])
    tickets = fx.df(spark, "ticket",
        [fx.ticket(f"t1{i}", "c1", "e1") for i in range(5)]
        + [fx.ticket(f"t2{i}", "c1", "e2") for i in range(9)]
        + [fx.ticket(f"t3{i}", "c1", "e3") for i in range(3)],
    )
    assert {r["eventid"] for r in sc.popular_events(tickets, events).collect()} == {"e1", "e2"}
    artists = fx.df(spark, "artist", [
        fx.artist("a1", genre="Rock"), fx.artist("a2", genre="Jazz"),
    ])
    streams = fx.df(spark, "stream", [
        fx.stream("s1", "c1", "a1"), fx.stream("s2", "c2", "a2"),
    ])
    got = {(r["customerid"], r["eventid"]) for r in
           sc.suggested_popular_events_by_genre(streams, artists, events, tickets).collect()}
    # c1's genre (Rock) has popular events e1+e2; c2's Jazz e3 is not popular
    assert got == {("c1", "e1"), ("c1", "e2")}


def test_popular_event_zip_alerts(spark):
    events = fx.df(spark, "event", [fx.event("e1", "a1", "v1", 2)])
    addresses = fx.df(spark, "address", [
        fx.address("ad1", "c1", zip5="55111"), fx.address("ad2", "c2", zip5="55111"),
        fx.address("ad3", "c3", zip5="55999"),
    ])
    tickets = fx.df(spark, "ticket", [
        fx.ticket("t1", "c1", "e1"), fx.ticket("t2", "c1", "e1"),  # e1 sold out by c1
    ])
    got = {(r["customerid"], r["eventid"]) for r in
           sc.popular_event_zip_alerts(tickets, addresses, events).collect()}
    # both 55111 customers get the alert (incl. the buyer); 55999 silent
    assert got == {("c1", "e1"), ("c2", "e1")}


def test_events_occurred_total(spark):
    events = fx.df(spark, "event", [
        fx.event("e1", "a1", "v1", 10, eventdate="2024-01-01"),
        fx.event("e2", "a1", "v1", 10, eventdate="2024-06-01"),
        fx.event("e3", "a1", "v1", 10, eventdate="2025-01-01"),
    ])
    assert sc.events_occurred_total(events, "2024-07-01").collect()[0]["n_occurred"] == 2


def test_tickets_by_zip(spark):
    addresses = fx.df(spark, "address", [
        fx.address("ad1", "c1", zip5="55111"), fx.address("ad2", "c2", zip5="55222"),
    ])
    tickets = fx.df(spark, "ticket", [
        fx.ticket("t1", "c1", "e1"), fx.ticket("t2", "c1", "e2"),
        fx.ticket("t3", "c2", "e1"),
    ])
    got = {r["zip5"]: r["n_tickets"] for r in sc.tickets_by_zip(tickets, addresses).collect()}
    assert got == {"55111": 2, "55222": 1}
