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
