"""Named topology registry: the reference's runnable programs.

Each entry mirrors one reference ``main()`` — its input topics, its
output topic(s) (the ``kafka-workshop-`` prefix rule,
reference: readme.md:115-118, StreamTemplate.java:15-16), and the
engine pipeline that computes it. A user of the reference switches by
running the same-named topology here:

* batch:     ``run_batch(spark, name, tables)`` — tables from any
  source (parquet snapshots, ``read_topic`` Kafka batch reads).
* streaming: wire ``sources/kafka.py:stream_topic`` per input topic,
  apply the same pipeline (plain counts run natively in update mode;
  the stateful twins live in streaming/stateful.py), sink with
  ``write_stream_topic``.

Topology names follow the reference class names.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame

from umn_eda_kafka_stream_processing_spark.pipelines import reference as ref

# reference: Streams.java:30-55
INPUT_TOPICS = {
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


@dataclass(frozen=True)
class Topology:
    name: str                 # reference class name
    inputs: tuple[str, ...]   # entity kinds consumed (INPUT_TOPICS keys)
    outputs: tuple[str, ...]  # kafka-workshop-* sink topics (reference order)
    build: Callable[..., DataFrame | tuple[DataFrame, ...]]
    doc: str


TOPOLOGIES: dict[str, Topology] = {}


def _topology(name, inputs, outputs, doc):
    def wrap(fn):
        TOPOLOGIES[name] = Topology(name, inputs, outputs, fn, doc)
        return fn
    return wrap


@_topology(
    "CustomerStreamCount", ("stream",),
    ("kafka-workshop-customer-stream-count",),  # CustomerStreamCount.java:20
    "Count of listen-events per customer.",
)
def _customer_stream_count(stream: DataFrame) -> DataFrame:
    return ref.customer_stream_count(stream)


@_topology(
    "ArtistTicketCount", ("ticket", "event"),
    ("kafka-workshop-artist-ticket-count",),  # ArtistTicketCount.java:15
    "Tickets sold per artist via the events table.",
)
def _artist_ticket_count(ticket: DataFrame, event: DataFrame) -> DataFrame:
    return ref.artist_ticket_count(ticket, event)


@_topology(
    "TargetCustomerFilter", ("customer",),
    ("kafka-workshop-target-customers",),  # TargetCustomerFilter.java:25
    "Merge legacy+current customers, keep the 1990-1999 birth decade.",
)
def _target_customer_filter(customer: DataFrame) -> DataFrame:
    return ref.target_customer_filter(customer)


@_topology(
    "AddressSortAndStringify", ("address",),
    # MN branch first, then default (AddressSortAndStringify.java:25-26)
    ("kafka-workshop-priority-addresses", "kafka-workshop-addresses-by-state"),
    "Stringify addresses keyed by state; MN branch split out.",
)
def _address_sort_and_stringify(address: DataFrame) -> tuple[DataFrame, DataFrame]:
    return ref.address_sort_and_stringify(address)


@_topology(
    "TopCustomerArtists", ("stream",),
    ("kafka-workshop-top-10-stream-count",),  # TopCustomerArtists.java:30
    "Top-3 streamed artists per customer.",
)
def _top_customer_artists(stream: DataFrame) -> DataFrame:
    return ref.top_customer_artists(stream)


@_topology(
    "PurchaseEventTicket", ("ticket", "event"),
    ("kafka-workshop-ticket-response",),  # PurchaseEventTicket.java:24
    "Ticket confirmations vs event capacity with 3-way branch.",
)
def _purchase_event_ticket(ticket: DataFrame, event: DataFrame) -> DataFrame:
    return ref.purchase_event_ticket(ticket, event)


@_topology(
    "TopStreamingArtistByState", ("stream", "artist", "customer", "address"),
    ("kafka-workshop-top-streaming-artist-by-state",),  # TopStreamingArtistByState.java:54
    "Stream counts per (artist, customer-state).",
)
def _top_streaming_artist_by_state(
    stream: DataFrame, artist: DataFrame, customer: DataFrame, address: DataFrame
) -> DataFrame:
    return ref.top_streaming_artist_by_state(stream, artist, customer, address)


@_topology(
    "OutOfStateSales", ("ticket", "event", "venue", "address"),
    ("kafka-workshop-out-of-state-sales-ratio",),  # OutOfStateSales.java:46
    "Per-venue out-of-state ticket sale counts.",
)
def _out_of_state_sales(
    ticket: DataFrame, event: DataFrame, venue: DataFrame, address: DataFrame
) -> DataFrame:
    return ref.out_of_state_sales(ticket, event, venue, address)


@_topology(
    "TopSellingGenreByVenue", ("ticket", "event", "artist"),
    ("kafka-workshop-top-selling-genre-by-venue",),  # TopSellingGenreByVenue.java:38
    "Top-3 ticket-selling genres per venue.",
)
def _top_selling_genre_by_venue(
    ticket: DataFrame, event: DataFrame, artist: DataFrame
) -> DataFrame:
    return ref.top_selling_genre_by_venue(ticket, event, artist)


def run_batch(
    name: str, tables: dict[str, DataFrame]
) -> DataFrame | tuple[DataFrame, ...]:
    """Run a named topology over entity DataFrames (keyed by entity
    kind, e.g. {'stream': df, ...}); returns its output DataFrame(s)
    in sink-topic order."""
    topo = TOPOLOGIES[name]
    return topo.build(*[tables[k] for k in topo.inputs])


def run_stream(
    name: str,
    streams: dict[str, DataFrame],
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame | tuple[DataFrame, ...]:
    """Run a named topology in Structured Streaming mode.

    ``streams``: streaming DataFrames for the topology's fact
    entities (from stream_topic / file_stream_source). ``dims``:
    static snapshot DataFrames for the entities the reference
    materializes as KTables — the stream-static join model (the
    faithful equivalent: reference tests always pipe dims before
    facts, SURVEY.md §2.3). Stateless topologies and plain counts
    reuse the batch plans directly (update output mode); the
    window-based constructs (top-k, running capacity) switch to their
    applyInPandasWithState twins from streaming/stateful.py, because
    relational window functions aren't defined on unbounded input.

    Sink the result with streaming/runner.py (update mode) against
    TOPOLOGIES[name].outputs.
    """
    from pyspark.sql import functions as F

    from umn_eda_kafka_stream_processing_spark.operators.core import latest_by_key
    from umn_eda_kafka_stream_processing_spark.pipelines import reference as r
    from umn_eda_kafka_stream_processing_spark.streaming.stateful import (
        event_status_stream,
        topk_counter_stream,
    )

    dims = dims or {}

    if name == "CustomerStreamCount":
        return r.customer_stream_count(streams["stream"])
    if name == "ArtistTicketCount":
        return r.artist_ticket_count(streams["ticket"], dims["event"])
    if name == "TargetCustomerFilter":
        return r.target_customer_filter(streams["customer"])
    if name == "AddressSortAndStringify":
        return r.address_sort_and_stringify(streams["address"])
    if name == "TopStreamingArtistByState":
        return r.top_streaming_artist_by_state(
            streams["stream"], dims["artist"], dims["customer"], dims["address"]
        )
    if name == "OutOfStateSales":
        return r.out_of_state_sales(
            streams["ticket"], dims["event"], dims["venue"], dims["address"]
        )
    if name == "TopCustomerArtists":
        return topk_counter_stream(
            streams["stream"], "customerid", "artistid", k=3
        )
    if name == "PurchaseEventTicket":
        events_tbl = latest_by_key(dims["event"], "id").select(
            F.col("id").alias("eventid"), "capacity"
        )
        joined = streams["ticket"].select(
            F.col("id").alias("ticketid"), "customerid", "eventid", "event_seq"
        ).join(F.broadcast(events_tbl), "eventid", "inner")
        return event_status_stream(joined)
    if name == "TopSellingGenreByVenue":
        artists_tbl = latest_by_key(dims["artist"], "id").select(
            F.col("id").alias("artistid"), "genre"
        )
        event_artist = (
            latest_by_key(dims["event"], "id")
            .select(F.col("id").alias("eventid"), "artistid", "venueid")
            .join(F.broadcast(artists_tbl), "artistid", "inner")
        )
        enriched = streams["ticket"].select("eventid", "event_seq").join(
            F.broadcast(event_artist), "eventid", "inner"
        )
        return topk_counter_stream(enriched, "venueid", "genre", k=3)
    raise KeyError(f"unknown topology {name!r}")
