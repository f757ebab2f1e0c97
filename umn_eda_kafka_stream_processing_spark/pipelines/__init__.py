from umn_eda_kafka_stream_processing_spark.pipelines.reference import (
    address_sort_and_stringify,
    artist_ticket_count,
    customer_stream_count,
    out_of_state_sales,
    purchase_event_ticket,
    target_customer_filter,
    top_customer_artists,
    top_selling_genre_by_venue,
    top_streaming_artist_by_state,
)

__all__ = [
    "address_sort_and_stringify",
    "artist_ticket_count",
    "customer_stream_count",
    "out_of_state_sales",
    "purchase_event_ticket",
    "target_customer_filter",
    "top_customer_artists",
    "top_selling_genre_by_venue",
    "top_streaming_artist_by_state",
]
