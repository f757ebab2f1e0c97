"""SQL surface: the reference pipelines as ANSI SQL over entity views.

The reference has no query language — every query is a hand-built
topology (SURVEY.md §3). Spark gives a SQL frontend for free; this
module registers the 9 entity tables as temp views and exposes each
reference pipeline as a SQL string, so ``spark.sql(PIPELINE_SQL[n])``
and the DataFrame builders in pipelines/reference.py are two entry
points to the same logical plans (Catalyst compiles both to the same
physical shapes — tests assert result equivalence).

View naming: plural entity kinds (streams, tickets, ...). KTable
(latest-per-key) views use max_by over the event_seq envelope —
identical semantics to operators/core.py:latest_by_key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ENTITY_VIEWS = {
    "customer": "customers",
    "address": "addresses",
    "email": "emails",
    "phone": "phones",
    "artist": "artists",
    "event": "events_feed",   # "events" collides with the star-schema table name
    "venue": "venues",
    "stream": "streams",
    "ticket": "tickets",
}


def register_entity_views(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Register entity DataFrames (keyed by kind) as temp views."""
    for kind, df in tables.items():
        df.createOrReplaceTempView(ENTITY_VIEWS[kind])


PIPELINE_SQL: dict[str, str] = {
    # reference: exercises/stateful/CustomerStreamCount.java:14-16
    "CustomerStreamCount": """
        SELECT customerid, count(*) AS count
        FROM streams GROUP BY customerid
    """,
    # reference: exercises/stateful/ArtistTicketCount.java:9-11
    "ArtistTicketCount": """
        SELECT e.artistid, count(*) AS count
        FROM tickets t
        JOIN (SELECT id AS eventid, max_by(artistid, event_seq) AS artistid
              FROM events_feed GROUP BY id) e USING (eventid)
        GROUP BY e.artistid
    """,
    # reference: exercises/stateless/TargetCustomerFilter.java:13-15
    "TargetCustomerFilter": """
        SELECT * FROM customers
        WHERE CAST(substring(birthdt, 1, 4) AS INT) BETWEEN 1990 AND 1999
    """,
    # reference: exercises/stateless/AddressSortAndStringify.java:15-20
    "AddressSortAndStringify": """
        SELECT state AS key,
               concat(line1, ', ', line2, ', ', citynm, ', ', state, ' ',
                      zip5, '-', zip4, ' ', countrycd) AS value
        FROM addresses
    """,
    # reference: samples/TopCustomerArtists.java:58-90
    "TopCustomerArtists": """
        SELECT * FROM (
          SELECT customerid, artistid, count,
                 row_number() OVER (PARTITION BY customerid
                                    ORDER BY count DESC, artistid ASC) AS rank
          FROM (SELECT customerid, artistid, count(*) AS count
                FROM streams GROUP BY customerid, artistid)
        ) WHERE rank <= 3
    """,
    # reference: phase3/TopStreamingArtistByState.java:100-238
    "TopStreamingArtistByState": """
        SELECT concat(artistid, '-', state) AS key,
               artistid, artistname, state, count(*) AS count
        FROM (
          SELECT s.artistid, a.artistname, ad.state
          FROM streams s
          JOIN (SELECT id AS artistid, max_by(name, event_seq) AS artistname
                FROM artists GROUP BY id) a USING (artistid)
          JOIN (SELECT DISTINCT id AS customerid FROM customers) c USING (customerid)
          JOIN (SELECT customerid, max_by(state, event_seq) AS state
                FROM addresses GROUP BY customerid) ad USING (customerid)
        )
        GROUP BY artistid, artistname, state
    """,
    # reference: phase3/OutOfStateSales.java:76-161
    "OutOfStateSales": """
        SELECT venueid, venuename, count(*) AS count
        FROM (
          SELECT v.venueid, v.venuename, v.venue_state, ca.customer_state
          FROM tickets t
          JOIN (SELECT customerid, max_by(state, event_seq) AS customer_state
                FROM addresses GROUP BY customerid) ca USING (customerid)
          JOIN (SELECT id AS eventid, max_by(venueid, event_seq) AS venueid
                FROM events_feed GROUP BY id) e USING (eventid)
          JOIN (SELECT vv.venueid, vv.venuename, va.state AS venue_state
                FROM (SELECT id AS venueid, max_by(name, event_seq) AS venuename,
                             max_by(addressid, event_seq) AS addressid
                      FROM venues GROUP BY id) vv
                JOIN (SELECT id AS addressid, max_by(state, event_seq) AS state
                      FROM addresses GROUP BY id) va USING (addressid)) v
            USING (venueid)
        )
        WHERE venue_state != customer_state
        GROUP BY venueid, venuename
    """,
    # reference: phase3/TopSellingGenreByVenue.java:60-177
    "TopSellingGenreByVenue": """
        SELECT * FROM (
          SELECT venueid, genre, count,
                 row_number() OVER (PARTITION BY venueid
                                    ORDER BY count DESC, genre ASC) AS rank
          FROM (
            SELECT e.venueid, a.genre, count(*) AS count
            FROM tickets t
            JOIN (SELECT id AS eventid, max_by(artistid, event_seq) AS artistid,
                         max_by(venueid, event_seq) AS venueid
                  FROM events_feed GROUP BY id) e USING (eventid)
            JOIN (SELECT id AS artistid, max_by(genre, event_seq) AS genre
                  FROM artists GROUP BY id) a USING (artistid)
            GROUP BY e.venueid, a.genre)
        ) WHERE rank <= 3
    """,
    # reference: samples/PurchaseEventTicket.java:42-158
    "PurchaseEventTicket": """
        SELECT eventid, ticketid, customerid,
               IF(remaining_tickets < 0, 'REJECTED', 'CONFIRMED') AS confirmation_status,
               CASE WHEN remaining_tickets < 0 THEN 'sold-out'
                    WHEN greatest(remaining_tickets, 0.0) / capacity * 100.0 <= 20.0
                         THEN 'limited'
                    ELSE 'available' END AS branch,
               remaining_tickets, total_requested
        FROM (
          SELECT t.eventid, t.id AS ticketid, t.customerid, e.capacity,
                 CAST(row_number() OVER (PARTITION BY t.eventid
                                         ORDER BY t.event_seq) AS DOUBLE)
                     AS total_requested,
                 CAST(e.capacity AS DOUBLE)
                   - CAST(row_number() OVER (PARTITION BY t.eventid
                                             ORDER BY t.event_seq) AS DOUBLE)
                     AS remaining_tickets
          FROM tickets t
          JOIN (SELECT id AS eventid, max_by(capacity, event_seq) AS capacity
                FROM events_feed GROUP BY id) e USING (eventid)
        )
    """,
}
