from .ingest import (  # noqa: F401
    dedup_pages_stream,
    mention_rates_stream,
    mentions_stream,
    read_pages_stream,
    start_mentions_sink,
)
from .stateful import domain_mention_state_stream  # noqa: F401
from .ingest import triples_stream  # noqa: F401
