from .annotate_stream import annotate_stream, windowed_event_counts  # noqa: F401
