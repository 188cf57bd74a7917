from statefulstreamprocessor_ray.sources.transcripts import (
    read_transcripts,
    transcripts_from_events,
)

__all__ = ["read_transcripts", "transcripts_from_events"]
