from statefulstreamprocessor_ray.functions.streams import StreamSpec, derive_streams

__all__ = ["StreamSpec", "derive_streams"]
