from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

__all__ = ["ExactlyOnceParquetSink"]
