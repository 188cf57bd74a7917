from statefulstreamprocessor_ray.state.stream_buffer import OrderedJoinState

__all__ = ["OrderedJoinState"]
