from statefulstreamprocessor_ray.pipelines.flagship import flagship_join

__all__ = ["flagship_join"]
