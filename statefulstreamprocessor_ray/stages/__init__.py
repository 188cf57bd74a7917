from statefulstreamprocessor_ray.stages.join import ordered_join, replay_join_table

__all__ = ["ordered_join", "replay_join_table"]
