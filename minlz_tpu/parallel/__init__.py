"""Multi-chip / multi-host scaling for TPU-MinLZ."""

from .mesh import make_mesh, sharded_decode_parse, sharded_pipeline_step

__all__ = ["make_mesh", "sharded_decode_parse", "sharded_pipeline_step"]
