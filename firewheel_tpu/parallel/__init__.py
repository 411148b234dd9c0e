"""firewheel_tpu.parallel — multi-instance batching and multi-chip sharding."""

from .mesh import BatchRenderer, VoiceParallelMixer, make_mesh

__all__ = ["BatchRenderer", "VoiceParallelMixer", "make_mesh"]
