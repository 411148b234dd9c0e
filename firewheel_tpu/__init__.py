"""firewheel_tpu — a TPU-native real-time audio graph engine.

A ground-up rebuild of the capabilities of BillyDM/firewheel (a Rust audio
engine for games) designed for TPU hardware: the user-mutable audio DAG is
compiled into a topological schedule (``graph/compiler.py``) that lowers to a
single fused XLA computation (``executor.py``); node DSP runs as vectorized
kernels over ``[channels, frames]`` buffers with recurrent state carried
through ``lax.scan``; many independent graph instances batch via ``vmap`` and
shard across chips via ``jax.sharding``.

This module mirrors the reference's umbrella crate (``src/lib.rs:1-8``).
"""

from .core import (
    AudioNode,
    AudioNodeInfo,
    BlockInfo,
    NodeActivationError,
    NodeProcessor,
    ParamSmoother,
    SampleResource,
    SilenceMask,
    SmootherConfig,
    StreamStatus,
    db_to_gain,
    db_to_gain_clamped_neg_100_db,
    gain_to_db,
    gain_to_db_clamped_neg_100_db,
    percent_volume_to_raw_gain,
)
from .graph import (
    AudioGraph,
    AudioGraphConfig,
    CompiledSchedule,
    Edge,
    EdgeID,
    NodeID,
    SchedulePackage,
)
from .executor import ScheduleProgram, node_key
from . import nodes

__version__ = "0.1.0"

__all__ = [
    "AudioNode",
    "AudioNodeInfo",
    "BlockInfo",
    "NodeActivationError",
    "NodeProcessor",
    "ParamSmoother",
    "SampleResource",
    "SilenceMask",
    "SmootherConfig",
    "StreamStatus",
    "db_to_gain",
    "db_to_gain_clamped_neg_100_db",
    "gain_to_db",
    "gain_to_db_clamped_neg_100_db",
    "percent_volume_to_raw_gain",
    "AudioGraph",
    "AudioGraphConfig",
    "CompiledSchedule",
    "Edge",
    "EdgeID",
    "NodeID",
    "SchedulePackage",
    "ScheduleProgram",
    "node_key",
    "nodes",
]
