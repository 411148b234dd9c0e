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

import os as _os

# Backend override: FIREWHEEL_TPU_PLATFORM=cpu forces the CPU backend even
# when an accelerator plugin (e.g. the axon TPU tunnel, which ignores
# JAX_PLATFORMS) is present.  Must run before first backend use.
if _os.environ.get("FIREWHEEL_TPU_PLATFORM"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_platforms", _os.environ["FIREWHEEL_TPU_PLATFORM"]
        )
    except Exception:
        pass

# Persistent XLA compilation cache (opt-in): live graph edits
# retrace/recompile, so caching every schedule shape across processes can
# help long-lived deployments.  Opt in with FIREWHEEL_TPU_CACHE_DIR=<path>.
# (Not enabled by default: XLA:CPU AOT artifacts are machine-feature
# sensitive, and the axon TPU tunnel compiles server-side where the cache
# never populates.)
# Canonicalize HLO source-location metadata (strip directory prefixes):
# compile-cache keys then depend on the code, not the checkout path — the
# standard practice for stable caches across deploys (and it sidesteps
# cache entries poisoned under other keys on shared compile services).
try:
    import jax as _jax

    _jax.config.update("jax_hlo_source_file_canonicalization_regex", ".*/")
except Exception:
    pass

if _os.environ.get("FIREWHEEL_TPU_CACHE_DIR"):
    try:
        import jax as _jax

        _cache_dir = _os.environ["FIREWHEEL_TPU_CACHE_DIR"]
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from .core import (
    AudioNode,
    AutomationCurve,
    FlacStreamReader,
    decode_flac,
    Keyframe,
    ParamAutomator,
    as_stream_reader,
    load_audio,
    open_stream_reader,
    register_format,
    register_stream_reader,
    supported_formats,
    supported_stream_formats,
    AudioNodeInfo,
    BlockInfo,
    NodeEvent,
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
    load_graph,
    save_graph,
)
from .executor import ScheduleProgram, node_key
from .context import GraphContext, UpdateResult, UpdateStatus
from .processor import GraphProcessor, ProcessorStatus
from .backend import (
    ArraySink,
    DeviceInfo,
    FirewheelCtx,
    OutputStream,
    RingBuffer,
    StreamConfig,
    WavSink,
    available_output_devices,
)
from .utils.flac_encode import encode_flac
from .utils.opus import OpusSink
from .voice_pool import VoiceHandle, VoicePool
from .music import MusicPlayer
from .serving import SessionHandle, SessionServer
from .scene3d import AudioListener, SpatialScene
from . import nodes, utils

__version__ = "0.1.0"

__all__ = [
    "AudioNode",
    "NodeEvent",
    "MusicPlayer",
    "SessionServer",
    "SessionHandle",
    "AudioListener",
    "SpatialScene",
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
    "AutomationCurve",
    "Keyframe",
    "ParamAutomator",
    "FlacStreamReader",
    "decode_flac",
    "encode_flac",
    "as_stream_reader",
    "load_audio",
    "open_stream_reader",
    "register_stream_reader",
    "supported_stream_formats",
    "register_format",
    "supported_formats",
    "AudioGraph",
    "save_graph",
    "load_graph",
    "AudioGraphConfig",
    "CompiledSchedule",
    "Edge",
    "EdgeID",
    "NodeID",
    "SchedulePackage",
    "ScheduleProgram",
    "node_key",
    "GraphContext",
    "UpdateResult",
    "UpdateStatus",
    "GraphProcessor",
    "ProcessorStatus",
    "VoiceHandle",
    "VoicePool",
    "ArraySink",
    "DeviceInfo",
    "FirewheelCtx",
    "OutputStream",
    "RingBuffer",
    "StreamConfig",
    "WavSink",
    "OpusSink",
    "available_output_devices",
    "nodes",
    "utils",
]
