"""firewheel_tpu.graph — the DAG model and its compiler
(the ``firewheel-graph`` analog)."""

from .arena import Arena, Index
from .compiler import (
    CompiledSchedule,
    Edge,
    EdgeID,
    InBufferAssignment,
    NodeEntry,
    NodeID,
    OutBufferAssignment,
    ScheduledNode,
    compile_graph,
    cycle_detected,
)
from .errors import (
    AddEdgeError,
    CompileCycleDetected,
    CompileGraphError,
    CycleDetected,
    DstNodeNotFound,
    EdgeAlreadyExists,
    InPortOutOfRange,
    InputPortAlreadyConnected,
    ManyToOneError,
    MessageChannelFull,
    NodeActivationFailed,
    OutPortOutOfRange,
    SrcNodeNotFound,
)
from .graph import AudioGraph, AudioGraphConfig, NodeWeight, SchedulePackage

__all__ = [
    "Arena",
    "Index",
    "CompiledSchedule",
    "Edge",
    "EdgeID",
    "InBufferAssignment",
    "NodeEntry",
    "NodeID",
    "OutBufferAssignment",
    "ScheduledNode",
    "compile_graph",
    "cycle_detected",
    "AddEdgeError",
    "CompileCycleDetected",
    "CompileGraphError",
    "CycleDetected",
    "DstNodeNotFound",
    "EdgeAlreadyExists",
    "InPortOutOfRange",
    "InputPortAlreadyConnected",
    "ManyToOneError",
    "MessageChannelFull",
    "NodeActivationFailed",
    "OutPortOutOfRange",
    "SrcNodeNotFound",
    "AudioGraph",
    "AudioGraphConfig",
    "NodeWeight",
    "SchedulePackage",
]

from .serialize import SCENE_VERSION, load_graph, save_graph  # noqa: E402

__all__ += ["SCENE_VERSION", "load_graph", "save_graph"]

from .latency import (  # noqa: E402
    LatencyInsertion,
    LatencyReport,
    compensate_latency,
    output_latency_frames,
    path_latencies,
)

__all__ += [
    "LatencyInsertion",
    "LatencyReport",
    "compensate_latency",
    "output_latency_frames",
    "path_latencies",
]
