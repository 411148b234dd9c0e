"""Built-in node library (the ``basic_nodes`` analog, plus TPU-era DSP).

Reference inventory: ``crates/firewheel-graph/src/basic_nodes/mod.rs``.
"""

from .dummy import DummyAudioNode, DummyProcessor
from .beep_test import BeepTestNode
from .volume import VolumeNode
from .sum import SumNode
from .hard_clip import HardClipNode
from .channel import MonoToStereoNode, StereoToMonoNode
from .sampler import LoopRange, SamplerNode

__all__ = [
    "LoopRange",
    "SamplerNode",
    "DummyAudioNode",
    "DummyProcessor",
    "BeepTestNode",
    "VolumeNode",
    "SumNode",
    "HardClipNode",
    "MonoToStereoNode",
    "StereoToMonoNode",
]
