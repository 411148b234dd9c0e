"""Built-in node library (the ``basic_nodes`` analog, plus TPU-era DSP).

Reference inventory: ``crates/firewheel-graph/src/basic_nodes/mod.rs``.
"""

from .dummy import DummyAudioNode, DummyProcessor
from .beep_test import BeepTestNode
from .volume import VolumeNode
from .sum import SumNode
from .hard_clip import HardClipNode
from .channel import MonoToStereoNode, StereoToMonoNode
from .granular import GranularSamplerNode
from .sampler import LoopRange, SamplerNode
from .pan import StereoPanNode
from .pitch_shift import PitchShiftNode
from .stereo_width import StereoWidthNode
from .filter import FilterNode, FilterType
from .fir import FirFilterNode, design_windowed_sinc
from .delay import DelayCompNode, EchoNode
from .reverb import ConvolutionReverbNode
from .spatial import Spatializer3DNode
from .binaural import BinauralSpatializerNode
from .meter import DbMeterNode
from .streaming_sampler import CallbackStreamReader, StreamingSamplerNode
from .dynamics import CompressorNode, DuckerNode, GateNode, LimiterNode
from .generators import LFONode, LFOShape, NoiseNode
from .loudness import IntegratedLoudness, LoudnessMeterNode
from .waveshaper import WaveshaperNode
from .eq import EQBand, ParametricEQNode
from .mod_effects import ModDelayNode, TremoloNode

__all__ = [
    "GranularSamplerNode",
    "LoopRange",
    "SamplerNode",
    "StereoPanNode",
    "PitchShiftNode",
    "StereoWidthNode",
    "FilterNode",
    "FilterType",
    "FirFilterNode",
    "design_windowed_sinc",
    "DelayCompNode",
    "EchoNode",
    "ConvolutionReverbNode",
    "Spatializer3DNode",
    "BinauralSpatializerNode",
    "DbMeterNode",
    "CallbackStreamReader",
    "StreamingSamplerNode",
    "CompressorNode",
    "DuckerNode",
    "GateNode",
    "LimiterNode",
    "LoudnessMeterNode",
    "IntegratedLoudness",
    "NoiseNode",
    "LFONode",
    "LFOShape",
    "WaveshaperNode",
    "EQBand",
    "ParametricEQNode",
    "ModDelayNode",
    "TremoloNode",
    "DummyAudioNode",
    "DummyProcessor",
    "BeepTestNode",
    "VolumeNode",
    "SumNode",
    "HardClipNode",
    "MonoToStereoNode",
    "StereoToMonoNode",
]
