"""Regression tests for the round-1 advisor findings (ADVICE.md):
pre-activation seeks at non-48k rates, checkpoint reserved-key clobbering,
BS.1770 channel weights, and the packer's hard treedef validation."""

import numpy as np
import pytest
import jax.numpy as jnp

from firewheel_tpu.core.node import BlockInfo, NodeActivationError
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import LoopRange, LoudnessMeterNode, SamplerNode
from firewheel_tpu.nodes.streaming_sampler import (
    CallbackStreamReader,
    StreamingSamplerNode,
)

F = 128


def _clip(frames=96000):
    t = np.arange(frames, dtype=np.float32)
    return SampleResource(
        np.stack([np.sin(0.01 * t), np.cos(0.01 * t)]).astype(np.float32),
        device=False,
    )


class TestPreActivationSeeks:
    """ADVICE #2: seeks/stops issued before activate() must convert
    seconds -> frames at the REAL stream rate, not the 48 kHz default
    (the reference converts processor-side: sampler.rs:446-453)."""

    def test_sampler_seek_before_activation_non48k(self):
        node = SamplerNode(100.0)
        node.set_sample(_clip())
        node.set_playhead(1.0)  # 1 second, BEFORE activation
        proc = node.activate(44100, F, 0, 2)
        assert int(proc.collect_params()["seek_pos"]) == 44100

    def test_sampler_stop_rewinds_to_loop_start_at_stream_rate(self):
        node = SamplerNode(100.0)
        node.set_sample(_clip())
        node.set_loop_range(LoopRange.range_secs(0.5, 1.5))
        node.stop()  # BEFORE activation
        proc = node.activate(44100, F, 0, 2)
        p = proc.collect_params()
        assert int(p["seek_pos"]) == int(round(0.5 * 44100))
        assert int(p["loop_start"]) == int(round(0.5 * 44100))
        assert int(p["loop_end"]) == int(round(1.5 * 44100))

    def test_streaming_sampler_seek_before_activation_non48k(self):
        data = np.zeros((1, 96000), np.float32)
        reader = CallbackStreamReader(
            lambda s, n: data[:, s : s + n], 1, data.shape[1], 44100
        )
        node = StreamingSamplerNode(reader)
        node.set_playhead(1.0)  # BEFORE activation
        proc = node.activate(44100, F, 0, 1)
        assert int(proc.collect_params()["seek_pos"]) == 44100


class TestCheckpointReservedKeys:
    """ADVICE #3: extra_meta must not clobber the keys restore_into
    validates against."""

    def test_reserved_key_rejected(self, tmp_path):
        from firewheel_tpu.checkpoint import save_checkpoint

        class FakeProc:
            sample_rate = 48000
            max_block_frames = F

            def state_dict(self):
                return {"n": np.zeros((2,), np.float32)}

        with pytest.raises(ValueError, match="reserved"):
            save_checkpoint(
                str(tmp_path / "ck"), FakeProc(), extra_meta={"sample_rate": 1}
            )

    def test_benign_extra_meta_roundtrips(self, tmp_path):
        from firewheel_tpu.checkpoint import load_checkpoint, save_checkpoint

        class FakeProc:
            sample_rate = 48000
            max_block_frames = F

            def state_dict(self):
                return {"n": np.zeros((2,), np.float32)}

        save_checkpoint(
            str(tmp_path / "ck"), FakeProc(), extra_meta={"frames_rendered": 7}
        )
        _, meta = load_checkpoint(
            str(tmp_path / "ck"), {"n": np.zeros((2,), np.float32)}
        )
        assert meta["frames_rendered"] == 7
        assert meta["sample_rate"] == 48000


class TestLoudnessChannelWeights:
    """ADVICE #4: BS.1770 surround weights (1.41) must be expressible."""

    SR = 48000

    def _measure(self, x, weights):
        node = LoudnessMeterNode(channel_weights=weights)
        proc = node.activate(self.SR, F, x.shape[0], 0)
        state = proc.init_state()
        for i in range(0, x.shape[-1], F):
            blk = jnp.asarray(x[:, i : i + F])
            _, state, _ = proc.kernel(
                {}, state, blk, jnp.zeros((x.shape[0],), bool),
                BlockInfo.make(stream_sample=i),
            )
        return LoudnessMeterNode.read(state)["momentary_lufs"]

    def test_surround_weight_shifts_lufs_by_definition(self):
        t = np.arange(self.SR, dtype=np.float64) / self.SR
        sine = 0.1 * np.sin(2 * np.pi * 997 * t)
        x = np.tile(sine, (2, 1)).astype(np.float32)
        flat = self._measure(x, None)
        weighted = self._measure(x, [1.0, 1.41])
        # BS.1770's G coefficients weight the mean-square (power) terms:
        # L = -0.691 + 10 log10(sum_i G_i z_i), so equal-signal channels
        # shift by 10 log10((1 + 1.41) / 2)
        expect = 10 * np.log10((1 + 1.41) / 2)
        assert abs((weighted - flat) - expect) < 1e-3

    def test_wrong_length_weights_raise(self):
        node = LoudnessMeterNode(channel_weights=[1.0, 1.0, 1.41])
        with pytest.raises(NodeActivationError, match="channel_weights"):
            node.activate(self.SR, F, 2, 0)

    def test_differently_weighted_meters_do_not_pool(self):
        a = LoudnessMeterNode(channel_weights=[1.0, 1.41]).activate(
            self.SR, F, 2, 0
        )
        b = LoudnessMeterNode().activate(self.SR, F, 2, 0)
        assert a.group_key() != b.group_key()
