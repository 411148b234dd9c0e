"""Dynamics nodes: bus compressor and lookahead brickwall limiter.

Beyond the reference's shipped code but inside its design scope — the
DESIGN_DOC's effect-node family (``DESIGN_DOC.md:11-28``); a master-bus
limiter is table stakes for a game mixer.  Both are channel-linked (one
gain applied to all channels, computed from the loudest), the behavior
players expect from a stereo bus.

Kernels follow the engine contract (core/node.py): params staged per
dispatch, recurrent state (envelopes, delay lines) as explicit pytrees.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)
from ..core.units import db_to_gain, gain_to_db
from ..ops.dynamics import (
    compressor_gain_db,
    envelope_follow,
    sample_scan,
    sliding_max,
)

__all__ = [
    "CompressorNode",
    "CompressorProcessor",
    "DuckerNode",
    "DuckerProcessor",
    "GateNode",
    "GateProcessor",
    "LimiterNode",
    "LimiterProcessor",
]


def _coef(time_secs: float, sample_rate: int) -> float:
    """One-pole smoothing coefficient for a time constant in seconds."""
    if time_secs <= 0.0:
        return 0.0
    return float(np.exp(-1.0 / (time_secs * sample_rate)))


class CompressorProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node

    def group_key(self):
        return ()  # all variation rides in params

    def init_state(self):
        return {"env": jnp.zeros((), jnp.float32)}

    def collect_params(self):
        n = self._node
        return {
            "threshold_db": np.float32(n._threshold_db),
            "ratio": np.float32(max(n._ratio, 1.0)),
            "knee_db": np.float32(max(n._knee_db, 0.0)),
            "makeup": np.float32(db_to_gain(np.float32(n._makeup_db))),
            "att_b": np.float32(_coef(n._attack_secs, self.sample_rate)),
            "rel_b": np.float32(_coef(n._release_secs, self.sample_rate)),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        # channel-linked peak detector: loudest channel drives the gain
        level = jnp.max(jnp.abs(inputs), axis=0)  # [F]
        env, env_last = envelope_follow(
            level, state["env"], params["att_b"], params["rel_b"]
        )
        level_db = gain_to_db(env)  # clamps at the engine's -100 dB floor
        gain_db = compressor_gain_db(
            level_db, params["threshold_db"], params["ratio"], params["knee_db"]
        )
        gain = db_to_gain(gain_db) * params["makeup"]
        y = inputs * gain[None, :]
        out_mask = in_mask  # gain never unsilences a silent input
        y = gate(y, out_mask)
        return y, {"env": env_last}, out_mask


class CompressorNode(AudioNode):
    """Channel-linked soft-knee downward compressor.

    The detector is a peak envelope follower (attack/release one-pole); the
    gain computer is the standard dB-domain soft knee; ``makeup_db`` is
    applied post-gain.
    """

    debug_name = "compressor"

    def __init__(
        self,
        threshold_db: float = -24.0,
        ratio: float = 4.0,
        attack_secs: float = 0.01,
        release_secs: float = 0.1,
        makeup_db: float = 0.0,
        knee_db: float = 6.0,
    ):
        self._threshold_db = float(threshold_db)
        self._ratio = float(ratio)
        self._attack_secs = float(attack_secs)
        self._release_secs = float(release_secs)
        self._makeup_db = float(makeup_db)
        self._knee_db = float(knee_db)

    def set_threshold_db(self, v: float):
        self._threshold_db = float(v)

    def set_ratio(self, v: float):
        self._ratio = float(v)

    def set_attack_secs(self, v: float):
        self._attack_secs = float(v)

    def set_release_secs(self, v: float):
        self._release_secs = float(v)

    def set_makeup_db(self, v: float):
        self._makeup_db = float(v)

    def set_knee_db(self, v: float):
        self._knee_db = float(v)

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(1, MAX_PORTS, 1, MAX_PORTS)

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != num_outputs:
            raise NodeActivationError(
                "CompressorNode requires num_inputs == num_outputs; got "
                f"{num_inputs} in, {num_outputs} out"
            )
        return CompressorProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class LimiterProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self.lookahead = max(1, int(round(node._lookahead_secs * sample_rate)))

    def group_key(self):
        return (self.lookahead,)  # state shapes depend on the lookahead

    def init_state(self):
        la = self.lookahead
        return {
            # delayed dry signal (the lookahead latency line)
            "delay": jnp.zeros((self.num_inputs, la), jnp.float32),
            # |x| tail so the sliding window spans block boundaries
            "level_tail": jnp.zeros((la,), jnp.float32),
            # smoothed gain; starts at unity (0 would fade the stream in)
            "env": jnp.ones((), jnp.float32),
        }

    def collect_params(self):
        n = self._node
        return {
            "ceiling": np.float32(db_to_gain(np.float32(n._ceiling_db))),
            "rel_b": np.float32(_coef(n._release_secs, self.sample_rate)),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        la = self.lookahead
        frames = inputs.shape[-1]

        # future maximum over the lookahead window, per output sample of the
        # DELAYED stream: delayed[t] pairs with max(|x|[t .. t+la])
        level = jnp.max(jnp.abs(inputs), axis=0)  # [F]
        level_seq = jnp.concatenate([state["level_tail"], level])  # [la+F]
        peak = sliding_max(level_seq, la + 1)  # [F]

        # required gain to keep the peak at/below the ceiling; attack is
        # instantaneous (the window already looked ahead), release smooths
        # recovery upward
        need = jnp.minimum(1.0, params["ceiling"] / jnp.maximum(peak, 1e-9))

        def step(env, g):
            env = jnp.minimum(g, params["rel_b"] * env + (1.0 - params["rel_b"]) * g)
            return env, env

        env_last, gain = sample_scan(step, state["env"], need)

        delayed = jnp.concatenate([state["delay"], inputs], axis=-1)
        y = delayed[:, :frames] * gain[None, :]

        out_mask = in_mask & jnp.all(state["delay"] == 0.0, axis=-1)
        y = gate(y, out_mask)
        return (
            y,
            {
                "delay": delayed[:, frames:],
                "level_tail": level_seq[frames:],
                "env": env_last,
            },
            out_mask,
        )


class LimiterNode(AudioNode):
    """Lookahead brickwall limiter (channel-linked).

    Introduces ``lookahead_secs`` of latency on its path — compensate
    parallel dry paths with :class:`DelayCompNode`.  Attack is instantaneous
    via the lookahead window; release recovers with a one-pole.
    """

    debug_name = "limiter"

    def __init__(
        self,
        ceiling_db: float = -1.0,
        lookahead_secs: float = 0.005,
        release_secs: float = 0.05,
    ):
        self._ceiling_db = float(ceiling_db)
        self._lookahead_secs = max(float(lookahead_secs), 0.0)
        self._release_secs = float(release_secs)

    def set_ceiling_db(self, v: float):
        self._ceiling_db = float(v)

    def set_release_secs(self, v: float):
        self._release_secs = float(v)

    def latency_frames(self, sample_rate: int) -> int:
        return max(1, int(round(self._lookahead_secs * sample_rate)))

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(1, MAX_PORTS, 1, MAX_PORTS)

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != num_outputs:
            raise NodeActivationError(
                "LimiterNode requires num_inputs == num_outputs; got "
                f"{num_inputs} in, {num_outputs} out"
            )
        return LimiterProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class GateProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node

    def group_key(self):
        return ()  # all variation rides in params

    def init_state(self):
        return {
            # hysteresis latch: 1.0 while the gate is open
            "open": jnp.zeros((), jnp.float32),
            # hold countdown in samples (float — integer arithmetic inside
            # scan bodies pessimizes the TPU loop, see CLAUDE.md)
            "hold": jnp.zeros((), jnp.float32),
            # smoothed gain; starts fully closed
            "gain": jnp.zeros((), jnp.float32),
        }

    def collect_params(self):
        n = self._node
        close_db = n._threshold_db - max(n._hysteresis_db, 0.0)
        return {
            "open_lin": np.float32(db_to_gain(np.float32(n._threshold_db))),
            "close_lin": np.float32(db_to_gain(np.float32(close_db))),
            "floor": np.float32(db_to_gain(np.float32(min(n._range_db, 0.0)))),
            "att_b": np.float32(_coef(n._attack_secs, self.sample_rate)),
            "rel_b": np.float32(_coef(n._release_secs, self.sample_rate)),
            "hold_n": np.float32(max(n._hold_secs, 0.0) * self.sample_rate),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        # channel-linked instantaneous detector: loudest channel drives the
        # latch; hysteresis + hold prevent chatter at the threshold
        level = jnp.max(jnp.abs(inputs), axis=0)  # [F]

        def step(carry, lvl):
            opn, hold, g = carry
            above = lvl >= params["open_lin"]
            below = lvl < params["close_lin"]
            expired = hold <= 0.0
            opn = jnp.where(above, 1.0, jnp.where(below & expired, 0.0, opn))
            hold = jnp.where(
                above, params["hold_n"], jnp.maximum(hold - 1.0, 0.0)
            )
            target = opn + (1.0 - opn) * params["floor"]
            b = jnp.where(target > g, params["att_b"], params["rel_b"])
            g = b * g + (1.0 - b) * target
            return (opn, hold, g), g

        (opn, hold, g_last), gains = sample_scan(
            step, (state["open"], state["hold"], state["gain"]), level
        )
        y = inputs * gains[None, :]
        out_mask = in_mask  # gain never unsilences a silent input
        y = gate(y, out_mask)
        return y, {"open": opn, "hold": hold, "gain": g_last}, out_mask


class GateNode(AudioNode):
    """Noise gate (channel-linked, hysteresis + hold).

    Opens when the loudest channel's instantaneous level crosses
    ``threshold_db``; closes — attenuating by ``range_db`` — only after the
    level has stayed below ``threshold_db - hysteresis_db`` for
    ``hold_secs``.  The gain ramps open over ``attack_secs`` and closed over
    ``release_secs`` (one-pole each), so the gate never clicks.

    Beyond the reference's shipped nodes but inside its effect-node design
    scope (``DESIGN_DOC.md:11-28``) — the standard companion to the bus
    compressor for keying out room noise / bleed on voice chat and SFX
    stems.
    """

    debug_name = "gate"

    def __init__(
        self,
        threshold_db: float = -50.0,
        range_db: float = -80.0,
        attack_secs: float = 0.001,
        release_secs: float = 0.1,
        hold_secs: float = 0.05,
        hysteresis_db: float = 6.0,
    ):
        self._threshold_db = float(threshold_db)
        self._range_db = min(float(range_db), 0.0)
        self._attack_secs = float(attack_secs)
        self._release_secs = float(release_secs)
        self._hold_secs = max(float(hold_secs), 0.0)
        self._hysteresis_db = max(float(hysteresis_db), 0.0)

    def set_threshold_db(self, v: float):
        self._threshold_db = float(v)

    def set_range_db(self, v: float):
        self._range_db = min(float(v), 0.0)

    def set_attack_secs(self, v: float):
        self._attack_secs = float(v)

    def set_release_secs(self, v: float):
        self._release_secs = float(v)

    def set_hold_secs(self, v: float):
        self._hold_secs = max(float(v), 0.0)

    def set_hysteresis_db(self, v: float):
        self._hysteresis_db = max(float(v), 0.0)

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(1, MAX_PORTS, 1, MAX_PORTS)

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != num_outputs:
            raise NodeActivationError(
                "GateNode requires num_inputs == num_outputs; got "
                f"{num_inputs} in, {num_outputs} out"
            )
        return GateProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class DuckerProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self.main_channels = num_outputs

    def group_key(self):
        return ()

    def init_state(self):
        return {"env": jnp.zeros((), jnp.float32)}

    def collect_params(self):
        n = self._node
        return {
            "threshold_db": np.float32(n._threshold_db),
            "duck_db": np.float32(n._duck_db),
            "att_b": np.float32(_coef(n._attack_secs, self.sample_rate)),
            "rel_b": np.float32(_coef(n._release_secs, self.sample_rate)),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        m = self.main_channels
        main, side = inputs[:m], inputs[m:]

        # sidechain level drives the gain (classic dialogue-over-music duck)
        level = jnp.max(jnp.abs(side), axis=0)
        env, env_last = envelope_follow(
            level, state["env"], params["att_b"], params["rel_b"]
        )
        level_db = gain_to_db(env)
        # full duck depth once the sidechain crosses threshold; proportional
        # through a fixed 10 dB soft region below it
        over = jnp.clip((level_db - params["threshold_db"] + 10.0) / 10.0, 0.0, 1.0)
        gain = db_to_gain(params["duck_db"] * over)
        y = main * gain[None, :]
        out_mask = in_mask[:m]
        y = gate(y, out_mask)
        return y, {"env": env_last}, out_mask


class DuckerNode(AudioNode):
    """Sidechain ducker: attenuates the main bus while the sidechain is hot
    (dialogue-over-music, bus carving).

    Port layout: the FIRST ``num_outputs`` inputs are the main bus, the
    remaining inputs are the sidechain (any channel count).  ``duck_db`` is
    the attenuation applied when the sidechain exceeds ``threshold_db``
    (ramped in over a 10 dB soft region below the threshold).
    """

    debug_name = "ducker"

    def __init__(
        self,
        threshold_db: float = -40.0,
        duck_db: float = -12.0,
        attack_secs: float = 0.01,
        release_secs: float = 0.3,
    ):
        self._threshold_db = float(threshold_db)
        self._duck_db = min(float(duck_db), 0.0)
        self._attack_secs = float(attack_secs)
        self._release_secs = float(release_secs)

    def set_threshold_db(self, v: float):
        self._threshold_db = float(v)

    def set_duck_db(self, v: float):
        self._duck_db = min(float(v), 0.0)

    def set_attack_secs(self, v: float):
        self._attack_secs = float(v)

    def set_release_secs(self, v: float):
        self._release_secs = float(v)

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(2, MAX_PORTS, 1, MAX_PORTS)

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs <= num_outputs:
            raise NodeActivationError(
                "DuckerNode needs sidechain inputs beyond its main bus: "
                f"num_inputs ({num_inputs}) must exceed num_outputs "
                f"({num_outputs})"
            )
        return DuckerProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
